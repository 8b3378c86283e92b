"""Stateful streaming dedup: state persists across micro-batches."""

from __future__ import annotations

import os

from ordinarydumpdeduplicator_spark.streaming.dedup_state import (
    run_streaming_dedup,
)
from tests.conftest import to_spark_images


def test_state_survives_batches(spark, tiny_corpus, tmp_path):
    pdf, _ = tiny_corpus
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 0: first 60 rows; batch 1: the SAME 60 rows under new ids
    first = pdf.iloc[:60]
    second = first.copy()
    second["image_id"] = ["re_" + i for i in first["image_id"]]

    to_spark_images(spark, first).coalesce(1).write.parquet(f"{in_dir}/b0")
    q = run_streaming_dedup(spark, in_dir + "/*", out_dir, ckpt)
    q.awaitTermination(120)

    to_spark_images(spark, second).coalesce(1).write.parquet(f"{in_dir}/b1")
    q2 = run_streaming_dedup(spark, in_dir + "/*", out_dir, ckpt)
    q2.awaitTermination(120)

    got = {r["image_id"]: r for r in spark.read.parquet(out_dir).collect()}
    # every re-ingested row is a duplicate of a batch-0 row: the state
    # store remembered each sha across the restart
    redo = [r for k, r in got.items() if k.startswith("re_")]
    assert redo and all(r["is_dup"] for r in redo)
    for r in redo:
        orig = got[r["image_id"][3:]]
        assert r["cluster_id"] == orig["cluster_id"]
        assert r["seen_before"] >= 1
    # batch-0 singletons (unique content) were not duplicates
    uniques = [
        r for k, r in got.items()
        if not k.startswith("re_") and r["seen_before"] == 0
    ]
    assert uniques and all(not r["is_dup"] for r in uniques)
