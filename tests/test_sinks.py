"""Persist sinks (S4): append-with-dedup, append, stage overwrite."""

from __future__ import annotations

from ordinarydumpdeduplicator_spark.sources.sinks import (
    append_dedup,
    append_rows,
    read_stage,
    write_stage,
)


def test_append_dedup_set_semantics(spark, tmp_path):
    p = str(tmp_path / "blobs")
    df = spark.createDataFrame(
        [(10, "aa", "x1"), (10, "aa", "x2"), (20, "bb", "x3")],
        "size long, sha string, src string",
    )
    append_dedup(df, p, ["size", "sha"])
    got = spark.read.parquet(p)
    assert got.count() == 2  # in-batch dedup on the identity key
    assert got.select("size", "sha").distinct().count() == 2


def test_append_rows_and_stage_overwrite(spark, tmp_path):
    p = str(tmp_path / "states")
    df1 = spark.createDataFrame([("i1", "r1")], "image_id string, run_id string")
    df2 = spark.createDataFrame([("i1", "r2")], "image_id string, run_id string")
    append_rows(df1, p)
    append_rows(df2, p)
    assert spark.read.parquet(p).count() == 2  # append-only fact table

    sp = str(tmp_path / "stage")
    write_stage(df1, sp)
    write_stage(df2, sp)  # idempotent rerun overwrites
    rows = read_stage(spark, sp).collect()
    assert [(r["image_id"], r["run_id"]) for r in rows] == [("i1", "r2")]
