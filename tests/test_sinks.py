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


def test_compact_stage_shrinks_files_and_preserves_rows(spark, tmp_path):
    import glob
    import os

    from ordinarydumpdeduplicator_spark.sources.sinks import compact_stage

    path = str(tmp_path / "stage")
    # 32 tiny files
    spark.range(10000).repartition(32).write.parquet(path)
    n_before = len(glob.glob(os.path.join(path, "part-*")))
    assert n_before == 32
    rows_before = sorted(r.id for r in spark.read.parquet(path).collect())

    n_out = compact_stage(spark, path)  # tiny data -> 1 file
    assert n_out == 1
    files_after = glob.glob(os.path.join(path, "part-*"))
    assert len(files_after) == 1
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == rows_before
    # no leftover swap directories
    assert not os.path.exists(path + ".compacting")
    assert not os.path.exists(path + ".pre_compact")
    # idempotent: compacting a compact stage is a no-op rewrite
    assert compact_stage(spark, path) == 1
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == rows_before


def test_compact_stage_respects_target_bytes(spark, tmp_path):
    import glob
    import os

    from ordinarydumpdeduplicator_spark.sources.sinks import compact_stage

    path = str(tmp_path / "stage")
    spark.range(200000).repartition(16).write.parquet(path)
    total = sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(path, "part-*"))
    )
    # target a quarter of the data per file -> ~4 output files
    n_out = compact_stage(spark, path, target_bytes=max(1, total // 4))
    files = glob.glob(os.path.join(path, "part-*"))
    assert len(files) == n_out
    assert 3 <= n_out <= 5
    assert spark.read.parquet(path).count() == 200000
