"""Persist sinks: append-with-dedup, idempotent stage writes (S4-S6).

The reference persists entities through ``IDataController`` add-methods —
``AddBlobInfo`` dedups on add (DataControllerSimple.cs:238-244),
``AddFileState``/``AddDirectory`` append (DataControllerSimple.cs:43-75,
210-218). Dataflow equivalents:

- ``append_dedup``  — dropDuplicates on the identity key BEFORE append
  (the AddBlobInfo set-semantics), then append to the table.
- ``append_rows``   — plain append (AddFileState semantics; states are
  keyed (image_id, run_id) upstream so appends stay idempotent per run).
- ``write_stage``   — overwrite a stage table + _SUCCESS marker (the
  checkpointed-stage sink plans/pipeline.py uses).

Physical moves/deletes (S5/S6, FileSystemProvider.cs:42-76) have no
filesystem side effects here on purpose: operators/actions.py emits an
actions DataFrame and successor state rows; a production deployment turns
those into Iceberg MERGE / row-level DELETE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def append_dedup(df: DataFrame, path: str, keys: list[str]) -> None:
    """Dedup on identity keys then append — AddBlobInfo set semantics.

    Note: dedups within the batch only; cross-batch identity is the
    content key itself (duplicate (size, sha) rows across appends are
    harmless because every consumer groups by the key)."""
    df.dropDuplicates(keys).write.mode("append").parquet(path)


def append_rows(df: DataFrame, path: str) -> None:
    """Append-only fact write (AddFileState semantics)."""
    df.write.mode("append").parquet(path)


def write_stage(df: DataFrame, path: str) -> None:
    """Overwrite a checkpointed stage table (idempotent: rerun rewrites)."""
    df.write.mode("overwrite").parquet(path)


def read_stage(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
