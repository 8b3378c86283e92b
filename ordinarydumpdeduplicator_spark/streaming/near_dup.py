"""Streaming near-duplicate clustering (SURVEY.md §2.11 + O19).

``foreachBatch`` over the image stream, where each micro-batch runs the
fully incremental LSH (plans/incremental.incremental_caption_run): only
the batch pays feature extraction, its (rep-only) band rows are joined
against the append-only band index, and only components touched by new
edges re-cluster. The reference's analogue is the re-inspection loop —
this is the same operation with near-duplicate semantics and exactly-once
file processing via the stream checkpoint.

State between batches lives in parquet tables under ``state_dir`` (in
production: Iceberg tables, with the assignment overwrite becoming a
MERGE by cluster_id — sources/merge.py):

    captions/   (image_id, caption)      append-only; verify joins both
                                         endpoints by id, old or new
    reps/       (caption_sha, rep)       append-only first-seen rep index
    bands/      (id, band, key)          append-only LSH band index
    assign/     (image_id, cluster_id)   overwritten per batch (compact)

Replay safety: a crashed batch may be re-run by the stream, so the
append-only tables are read through ``distinct()`` — every row is
naturally unique per (batch x content), making re-appends idempotent.
The assignment table is only overwritten AFTER incremental_caption_run
materializes its outputs (localCheckpoint), so the read-then-overwrite
cycle never reads a half-written table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.features import extract_features
from ..plans.incremental import incremental_caption_run
from .inspection import read_image_stream


def _load(spark: SparkSession, path: str, schema: str) -> DataFrame | None:
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return spark.read.schema(schema).parquet(path).distinct()
    return None


def stream_near_dup_clusters(
    spark: SparkSession,
    input_path: str,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    bucket_cap: int = 256,
    jaccard_threshold: float = 0.5,
):
    """Start the streaming near-dup clustering query.

    Returns the StreamingQuery; after it finishes (availableNow) the
    current assignment table is at ``{state_dir}/assign``."""
    captions_path = os.path.join(state_dir, "captions")
    reps_path = os.path.join(state_dir, "reps")
    bands_path = os.path.join(state_dir, "bands")
    assign_path = os.path.join(state_dir, "assign")

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        batch_df.select("image_id", "caption").write.mode("append").parquet(
            captions_path
        )
        corpus_captions = (
            s.read.schema("image_id string, caption string")
            .parquet(captions_path)
            .distinct()
        )
        reps = _load(s, reps_path, "caption_sha string, rep string")
        bands = _load(s, bands_path, "id string, band int, key long")
        assign = _load(s, assign_path, "image_id string, cluster_id string")
        state = (
            dict(reps=reps, bands=bands, assign=assign)
            if assign is not None
            else None
        )
        out = incremental_caption_run(
            extract_features(batch_df),
            corpus_captions,
            state,
            bucket_cap=bucket_cap,
            jaccard_threshold=jaccard_threshold,
        )
        # outputs are localCheckpoint-materialized inside the run, so the
        # overwrite below cannot invalidate what it was computed from
        out["new_reps"].write.mode("append").parquet(reps_path)
        out["new_bands"].write.mode("append").parquet(bands_path)
        out["assign"].write.mode("overwrite").parquet(assign_path)

    writer = (
        read_image_stream(spark, input_path)
        .writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
