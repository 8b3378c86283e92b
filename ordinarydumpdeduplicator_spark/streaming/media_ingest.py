"""Streaming media-ingest dedup: a continuously arriving media corpus
(video / audio / any fingerprintable payload), each micro-batch verdicted
against everything already ingested — the media twin of
streaming/ingest_dedup.py (text), built on the modality-agnostic segment
core (operators/segment_dedup.py).

State layout (epoch-keyed like every other streaming state dir: each
write overwrites its own ``epoch=<batch_id>`` directory; loaders read
only committed epochs STRICTLY BELOW the current one, so a replayed
crashed batch heals its own partial state):

    fps/epoch=N/       fingerprint DELTAS — all members of batch-N NOVEL
                       clusters, re-keyed to their cluster canonical id
                       (the whole collapsed family's segment hashes back
                       the canonical, so a later upload that near-matches
                       only a non-canonical variant still resolves;
                       byte-identical members collapse to one row, and
                       already-indexed content adds nothing, so the index
                       grows with DISTINCT content, not ingest volume)
    verdicts/epoch=N/  one row per batch item:
                       (id, outcome, match_ref_id, match_frac,
                        batch_canonical_id)
    metrics/epoch=N/   per-batch accounting; invariant per batch:
                       n_in == n_no_hashes + n_ref_dup + n_batch_dup
                               + n_novel

Per batch: ONE decode pass (the modality's mapInPandas fingerprint
function — payload bytes never shuffle), segment_novelty against the
union of committed fingerprint deltas (cross-side-only banded candidates,
reference buckets capped to a min-id witness, codegen popcount verify),
then a within-batch near-dup collapse over the segment core's three edge
families so intra-batch copies don't each claim novelty. Outcomes are
disjoint:

    no_hashes   no fingerprintable evidence at all (NULL payload — the
                Broken sentinel, OrdinaryDumpDeduplicator.cs:119-125) —
                never deduplicable, passes through, like the text
                chain's NULL-key bucket. Undecodable-but-present
                payloads keep their file_sha and DO dedup byte-exactly
                (reference semantics: unparseable content still hashes)
    ref_dup     verified near/exact duplicate of indexed content
                (match_ref_id = smallest best-matching reference id;
                byte-identity via one sha equi-join, content identity
                via the banded segment chain)
    batch_dup   member of a within-batch duplicate cluster that is not
                its canonical, OR clustered with a ref_dup member (the
                whole cluster's content is then non-novel)
    novel       a cluster canonical with no reference match anywhere in
                its cluster; its fingerprint enters the index

Like all near-dup relations the within-batch closure is approximate
(non-transitive at the boundary): a trim-chain item that matches a
ref_dup batch member but not the reference directly is classified via
its CLUSTER (batch_dup), which is exactly what a full batch re-run of
segment_dedup_report would conclude.

The reference's analogue is the one-at-a-time ``HashSet`` membership
check during a rescan (DataControllerSimple.cs) — this is that check for
content identity under re-encoding, made restartable and distributed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.connected_components import connected_components
from ..operators.segment_dedup import segment_edges, segment_novelty
from .near_dup import _committed_epochs, compact_epoch_dirs

VERDICTS_SCHEMA = (
    "{id_col} string, outcome string, match_ref_id string, "
    "match_frac double, batch_canonical_id string"
)
METRICS_SCHEMA = (
    "batch_id long, n_in long, n_no_hashes long, n_ref_dup long, "
    "n_batch_dup long, n_novel long"
)


def load_media_verdicts(
    spark: SparkSession, state_dir: str, id_col: str = "video_id"
) -> DataFrame | None:
    """All committed per-item verdicts across epochs."""
    epochs = _committed_epochs(os.path.join(state_dir, "verdicts"))
    if not epochs:
        return None
    return spark.read.schema(
        VERDICTS_SCHEMA.format(id_col=id_col)
    ).parquet(*[p for _, p in epochs])


def load_reference_fps(
    spark: SparkSession, state_dir: str, fp_schema: str
) -> DataFrame | None:
    """The deduplicated fingerprint index (union of committed deltas)."""
    epochs = _committed_epochs(os.path.join(state_dir, "fps"))
    if not epochs:
        return None
    return spark.read.schema(fp_schema).parquet(*[p for _, p in epochs])


def load_media_metrics(
    spark: SparkSession, state_dir: str
) -> DataFrame | None:
    epochs = _committed_epochs(os.path.join(state_dir, "metrics"))
    if not epochs:
        return None
    return spark.read.schema(METRICS_SCHEMA).parquet(
        *[p for _, p in epochs]
    )


def compact_media_index(
    spark: SparkSession, state_dir: str, fp_schema: str
) -> int:
    """Merge the committed fingerprint DELTA epochs into the oldest
    epoch directory — the small-files fix for a long-running media
    ingest (every batch with novel content appends one epoch dir; a
    month of micro-batches reads thousands of tiny parquet files per
    batch, spending the wall on listings and footers, not data).

    The newest committed epoch is deliberately left untouched: it is
    the only epoch a crash-replayed batch may overwrite (stream
    checkpoints advance in order), so compaction never races a heal.
    Merged rows land in the LOWEST epoch directory, preserving the
    strictly-below loader contract for every future batch id. Deltas
    are disjoint by construction (each holds one batch's novel
    clusters), so the merge is a plain union — no dedup pass.

    Swap is the compact_stage two-rename pattern (write to a sibling
    ``.compacting`` dir, keep ``.pre_compact`` until success), run it
    only while the stream is stopped — it is offline maintenance, like
    sinks.compact_stage. Returns the number of epoch dirs merged
    (0 = nothing to do)."""
    return compact_epoch_dirs(
        spark, os.path.join(state_dir, "fps"), fp_schema
    )


def stream_media_novelty(
    spark: SparkSession,
    input_path: str,
    state_dir: str,
    checkpoint_dir: str,
    fingerprint_fn,
    input_schema: str,
    fp_schema: str,
    id_col: str = "video_id",
    hashes_col: str = "frame_hashes",
    prefix: str = "frame",
    available_now: bool = True,
    bands: int = 4,
    max_hamming: int = 6,
    min_match_frac: float = 0.5,
    ref_bucket_cap: int = 1024,
    batch_bucket_cap: int = 64,
    max_files_per_trigger: int | None = None,
):
    """Start the streaming media-novelty query over a parquet payload
    stream (``id_col``, ``bytes``). ``fingerprint_fn`` maps the raw batch
    frame to the modality's fingerprint frame (video_fingerprints,
    audio_fingerprints, image_region_fingerprints — any producer of
    (id, status, file_sha, ..., <hashes_col>)). Returns the
    StreamingQuery; read results with load_media_verdicts /
    load_reference_fps / load_media_metrics."""
    fps_path = os.path.join(state_dir, "fps")
    verdicts_path = os.path.join(state_dir, "verdicts")
    metrics_path = os.path.join(state_dir, "metrics")

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        epoch = f"epoch={batch_id}"
        # ONE decode pass; the skinny fingerprint frame feeds novelty,
        # the edge families, and the delta write — persist it
        fps_b = fingerprint_fn(batch_df).persist()
        try:
            ref_epochs = _committed_epochs(fps_path, batch_id)
            ref = (
                s.read.schema(fp_schema).parquet(
                    *[p for _, p in ref_epochs]
                )
                if ref_epochs
                else None
            )
            if ref is not None:
                near = segment_novelty(
                    fps_b,
                    ref,
                    id_col=id_col,
                    hashes_col=hashes_col,
                    bands=bands,
                    max_hamming=max_hamming,
                    min_match_frac=min_match_frac,
                    ref_bucket_cap=ref_bucket_cap,
                ).select(id_col, "match_ref_id", "match_frac")
                # byte-identity path: an undecodable payload has no
                # hashes but byte-identical copies are REAL exact
                # duplicates (reference semantics — unparseable content
                # still has a hash); one equi-join on the sha covers
                # them, and for decodable content it agrees with the
                # near path (identical payloads decode to identical
                # hashes, match_frac 1.0)
                sha_match = (
                    fps_b.filter(F.col("file_sha").isNotNull())
                    .select(id_col, "file_sha")
                    .join(
                        ref.filter(F.col("file_sha").isNotNull())
                        .select(
                            F.col("file_sha"),
                            F.col(id_col).alias("__rid"),
                        ),
                        "file_sha",
                    )
                    .groupBy(id_col)
                    .agg(F.min("__rid").alias("__sha_ref"))
                )
                nov = (
                    near.join(sha_match, id_col, "left")
                    .select(
                        id_col,
                        F.coalesce("match_ref_id", "__sha_ref").alias(
                            "match_ref_id"
                        ),
                        F.when(
                            F.col("match_ref_id").isNull()
                            & F.col("__sha_ref").isNotNull(),
                            F.lit(1.0),
                        )
                        .otherwise(F.col("match_frac"))
                        .alias("match_frac"),
                    )
                )
            else:
                nov = fps_b.select(
                    id_col,
                    F.lit(None).cast("string").alias("match_ref_id"),
                    F.lit(None).cast("double").alias("match_frac"),
                )
            # within-batch collapse: all three edge families over the
            # batch fingerprints, CC, canonical = string-min member
            edges = segment_edges(
                fps_b,
                id_col=id_col,
                hashes_col=hashes_col,
                prefix=prefix,
                bands=bands,
                max_hamming=max_hamming,
                min_match_frac=min_match_frac,
                bucket_cap=batch_bucket_cap,
            )
            assign = connected_components(
                edges.select("src", "dst")
            ).select(
                F.col("image_id").alias(id_col),
                F.col("cluster_id").alias("__cl"),
            )
            usable = fps_b.select(
                id_col,
                (
                    F.col(hashes_col).isNotNull()
                    | F.col("file_sha").isNotNull()
                ).alias("__has"),
            )
            per_item = (
                usable.join(nov, id_col, "left")
                .join(assign, id_col, "left")
                .withColumn("__cl", F.coalesce("__cl", F.col(id_col)))
            )
            # cluster-level rollup: any ref-matched member poisons the
            # whole cluster's novelty; the canonical is the min id
            cl = per_item.filter(F.col("__has")).groupBy("__cl").agg(
                F.min(id_col).alias("batch_canonical_id"),
                F.max(
                    F.col("match_ref_id").isNotNull().cast("int")
                ).alias("__any_ref"),
            )
            verdicts = (
                per_item.join(cl, "__cl", "left")
                .select(
                    id_col,
                    F.when(~F.col("__has"), F.lit("no_hashes"))
                    .when(
                        F.col("match_ref_id").isNotNull(), F.lit("ref_dup")
                    )
                    .when(
                        (F.col("__any_ref") == 1)
                        | (F.col(id_col) != F.col("batch_canonical_id")),
                        F.lit("batch_dup"),
                    )
                    .otherwise(F.lit("novel"))
                    .alias("outcome"),
                    "match_ref_id",
                    "match_frac",
                    F.when(F.col("__has"), F.col("batch_canonical_id"))
                    .alias("batch_canonical_id"),
                )
            )
            verdicts.write.mode("overwrite").parquet(
                os.path.join(verdicts_path, epoch)
            )
            written = s.read.schema(
                VERDICTS_SCHEMA.format(id_col=id_col)
            ).parquet(os.path.join(verdicts_path, epoch))
            # fingerprint delta: EVERY member of a novel cluster,
            # re-keyed to the cluster canonical id — so the index's
            # matching power covers the whole collapsed family (a future
            # upload near-matching only a non-canonical variant, e.g. a
            # trim closer to a dropped re-mux, still resolves to the
            # canonical) while match_ref_id keeps pointing at one id.
            # Byte-identical members collapse via the full-row distinct;
            # the index still grows with distinct CONTENT, not volume.
            novel_canon = written.filter(
                F.col("outcome") == "novel"
            ).select(F.col(id_col).alias("batch_canonical_id"))
            members = (
                written.join(novel_canon, "batch_canonical_id")
                .select(id_col, "batch_canonical_id")
            )
            (
                fps_b.join(members, id_col)
                .withColumn(id_col, F.col("batch_canonical_id"))
                .drop("batch_canonical_id")
                .dropDuplicates()
                .write.mode("overwrite")
                .parquet(os.path.join(fps_path, epoch))
            )
            counts = {
                r["outcome"]: r["n"]
                for r in written.groupBy("outcome")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            n_in = sum(counts.values())
            s.createDataFrame(
                [
                    (
                        int(batch_id),
                        int(n_in),
                        int(counts.get("no_hashes", 0)),
                        int(counts.get("ref_dup", 0)),
                        int(counts.get("batch_dup", 0)),
                        int(counts.get("novel", 0)),
                    )
                ],
                METRICS_SCHEMA,
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(metrics_path, epoch)
            )
        finally:
            fps_b.unpersist()

    reader = spark.readStream.schema(input_schema).format("parquet")
    if max_files_per_trigger is not None:
        # bounded micro-batches even under availableNow — the per-batch
        # latency benchmark shape (one input file per batch)
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    reader = reader.load(input_path)
    writer = reader.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
