"""Streaming exact-dedup ingest: a continuously arriving document corpus,
deduplicated against everything already ingested, with a bloom index so
steady-state batches never shuffle the full history.

State layout (all epoch-keyed like streaming/near_dup.py — every write
overwrites its own ``epoch=<batch_id>`` directory, loaders read only
committed epochs STRICTLY BELOW the current one, so Structured
Streaming's replay of a crashed batch heals partial state):

    new/epoch=N/     rows of the batch that were NEW at ingest time
                     (first occurrence wins; within-batch duplicates
                     collapse to the lowest doc_id) — the stream output
    keys/epoch=N/    the content keys those rows introduced (delta)
    blooms/epoch=N/  FULL merged bloom-shards snapshot after batch N;
                     superseded snapshots pruned, latest prior retained
                     as replay insurance (same protocol as near_dup's
                     assignment snapshots)

Per batch the work is: probe the batch's distinct keys against the bloom
snapshot (cogroup; the flags frame is persisted for the batch and
unpersisted after the writes, so the probe runs exactly once), anti-join
ONLY the bloom hits against the key store — which is read with a
``shard IN (<bloom-hit shards>)`` literal predicate, so parquet
row-group stats prune everything outside the hit shards (each key delta
is written clustered by shard for exactly this; at real scale the store
would be directory-partitioned by shard for file-level pruning) — then
OR-merge the new keys' bitmap into the snapshot
(``operators/bloom_dedup.bloom_merge`` — O(index size), independent of
history row count). A miss-only batch never touches the key store at
all. The reference's analogue is the per-file ``HashSet`` membership
check in ``DataControllerSimple.cs``; this is that check, made
restartable and distributed.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.bloom_dedup import (
    DEFAULT_BITS_PER_SHARD,
    DEFAULT_K_HASHES,
    _probe_flags,
    bloom_merge,
    bloom_shards,
    incremental_new_docs,
)
from ..operators.text_dedup import normalized_text
from .near_dup import _committed_epochs, compact_epoch_dirs

DOCS_SCHEMA = "doc_id long, text string"
KEYS_SCHEMA = "content_sha string, shard int"
BLOOMS_SCHEMA = (
    "shard int, bits binary, n_shards int, bits_per_shard int, k_hashes int"
)


def compact_ingest_keys(spark: SparkSession, state_dir: str) -> int:
    """Merge the committed key-store epochs (all but the newest) into
    the oldest epoch dir, preserving the shard clustering the
    IN-predicate row-group pruning relies on — the text twin of
    media_ingest.compact_media_index. Offline maintenance; run while
    the stream is stopped. Returns epochs merged."""
    return compact_epoch_dirs(
        spark,
        os.path.join(state_dir, "keys"),
        KEYS_SCHEMA,
        cluster_by=["shard"],
    )


def load_ingest_metrics(
    spark: SparkSession, state_dir: str
) -> DataFrame | None:
    """Committed per-batch accounting rows (batch_id, n_in, n_null_key,
    n_batch_dup, n_history_dup, n_new) — invariant per batch:
    n_in == n_null_key + n_batch_dup + n_history_dup + n_new
    (every arriving row is attributed to exactly one outcome; NULL-text
    rows pass through as their own bucket, never deduplicable)."""
    epochs = _committed_epochs(os.path.join(state_dir, "metrics"))
    if not epochs:
        return None
    return spark.read.parquet(*[p for _, p in epochs])


def load_new_docs(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """All rows ever emitted as new, across committed epochs."""
    epochs = _committed_epochs(os.path.join(state_dir, "new"))
    if not epochs:
        return None
    return spark.read.parquet(*[p for _, p in epochs])


def stream_ingest_dedup(
    spark: SparkSession,
    input_path: str,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    n_shards: int = 32,
    bits_per_shard: int = DEFAULT_BITS_PER_SHARD,
    k_hashes: int = DEFAULT_K_HASHES,
    schema: str = DOCS_SCHEMA,
    max_files_per_trigger: int | None = None,
):
    """Start the streaming ingest-dedup query over a parquet document
    stream (``doc_id``, ``text``). Returns the StreamingQuery; read the
    deduplicated corpus with ``load_new_docs(spark, state_dir)``."""
    new_path = os.path.join(state_dir, "new")
    keys_path = os.path.join(state_dir, "keys")
    blooms_path = os.path.join(state_dir, "blooms")
    metrics_path = os.path.join(state_dir, "metrics")

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        epoch = f"epoch={batch_id}"
        keyed = batch_df.withColumn(
            "content_sha", F.sha2(normalized_text(F.col("text")), 256)
        )
        # within-batch first-occurrence (lowest doc_id) — history dedup
        # alone would pass both copies of a key that is new this batch.
        # NULL keys (NULL text) are never deduplicable; keep them all.
        w = Window.partitionBy("content_sha").orderBy("doc_id")
        non_null = (
            keyed.filter(F.col("content_sha").isNotNull())
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        batch_first = non_null.unionByName(
            keyed.filter(F.col("content_sha").isNull())
        )

        key_epochs = _committed_epochs(keys_path, batch_id)
        history = (
            s.read.schema(KEYS_SCHEMA).parquet(*[p for _, p in key_epochs])
            if key_epochs
            else s.createDataFrame([], KEYS_SCHEMA)
        )
        bloom_epochs = _committed_epochs(blooms_path, batch_id)
        blooms = (
            s.read.schema(BLOOMS_SCHEMA).parquet(bloom_epochs[-1][1])
            if bloom_epochs
            else bloom_shards(
                history.select("content_sha"),
                "content_sha",
                n_shards=n_shards,
                bits_per_shard=bits_per_shard,
                k_hashes=k_hashes,
            )
        )
        # ONE probe per batch: persist the flags, unpersist after writes
        flags = _probe_flags(
            batch_first, blooms, "content_sha",
            n_shards, bits_per_shard, k_hashes,
            validate=bool(bloom_epochs),
        ).persist()
        try:
            hit_shards = [
                r.shard
                for r in flags.filter("might_contain")
                .select("shard")
                .distinct()
                .collect()
            ]
            # literal predicate -> parquet row-group pruning on the
            # shard-clustered key store; a miss-only batch reads nothing
            pruned = (
                history.filter(F.col("shard").isin(hit_shards))
                if hit_shards
                else history.limit(0)
            )
            new = incremental_new_docs(
                pruned,
                batch_first,
                "content_sha",
                n_shards=n_shards,
                bits_per_shard=bits_per_shard,
                k_hashes=k_hashes,
                blooms=blooms,
                flags=flags,
            )
            new.write.mode("overwrite").parquet(
                os.path.join(new_path, epoch)
            )
            # derive the key delta from what was WRITTEN (the later
            # writes cannot disagree with it); shard comes from the
            # persisted flags — no re-hash
            written = s.read.parquet(os.path.join(new_path, epoch))
            # per-batch accounting (the streaming analogue of the
            # curation funnel's per-stage counters; north rule's metrics
            # tables). No second sha256 pass: content_sha is non-NULL iff
            # text is (sha2 over a trim/lower normalization), so the raw
            # batch contributes only count(1)/count(text) — Catalyst
            # prunes the hash entirely — and n_distinct comes from the
            # already-persisted flags frame (one row per distinct key).
            # n_new reads the already-written output. Epoch-keyed
            # overwrite like every other state dir, so a crash replay
            # heals its own metrics row too.
            stats = batch_df.agg(
                F.count(F.lit(1)).alias("n_in"),
                F.count("text").alias("n_nonnull"),
            ).collect()[0]
            n_distinct = flags.filter(
                F.col("content_sha").isNotNull()
            ).count()
            n_null = stats.n_in - stats.n_nonnull
            n_batch_first = n_distinct + n_null
            w_stats = written.agg(
                F.count(F.lit(1)).alias("n_total"),
                F.count("content_sha").alias("n_nonnull"),
            ).collect()[0]
            # disjoint buckets — every arriving row lands in exactly one:
            # NULL-key passthrough, within-batch dup, history dup, or new
            s.createDataFrame(
                [
                    (
                        int(batch_id),
                        int(stats.n_in),
                        int(n_null),
                        int(stats.n_nonnull - n_distinct),
                        int(n_batch_first - w_stats.n_total),
                        int(w_stats.n_nonnull),
                    )
                ],
                "batch_id long, n_in long, n_null_key long, "
                "n_batch_dup long, n_history_dup long, n_new long",
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(metrics_path, epoch)
            )
            new_keys = (
                written.select("content_sha")
                .filter(F.col("content_sha").isNotNull())
                .distinct()
                .join(flags.select("content_sha", "shard"), "content_sha")
            )
            # clustered by shard so the next wave's IN-predicate prunes
            # row groups (directory-partition by shard at real scale)
            new_keys.repartition("shard").sortWithinPartitions(
                "shard"
            ).write.mode("overwrite").parquet(os.path.join(keys_path, epoch))
            delta = bloom_shards(
                s.read.schema(KEYS_SCHEMA)
                .parquet(os.path.join(keys_path, epoch))
                .select("content_sha"),
                "content_sha",
                n_shards=n_shards,
                bits_per_shard=bits_per_shard,
                k_hashes=k_hashes,
            )
            merged = (
                bloom_merge(blooms, delta) if bloom_epochs else delta
            )
            merged.write.mode("overwrite").parquet(
                os.path.join(blooms_path, epoch)
            )
        finally:
            flags.unpersist()
        # prune superseded snapshots KEEPING the latest prior one: the
        # stream checkpoint may not have committed this batch yet, and a
        # replay must still find a snapshot below it to resume from
        for _, p in bloom_epochs[:-1]:
            shutil.rmtree(p, ignore_errors=True)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        # bounded micro-batches even under availableNow — the per-batch
        # latency benchmark shape (one input file per batch)
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    writer = (
        reader.parquet(input_path)
        .writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
