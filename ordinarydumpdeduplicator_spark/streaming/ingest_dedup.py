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
from .near_dup import (
    _committed_epochs,
    compact_epoch_dirs,
    write_row_epoch,
)

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
    # cross-batch cache: the committed key-store listing and the loaded
    # (persisted) bloom snapshot for the EXPECTED next batch id — the
    # state below the current epoch is append-only within a run, so
    # after batch N commits, batch N+1's state is batch N's plus the
    # epoch-N dirs. A restart or replay misses the cache (batch id !=
    # expected) and re-lists from disk, leaving the replay contract
    # untouched; the fixed per-batch listing/snapshot-read cost no
    # longer grows with the number of past batches.
    cache: dict = {"next": None}

    def _state_for(s: SparkSession, batch_id: int):
        if cache.get("next") == batch_id:
            return cache["key_dirs"], cache["blooms_df"], True
        key_dirs = [p for _, p in _committed_epochs(keys_path, batch_id)]
        bloom_epochs = _committed_epochs(blooms_path, batch_id)
        if bloom_epochs:
            blooms = (
                s.read.schema(BLOOMS_SCHEMA)
                .parquet(bloom_epochs[-1][1])
                .persist()
            )
            return key_dirs, blooms, True
        history = (
            s.read.schema(KEYS_SCHEMA).parquet(*key_dirs)
            if key_dirs
            else s.createDataFrame([], KEYS_SCHEMA)
        )
        blooms = bloom_shards(
            history.select("content_sha"),
            "content_sha",
            n_shards=n_shards,
            bits_per_shard=bits_per_shard,
            k_hashes=k_hashes,
        ).persist()
        return key_dirs, blooms, False

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

        key_dirs, blooms, from_snapshot = _state_for(s, batch_id)
        history = (
            s.read.schema(KEYS_SCHEMA).parquet(*key_dirs)
            if key_dirs
            else s.createDataFrame([], KEYS_SCHEMA)
        )
        # ONE probe per batch: persist the flags, unpersist after writes
        flags = _probe_flags(
            batch_first, blooms, "content_sha",
            n_shards, bits_per_shard, k_hashes,
            validate=from_snapshot,
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
            # NULL-key passthrough, within-batch dup, history dup, or new.
            # Driver-side pyarrow write: a one-row accounting frame is
            # not worth a Spark job (~3.5 s of scheduling per batch)
            write_row_epoch(
                os.path.join(metrics_path, epoch),
                {
                    "batch_id": int(batch_id),
                    "n_in": int(stats.n_in),
                    "n_null_key": int(n_null),
                    "n_batch_dup": int(stats.n_nonnull - n_distinct),
                    "n_history_dup": int(n_batch_first - w_stats.n_total),
                    "n_new": int(w_stats.n_nonnull),
                },
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
            # unconditional merge: when no snapshot existed the blooms
            # frame was built inline from history (empty on a true
            # first batch, where the merge degenerates to the delta),
            # so history bits are preserved in every branch
            merged = bloom_merge(blooms, delta)
            merged.write.mode("overwrite").parquet(
                os.path.join(blooms_path, epoch)
            )
        finally:
            flags.unpersist()
        # prune superseded snapshots KEEPING the latest prior one: the
        # stream checkpoint may not have committed this batch yet, and a
        # replay must still find a snapshot below it to resume from
        for _, p in _committed_epochs(blooms_path, batch_id)[:-1]:
            shutil.rmtree(p, ignore_errors=True)
        # roll the cross-batch cache forward to the expected next batch
        blooms.unpersist()
        cache.update(
            next=batch_id + 1,
            key_dirs=key_dirs + [os.path.join(keys_path, epoch)],
            blooms_df=s.read.schema(BLOOMS_SCHEMA)
            .parquet(os.path.join(blooms_path, epoch))
            .persist(),
        )

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
