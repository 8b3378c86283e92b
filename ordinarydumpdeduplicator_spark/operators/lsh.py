"""LSH candidate-pair generation: MinHash bands (captions) + multi-index
Hamming bands (phash), with explicit skew handling.

No reference analogue — the reference's only grouping key is the exact
content hash (DataControllerSimple.cs:252-285). This module generalizes
that to near-duplicates; its skew story is the generalization of the
reference's all-empty-files mega-group (Common/BlobInfo.cs:49-51):

1. **Exact pre-grouping**: rows with an identical caption (same
   ``caption_sha``) or identical ``phash_v`` are collapsed to one
   representative BEFORE banding, with linear star edges recording the
   collapsed clique. A 10^9-row hot caption ("photo") therefore contributes
   ONE representative to the LSH join instead of a quadratic mega-band —
   skew is removed at the source, not salted around.
2. **Bucket caps**: any remaining band bucket larger than ``bucket_cap``
   emits star edges (member -> bucket-min) instead of all pairs, and the
   overflow is observable in the returned stats frame (capped, not silent —
   SURVEY.md §4 item 1).
3. AQE skew-join handles residual imbalance at runtime (session config).

Banding schemes (all JVM-side bit ops / array functions; the only Python
in the near-dup path is the signature UDF in operators/features.py):

- captions: ``BANDS x ROWS_PER_BAND`` MinHash banding; band keys are
  precomputed vectorized inside the minhash Arrow UDF
  (functions/minhash.band_keys_from_mins) and stored as ``bands``.
- phash: choose-2-of-4 16-bit blocks -> 6 composite 32-bit keys; the
  pigeonhole bound guarantees every pair within Hamming distance <= 2 shares
  at least one composite key. (At 10^12 rows, single 16-bit blocks would
  give ~n/2^16-sized buckets = quadratic blowup; composite 32-bit keys keep
  buckets ~n/2^32. Radius beyond 2 is covered by the exact-phash pre-group
  plus the verification threshold, and is configurable via single-block
  mode for small corpora.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


DEFAULT_BUCKET_CAP = 256


def ensure_min_parallelism(df: DataFrame) -> DataFrame:
    """Small-input guard for expensive Arrow-UDF stages.

    A single small parquet file plans ONE scan partition, which serializes
    the vectorized signature/sketch UDF on one core (measured: the whole
    text candidate chain at sf0.1 was one 5s UDF task while 31 cores sat
    idle). When the planned partition count is below the cluster's
    defaultParallelism, repartition up to it — the shuffle moves only the
    small input that caused the problem. At scale the input already has
    >= defaultParallelism splits and this is a no-op (no added shuffle,
    no coalesce of well-partitioned inputs)."""
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def pairs_from_buckets(
    banded: DataFrame,
    id_col: str = "id",
    bucket_cap: int = DEFAULT_BUCKET_CAP,
    materialize: bool = True,
    with_band_range: bool = False,
) -> DataFrame:
    """(id, band, key) -> candidate edges (src < dst).

    Buckets of size <= bucket_cap emit all C(n,2) pairs; larger buckets emit
    n-1 star edges to the bucket minimum plus a `capped=true` marker column
    so callers can log overflow.

    Plan shape (measured on 17M band rows): bucket stats come from a HASH
    aggregate — count/min per (band, key) — then join back to the band
    rows, instead of a count/min WINDOW, which would force a full sort of
    the band frame after the exchange. The stats frame is tiny (only
    multi-member buckets survive), so AQE turns the join into a broadcast
    and the band frame is never exchanged a second time.

    ``materialize`` localCheckpoints the joined bucket frame: it feeds
    THREE consumers (both sides of the pair self-join + the star branch),
    and without a cut Catalyst re-executes the whole upstream band DAG per
    consumer — measured 3x wall on the edges stage at 160k rows. On a
    cluster the equivalent is a persisted stage table (plans/pipeline.py
    checkpoints whole stages the same way)."""
    rows = banded.select(F.col(id_col).alias("id"), "band", "key")
    stats = (
        rows.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("n"), F.min("id").alias("mn"))
        .filter(F.col("n") >= 2)
    )
    b = rows.join(stats, ["band", "key"])
    if materialize:
        # LAZY cut: the checkpoint still guarantees b's subtree computes
        # once for its three consumers (the BlockManager's per-partition
        # get-or-compute lock dedupes concurrent pulls within the first
        # consuming job), but the driver is not blocked on a separate
        # materialization job — b computes INSIDE whichever job consumes
        # the pairs first, overlapping with that job's other branches.
        # Measured at 320k rows / 4x2 executors (full edges stage, warm):
        # eager 16.2s, lazy 15.5s, no checkpoint at all 21.6s (the 3
        # consumers recompute the band DAG). An earlier eager-vs-lazy gap
        # (34s vs 11s on 17M band rows) predates the lazy checkpoint of
        # the downstream pairs frame — with pairs also lazy, everything
        # lands in one job and eagerness only adds a barrier.
        b = b.localCheckpoint(eager=False)
    small = b.filter(F.col("n") <= bucket_cap).select("id", "band", "key")
    # SHUFFLE_HASH hint: the checkpointed bucket frame carries no size
    # stats, so Catalyst happily BROADCASTS tens of millions of band rows
    # (single-threaded driver hash-relation build — measured 40s flat at
    # any core count). A shuffled hash join on (band, key) partitions the
    # work and scales with the cluster; keys are near-unique so per-
    # partition hash maps stay small.
    a, c = small.alias("a"), small.hint("shuffle_hash").alias("b")
    p_small = (
        a.join(c, ["band", "key"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("src"),
            F.col("b.id").alias("dst"),
            F.lit(False).alias("capped"),
            F.col("band"),
        )
    )
    p_big = (
        b.filter((F.col("n") > bucket_cap) & (F.col("id") != F.col("mn")))
        .select(
            F.col("mn").alias("src"),
            F.col("id").alias("dst"),
            F.lit(True).alias("capped"),
            F.col("band"),
        )
    )
    aggs = [F.max("capped").alias("capped")]
    if with_band_range:
        # which band ids produced the pair — lets a caller that unioned
        # several banding FAMILIES into one frame (disjoint band-id
        # ranges, see combined_candidates) route each pair to its
        # family-specific verification without a per-family join chain
        aggs += [
            F.min("band").alias("min_band"),
            F.max("band").alias("max_band"),
        ]
    return (
        p_small.unionByName(p_big).groupBy("src", "dst").agg(*aggs)
    )


# --------------------------------------------------------------- captions


def caption_representatives(features: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Collapse identical normalized captions.

    Returns (reps, star_edges): reps = one row per distinct caption_sha with
    its precomputed LSH band keys; star_edges link collapsed members to the
    rep."""
    # caption_sha and bands are null under the SAME condition (caption has
    # zero tokens): shingles() falls back to the whole token join for
    # captions shorter than SHINGLE_K, so even one-token captions band.
    # The conjunction is belt-and-braces for features from other
    # producers, not a narrowing — no non-empty caption is excluded.
    f = features.filter(F.col("caption_sha").isNotNull() & F.col("bands").isNotNull())
    # HASH aggregate, not a window: a window would exchange AND SORT every
    # row together with its 32-long band array (measured ~5s per evaluation
    # at 640k rows); the aggregate gets map-side partial min/any_value
    # (identical captions carry identical bands, so any_value is exact) and
    # never sorts. The star join below ships only skinny columns.
    reps_map = (
        f.groupBy("caption_sha")
        .agg(F.min("image_id").alias("id"), F.any_value("bands").alias("bands"))
    )
    reps = reps_map.select("id", "bands")
    star = (
        f.select("image_id", "caption_sha")
        .join(reps_map.select("caption_sha", F.col("id").alias("rep")), "caption_sha")
        .filter(F.col("image_id") != F.col("rep"))
        .select(
            F.col("rep").alias("src"),
            F.col("image_id").alias("dst"),
            F.lit("caption_exact").alias("kind"),
        )
    )
    return reps, star


def caption_band_rows(reps: DataFrame) -> DataFrame:
    """Explode precomputed band keys into (id, band, key) rows.

    The keys were computed vectorized inside the minhash Arrow UDF
    (functions/minhash.band_keys_from_mins) — per-row JVM slice hashing
    here was measured at ~8s per evaluation on 17M band rows; the explode
    of a ready array is negligible."""
    return reps.select("id", F.posexplode("bands").alias("band", "key"))


def caption_candidates(
    features: DataFrame,
    bucket_cap: int = DEFAULT_BUCKET_CAP,
    materialize: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """-> (candidate rep pairs (src,dst,capped), caption_exact star edges)."""
    reps, star = caption_representatives(features)
    banded = caption_band_rows(reps)
    return (
        pairs_from_buckets(banded, bucket_cap=bucket_cap, materialize=materialize),
        star,
    )


# ------------------------------------------------------------------ phash


def phash_representatives(features: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Collapse identical phash values (same trick as captions)."""
    f = features.filter(F.col("phash_v").isNotNull())
    reps_map = f.groupBy("phash_v").agg(F.min("image_id").alias("id"))
    reps = reps_map.select("id", F.col("phash_v").alias("phash"))
    star = (
        f.select("image_id", "phash_v")
        .join(reps_map.select("phash_v", F.col("id").alias("rep")), "phash_v")
        .filter(F.col("image_id") != F.col("rep"))
        .select(
            F.col("rep").alias("src"),
            F.col("image_id").alias("dst"),
            F.lit("phash_exact").alias("kind"),
        )
    )
    return reps, star


def _block16(col, k: int):
    return F.shiftright(col, 16 * k).bitwiseAND(F.lit(0xFFFF))


def phash_band_rows(
    reps: DataFrame, mode: str = "c2x16", band_offset: int = 0
) -> DataFrame:
    """(id, phash) -> (id, band, key) rows.

    mode 'c2x16': 6 composite keys from choose(4,2) 16-bit blocks — every
    pair with Hamming <= 2 collides on >= 1 key (scale-safe default).
    mode 'b8x8': 8 single 8-bit blocks — catches Hamming <= 7 but buckets
    are n/256 (small corpora only).

    band_offset shifts the band ids into a range disjoint from the
    caption MinHash bands so both families can share ONE banded frame
    (combined_candidates)."""
    p = F.col("phash")
    if mode == "c2x16":
        combos = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
        entries = [
            F.struct(
                F.lit(band_offset + ci).alias("band"),
                (_block16(p, i) * F.lit(65536) + _block16(p, j)).alias("key"),
            )
            for ci, (i, j) in enumerate(combos)
        ]
    elif mode == "b8x8":
        entries = [
            F.struct(
                F.lit(band_offset + k).alias("band"),
                F.shiftright(p, 8 * k).bitwiseAND(F.lit(0xFF)).cast("long").alias("key"),
            )
            for k in range(8)
        ]
    else:
        raise ValueError(f"unknown phash band mode: {mode}")
    return reps.select(
        "id", F.explode(F.array(*entries)).alias("e")
    ).select("id", F.col("e.band").alias("band"), F.col("e.key").alias("key"))


def phash_candidates(
    features: DataFrame,
    mode: str = "c2x16",
    bucket_cap: int = DEFAULT_BUCKET_CAP,
    materialize: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """-> (candidate rep pairs, phash_exact star edges)."""
    reps, star = phash_representatives(features)
    banded = phash_band_rows(reps, mode)
    return (
        pairs_from_buckets(banded, bucket_cap=bucket_cap, materialize=materialize),
        star,
    )


# --------------------------------------------------------- combined chain

# caption MinHash bands occupy ids [0, 64); phash bands start here
PHASH_BAND_OFFSET = 64


def combined_candidates(
    features: DataFrame,
    phash_mode: str = "c2x16",
    bucket_cap: int = DEFAULT_BUCKET_CAP,
    materialize: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Both candidate families through ONE banding chain.

    Band rows of the caption MinHash family (band ids < 64) and the phash
    multi-index family (band ids >= PHASH_BAND_OFFSET) are unioned into a
    single (id, band, key) frame, so bucket stats, the bucket-frame
    materialization and the pair self-join each run ONCE over the combined
    rows instead of twice over half the rows. Per-family candidate
    semantics are unchanged — band-id ranges are disjoint, so a bucket
    never mixes families; a pair found by both families carries both
    flags. Halving the number of shuffle chains removes the fixed
    per-job/per-exchange costs that dominated the edges stage at small
    executor counts (BENCH/BASELINE.md) and removes the need to overlap
    two chains with driver-side threads.

    Returns (pairs, caption_star, phash_star) where pairs has columns
    (src, dst, capped, from_caption, from_phash)."""
    cap_reps, cap_star = caption_representatives(features)
    ph_reps, ph_star = phash_representatives(features)
    banded = caption_band_rows(cap_reps).unionByName(
        phash_band_rows(ph_reps, phash_mode, band_offset=PHASH_BAND_OFFSET)
    )
    pairs = pairs_from_buckets(
        banded,
        bucket_cap=bucket_cap,
        materialize=materialize,
        with_band_range=True,
    ).select(
        "src",
        "dst",
        "capped",
        (F.col("min_band") < PHASH_BAND_OFFSET).alias("from_caption"),
        (F.col("max_band") >= PHASH_BAND_OFFSET).alias("from_phash"),
    )
    return pairs, cap_star, ph_star
