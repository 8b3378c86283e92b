"""Source-level corpus audit operators — overlap and copy-flow between
corpus sources.

The reference reports duplicates grouped by directory — one dictionary
``Directory -> list<FileInfo>`` built from the per-blob groups
(OrdinaryDumpDeduplicator/DuplicateReport.cs:74-112) — i.e. "where do my
duplicates live?". These operators lift the same question from directories
to corpus *sources* at training-pipeline scale:

- :func:`cross_source_dup_matrix` — the exact form: how many verbatim
  copies flow between each pair of sources (the reference's duplicate
  groups, pivoted from "which blobs" to "which directory pairs share
  blobs").
- :func:`source_overlap_minhash` — the sketch form: estimated shingle-set
  Jaccard between each pair of sources from mergeable per-source MinHash
  sketches. A per-source union sketch is the elementwise MIN of its
  documents' signatures, so it costs one tiny hash-aggregate over the
  already-computed per-doc signatures — no pairwise document work at all.

Scale shape (100 TB): both operators aggregate the corpus down to one row
per (source, key) — ``S * NUM_HASHES`` sketch rows / per-(sha, source)
counts — before anything pairwise happens, so the pairwise stage is
quadratic only in the number of SOURCES, never in documents. For very
large source counts (> ~10^4) pass ``agreement_only=True`` to
:func:`source_overlap_minhash` — an equi-join on (j, v) that drops
zero-agreement pairs instead of materializing the S x S matrix; the
default keeps the full matrix because that is the report the operator
promises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.minhash import NUM_HASHES, minhash_udf
from .lsh import ensure_min_parallelism
from .text_dedup import normalized_text


def source_minhash_sketches(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source union MinHash sketch: ``(source, j, v)``, one row per
    hash function ``j`` in [0, NUM_HASHES).

    min over documents of the per-document minhash = minhash of the UNION
    of the documents' shingle sets, so the sketch estimates source-level
    shingle Jaccard and merges associatively (a second corpus's sketch
    folds in with another MIN — the same mergeability the bloom/KMV
    sketches rely on). Documents with no shingles (NULL/empty text)
    contribute nothing, exactly as an empty set contributes nothing to a
    union."""
    sigs = ensure_min_parallelism(
        docs.select(
            F.col(source_col).alias("source"), F.col(text_col).alias("text")
        )
    ).select("source", minhash_udf(F.col("text")).alias("sig"))
    return (
        sigs.select("source", F.posexplode("sig").alias("j", "v"))
        .groupBy("source", "j")
        .agg(F.min("v").alias("v"))
    )


def source_overlap_minhash(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    agreement_only: bool = False,
) -> DataFrame:
    """Pairwise estimated shingle-set Jaccard between sources.

    Output: one row per unordered source pair (source_a < source_b) with
    ``n_agree`` = number of agreeing sketch coordinates and
    ``est_jaccard`` = n_agree / NUM_HASHES (the standard MinHash unbiased
    agreement estimator). Sources whose documents have no shingles at all
    produce no sketch and are absent from the matrix.

    ``agreement_only`` is the very-many-sources cutover (> ~10^4
    sources, where the full S x S x NUM_HASHES theta-join stops being a
    report anyone reads anyway): join sketch rows on (j, v) EQUALITY —
    an equi-join Spark executes as a hash join with no cross product —
    so only pairs with at least one agreeing coordinate survive.
    Agreeing pairs carry identical n_agree/est_jaccard in both modes
    (pinned by test_corpus_stats); zero-agreement pairs are absent
    rather than reported as 0.0."""
    sk = source_minhash_sketches(docs, source_col, text_col)
    a = sk.alias("a")
    b = sk.alias("b")
    if agreement_only:
        join_cond = (
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.source") < F.col("b.source"))
        )
    else:
        join_cond = (F.col("a.j") == F.col("b.j")) & (
            F.col("a.source") < F.col("b.source")
        )
    return (
        a.join(b, join_cond)
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(
            F.sum(
                F.when(F.col("a.v") == F.col("b.v"), 1).otherwise(0)
            ).alias("n_agree")
        )
        .select(
            "source_a",
            "source_b",
            "n_agree",
            (F.col("n_agree").cast("double") / float(NUM_HASHES)).alias(
                "est_jaccard"
            ),
        )
    )


def cross_source_dup_matrix(
    docs: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Exact copy-flow matrix: for each unordered source pair, how many
    content groups they share and how many cross-source duplicate pairs
    that implies.

    Content key = sha256(normalized text), the same key as
    :func:`text_dedup.exact_text_groups` (the reference's hash-group,
    DataControllerSimple.cs:252-301). The corpus collapses to one row per
    (content_sha, source) BEFORE the pairwise stage, so the self-join is
    bounded by duplicate groups that actually span sources — a giant
    single-source dup group contributes nothing to the join."""
    counts = (
        docs.where(F.col(text_col).isNotNull())
        .groupBy(
            F.sha2(normalized_text(F.col(text_col)), 256).alias(
                "content_sha"
            ),
            F.col(source_col).alias("source"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a = counts.alias("a")
    b = counts.alias("b")
    return (
        a.join(
            b,
            (F.col("a.content_sha") == F.col("b.content_sha"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("shared_groups"),
            F.sum(F.col("a.n") * F.col("b.n")).alias("cross_pairs"),
        )
    )


def near_dup_source_matrix(
    docs: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    clusters: DataFrame | None = None,
) -> DataFrame:
    """Fuzzy copy-flow matrix: :func:`cross_source_dup_matrix` with the
    content key widened from exact sha equality to the near-dup CLUSTER —
    which source pairs paraphrase/mirror each other, not just mirror
    verbatim. The report a crawl-quality owner reads to find systematic
    cross-host content laundering that exact hashing misses.

    Same scale shape as the exact matrix: the corpus collapses to one row
    per (cluster_id, source) before anything pairwise happens, so the
    pairwise stage is bounded by clusters that actually span sources.
    Clusters are injectable (the dedup_tier_stats /
    leakage_safe_split contract) — production passes the pipeline's
    materialized assignment frame and this is one join + two
    hash-aggregates over it."""
    if clusters is None:
        from .text_dedup import near_dup_text_clusters

        clusters = near_dup_text_clusters(
            docs, id_col=id_col, text_col=text_col
        )
    counts = (
        clusters.join(
            docs.select(
                F.col(id_col).alias("doc_id"),
                F.col(source_col).alias("source"),
            ),
            "doc_id",
        )
        .groupBy("cluster_id", "source")
        .agg(F.count(F.lit(1)).alias("n"))
        # BOTH sides of the pairwise self-join read this frame; without a
        # lineage cut each side re-executes the upstream chain — a full
        # LSH -> verify -> CC run TWICE when clusters defaulted to the
        # fuzzy closure (measured 2x wall at sf0.1). The frame is tiny
        # (one row per (cluster, source)), so the cut is free.
        .localCheckpoint(eager=False)
    )
    a = counts.alias("a")
    b = counts.alias("b")
    return (
        a.join(
            b,
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("shared_clusters"),
            F.sum(F.col("a.n") * F.col("b.n")).alias("cross_pairs"),
        )
    )
