"""Duplicate reports: flag truth table, size metrics, sort orders, rollup.

Reproduces the reference's report layer as DataFrames:

- O8  flag derivation  — ``SameContentFilesInfo.AnalyzeDuplicates``
  (OrdinaryDumpDeduplicator/SameContentFilesInfo.cs:209-248): per cluster,
  count members "in original location" vs "isolated" and derive
      has_original      = originals > 0    (HasOriginalLocatedFiles)
      has_isolated      = isolated  > 0    (HasIsolatedDuplicates)
      has_unprocessed   = originals > 1    (HasUnprocessedDuplicates)
      is_unique         = originals + isolated == 1  (IsUnique)
  (BlobPeculiarities bit flags, BlobPeculiarities.cs:5-18, as boolean cols)
- O7  size metrics — all_bytes = size * n; dup_bytes = size * max(orig-1,0);
  all_dup_bytes = size * max(n-1, 0) (SameContentFilesInfo.cs:34-68)
- P7  filtered views — unprocessed / all-isolated / isolated-only
  (DuplicateReport.cs:32-66)
- T1/T2 sort orders — isolated-only groups first, then by reclaimable bytes
  descending (DuplicatesViewController.cs:32-59)
- O10 hierarchy rollup — duplicates aggregated along the location path
  hierarchy via ancestor-prefix explode (DuplicateReport.cs:114-142 +
  GetChainOfNestedDirectories, FileSystemHelper.cs:86-103)

All conditional aggregation — one shuffle per report, no per-group
object graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ISOLATED = "isolated"
ORIGINAL = "original"


def cluster_flags(members: DataFrame) -> DataFrame:
    """members(cluster_id, image_id, size, sort) -> one row per cluster with
    the O8 truth-table flags and O7 size metrics.

    `sort` is original|isolated per member (DuplicateSort.cs:5-11).

    Size-metric semantics: ``all_bytes``/``dup_bytes``/``all_dup_bytes``
    use the reference's max(size)*count formulas, which assume all members
    share one content (SameContentFilesInfo.cs:34-68) — exact-duplicate
    clusters. For NEAR-dup clusters with heterogeneous member sizes use
    ``reclaimable_bytes`` = sum(size) - max(size): bytes freed by keeping
    the single largest member."""
    orig = F.sum(F.when(F.col("sort") == ORIGINAL, 1).otherwise(0))
    isol = F.sum(F.when(F.col("sort") == ISOLATED, 1).otherwise(0))
    return members.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max("size").alias("member_size"),
        orig.alias("n_original"),
        isol.alias("n_isolated"),
        (orig > 0).alias("has_original"),
        (isol > 0).alias("has_isolated"),
        (orig > 1).alias("has_unprocessed"),
        ((orig + isol) == 1).alias("is_unique"),
        (F.max("size") * F.count(F.lit(1))).alias("all_bytes"),
        (F.max("size") * F.greatest(orig - 1, F.lit(0))).alias("dup_bytes"),
        (
            F.max("size") * F.greatest(F.count(F.lit(1)) - 1, F.lit(0))
        ).alias("all_dup_bytes"),
        (F.sum("size") - F.max("size")).alias("reclaimable_bytes"),
    )


def report_views(flags: DataFrame) -> dict[str, DataFrame]:
    """P7: the three filtered report views (DuplicateReport.cs:32-66)."""
    return {
        # groups that still need processing
        "unprocessed": flags.filter(F.col("has_unprocessed")),
        # groups whose duplicates are fully isolated (originals <= 1, some isolated)
        "all_isolated": flags.filter(
            F.col("has_isolated") & ~F.col("has_unprocessed")
        ),
        # groups living only in isolation (no originals at all)
        "isolated_only": flags.filter(
            F.col("has_isolated") & ~F.col("has_original")
        ),
    }


def sorted_report(flags: DataFrame, hide_isolated: bool = False) -> DataFrame:
    """T1/T2: isolated-only groups first, then descending reclaimable bytes
    (DuplicatesViewController.cs:32-59). In hide mode the sort key is
    dup_bytes (originals only), else all_dup_bytes."""
    bytes_key = F.col("dup_bytes") if hide_isolated else F.col("all_dup_bytes")
    out = flags.withColumn(
        "isolated_only", F.col("has_isolated") & ~F.col("has_original")
    )
    if hide_isolated:
        out = out.filter(~(F.col("has_isolated") & ~F.col("has_unprocessed")))
    return out.orderBy(
        F.col("isolated_only").desc(), bytes_key.desc(), F.col("cluster_id")
    )


def location_rollup(members: DataFrame) -> DataFrame:
    """O10: roll duplicate counts/bytes up the location path hierarchy.

    members(cluster_id, image_id, size, location) where location is a
    '/'-separated path. Each row is exploded into its ancestor prefixes
    (F6, GetChainOfNestedDirectories) and aggregated per prefix — the
    DataFrame form of the reference's recursive DirectoryWithDuplicates
    tree (DuplicateReport.cs:114-142,160-203)."""
    parts = F.split(F.col("location"), "/")
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(F.slice(parts, 1, i), "/"),
    )
    exploded = members.select(
        "cluster_id", "image_id", "size", F.explode(prefixes).alias("ancestor")
    )
    return exploded.groupBy("ancestor").agg(
        F.count(F.lit(1)).alias("n_dup_files"),
        F.countDistinct("cluster_id").alias("n_clusters"),
        F.sum("size").alias("dup_bytes"),
    )


def directory_tree(members: DataFrame) -> DataFrame:
    """O10 tree assembly: the recursive ``DirectoryWithDuplicates`` build
    (DuplicateReport.cs:160-203 walks parents upward and nests children)
    as ONE DataFrame — a row per directory node carrying its parent
    pointer, depth, rolled-up duplicate stats, and the child's rank among
    its siblings (dup_bytes descending, then name — the view ordering of
    DuplicatesViewController.cs:32-59 applied per tree level). Consumers
    rebuild the nested structure by following parent_id, or render
    directly from (depth, sibling_rank) — no recursive driver walk.

    members(cluster_id, image_id, size, location) -> tree rows
    (path, name, parent_id, depth, n_dup_files, n_clusters, dup_bytes,
    sibling_rank)."""
    from pyspark.sql import Window

    from .entities import entities_from_locations

    ents = entities_from_locations(members)
    roll = location_rollup(members)
    w = Window.partitionBy("parent_id").orderBy(
        F.col("dup_bytes").desc(), F.col("name")
    )
    return (
        ents.join(roll, ents.path == roll.ancestor)
        .select(
            "path",
            "name",
            "parent_id",
            F.size(F.split("path", "/")).alias("depth"),
            "n_dup_files",
            "n_clusters",
            "dup_bytes",
        )
        .withColumn("sibling_rank", F.row_number().over(w))
    )


def totals(features: DataFrame) -> DataFrame:
    """O9/P5: corpus totals over count-eligible rows (excludes Error/
    Unreadable/size<=0 — OrdinaryDumpDeduplicator.cs:208-222).

    Note the reference counts size>0 only (empty files excluded from the
    byte total but not the file count; :214-221 counts files with size>=0)."""
    eligible = features.filter(
        ~F.col("status").isin("error", "unreadable") & (F.col("size") >= 0)
    )
    return eligible.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("size").alias("total_bytes"),
        F.approx_count_distinct("sha").alias("approx_distinct_blobs"),
    )
