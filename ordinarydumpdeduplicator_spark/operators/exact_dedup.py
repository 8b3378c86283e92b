"""Exact-content duplicate grouping — the reference's core operator.

Reproduces ``DataControllerSimple.GetDuplicates``
(OrdinaryDumpDeduplicator/DataController/DataControllerSimple.cs:247-304):

    latest-inspection states  (P1 — done upstream in operators/states.py)
    -> filter readable:  size >= 0          (P2, :263-275)
    -> group by content key (size, sha)     (O1, :252-285)
    -> HAVING count > 1                     (O2, :288-301)

expressed as a hash-aggregate over the content key plus an equi-join back
to the rows — no collect_list of members (the reference builds
`BlobInfo -> set<File>` dictionaries; at 10^12 rows a per-group member
list would OOM, so the cluster id IS the min member id and membership
stays row-wise) and NO sort: a window formulation would sort every row by
the 64-char sha after the exchange, while the aggregate gets map-side
partial combine. tests/test_plans.py pins the no-sort plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def readable(features: DataFrame) -> DataFrame:
    """P2/P3: drop Broken-sentinel rows (size<0 / missing sha) exactly as
    the reference's `blobInfo.Size >= 0` guard (DataControllerSimple.cs:265)."""
    return features.filter((F.col("size") >= 0) & F.col("sha").isNotNull())


def exact_clusters(features: DataFrame, require_dupes: bool = True) -> DataFrame:
    """(image_id, size, sha) -> (image_id, cluster_id, n_members, size, sha).

    cluster_id = min(image_id) within the content-key group; with
    require_dupes (HAVING n>1) singletons are dropped — duplicate groups
    only, as GetDuplicates returns (DataControllerSimple.cs:288-301).

    Plan shape: hash-aggregate group stats + equi-join back, instead of a
    window — a window would SORT every row by the 64-char sha string after
    the exchange. The explicit repartition on the content key feeds both
    the aggregate and the join probe side from ONE exchange (scan + sha
    run once); shuffle_hash keeps the join sort-free."""
    rows = readable(features).select("image_id", "size", "sha").repartition(
        "size", "sha"
    )
    groups = rows.groupBy("size", "sha").agg(
        F.min("image_id").alias("cluster_id"),
        F.count(F.lit(1)).alias("n_members"),
    )
    if require_dupes:
        groups = groups.filter(F.col("n_members") > 1)
    return rows.join(groups.hint("shuffle_hash"), ["size", "sha"]).select(
        "image_id", "size", "sha", "cluster_id", "n_members"
    )


def exact_edges(features: DataFrame) -> DataFrame:
    """Star edges (member -> min member) within each exact group: the
    linear-size edge representation of each duplicate clique, fed to
    connected components alongside near-dup edges."""
    c = exact_clusters(features, require_dupes=True)
    return (
        c.filter(F.col("image_id") != F.col("cluster_id"))
        .select(
            F.col("cluster_id").alias("src"),
            F.col("image_id").alias("dst"),
            F.lit("exact").alias("kind"),
        )
    )


def pixel_exact_edges(features: DataFrame) -> DataFrame:
    """Star edges for CONTAINER-INSENSITIVE exact duplicates: groups keyed
    by (w_actual, h_actual, pixel_sha) over the decoded pixel buffer.

    Catches what the byte key (size, sha) cannot: the same pixels stored
    in different lossless containers (png vs bmp) or with different
    encoder metadata. No reference analogue — the reference only ever
    hashes raw bytes (Common/FsUtils.cs:39-54); for an image corpus the
    pixel identity is the operationally useful exact key. Same
    hash-agg + equi-join shape as exact_clusters (no sort on the key)."""
    rows = features.filter(F.col("pixel_sha").isNotNull()).select(
        "image_id", "w_actual", "h_actual", "pixel_sha"
    ).repartition("w_actual", "h_actual", "pixel_sha")
    key = ["w_actual", "h_actual", "pixel_sha"]
    groups = (
        rows.groupBy(*key)
        .agg(F.min("image_id").alias("mn"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    return (
        rows.join(groups.hint("shuffle_hash"), key)
        .filter(F.col("image_id") != F.col("mn"))
        .select(
            F.col("mn").alias("src"),
            F.col("image_id").alias("dst"),
            F.lit("pixel_exact").alias("kind"),
        )
    )
