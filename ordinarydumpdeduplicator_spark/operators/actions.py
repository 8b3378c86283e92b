"""Isolate/delete transactions + incremental report maintenance as dataflow.

The reference mutates the filesystem and its object graph in place:

- O17 move-to-isolation (OrdinaryDumpDeduplicator/DuplicatesProcessor.cs:98-183):
  plan a dest dir per source dir, move each duplicate file, mark the old
  ``FileState`` Removed and append a successor state with a
  ``previousState`` link.
- O18 delete (DuplicatesProcessor.cs:185-248) with the P6 guard: deletion is
  allowed ONLY for files already inside an "isolated duplicates" directory
  (DuplicatesProcessor.cs:190-212 throws otherwise).
- O19 incremental view maintenance (Desktop/DuplicatesViewController.cs:75-119):
  after a move/delete, patch the report instead of recomputing it.

Here every mutation is an **actions DataFrame** plus append-only state rows
— no in-place surgery. At 10^12 scale the actions frame drives Iceberg
row-level MERGE/DELETE; locally it appends to the states table and the
report is maintained incrementally per affected cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .report import ISOLATED, ORIGINAL, cluster_flags

ISOLATION_PREFIX = "isolated duplicates"


def plan_isolation(members: DataFrame) -> DataFrame:
    """O17 planning: for every cluster, keep the minimum ORIGINAL member in
    place and plan ``action='isolate'`` for every other original.

    members(cluster_id, image_id, size, sort, location) ->
    actions(image_id, cluster_id, action, from_location, to_location).

    Dest mirrors the reference's per-source-dir layout
    (DuplicatesProcessor.cs:100-113): '<isolation root>/<original location>'.
    One window over cluster_id — no driver loop."""
    from pyspark.sql import Window

    orig = members.filter(F.col("sort") == ORIGINAL)
    w = Window.partitionBy("cluster_id")
    keeper = F.min("image_id").over(w)
    n_orig = F.count(F.lit(1)).over(w)
    return (
        orig.withColumn("keeper", keeper)
        .withColumn("n_orig", n_orig)
        .filter((F.col("n_orig") > 1) & (F.col("image_id") != F.col("keeper")))
        .select(
            "image_id",
            "cluster_id",
            F.lit("isolate").alias("action"),
            F.col("location").alias("from_location"),
            F.concat(
                F.lit(ISOLATION_PREFIX + "/"), F.col("location")
            ).alias("to_location"),
        )
    )


def plan_delete(members: DataFrame) -> DataFrame:
    """O18 planning under the P6 guard: only members already isolated are
    deletable. Raises ValueError if the input contains a non-isolated
    member marked for deletion — the dataflow form of the reference's
    guard-throw (DuplicatesProcessor.cs:190-212)."""
    requested = members.filter(F.col("delete_requested"))
    n_bad = requested.filter(F.col("sort") != ISOLATED).count()
    if n_bad:
        raise ValueError(
            f"plan_delete: {n_bad} requested rows are not isolated duplicates"
        )
    return requested.select(
        "image_id",
        "cluster_id",
        F.lit("delete").alias("action"),
        F.col("location").alias("from_location"),
        F.lit(None).cast("string").alias("to_location"),
    )


def apply_actions(
    states: DataFrame, actions: DataFrame, run_id: str
) -> DataFrame:
    """Append-only successor states for an actions frame (O17/O18 commit).

    For each action: the prior live row is superseded by
      - isolate: a row at ``to_location`` with sort='isolated'
        (status 'new' at the new location; detect_moved then reports it as
        moved — same observable semantics as DuplicatesProcessor.cs:157-170)
      - delete:  a row with status='removed'
    plus, for isolate, a 'removed' row at the old location. Returns ONLY the
    new rows; callers append them to the states table (Iceberg MERGE at
    scale).

    Run ordering: the per-image latest (size, sha) is selected by max_by
    over ``run_id``, so run ids MUST be lexicographically monotone in run
    order — the engine's generators are (zero-padded ``inspection_%09d``
    from streaming/inspection.py); callers minting their own run ids must
    keep that property or pre-filter states to the latest run."""
    latest = states.join(
        actions.select("image_id").distinct(), "image_id", "left_semi"
    ).groupBy("image_id").agg(
        F.max_by("size", "run_id").alias("size"),
        F.max_by("sha", "run_id").alias("sha"),
    )
    a = actions.join(latest, "image_id", "left")
    moved = a.filter(F.col("action") == "isolate")
    new_rows = moved.select(
        "image_id",
        F.lit(run_id).alias("run_id"),
        "size",
        "sha",
        F.lit("new").alias("status"),
        F.col("to_location").alias("location"),
        F.lit(ISOLATED).alias("sort"),
    )
    removed_rows = a.select(
        "image_id",
        F.lit(run_id).alias("run_id"),
        "size",
        "sha",
        F.lit("removed").alias("status"),
        F.col("from_location").alias("location"),
        # isolate targets are originals by construction (plan_isolation);
        # delete targets are isolated by the P6 guard (plan_delete)
        F.when(F.col("action") == "isolate", F.lit(ORIGINAL))
        .otherwise(F.lit(ISOLATED))
        .alias("sort"),
    )
    return removed_rows.unionByName(new_rows)


def maintain_members(members: DataFrame, actions: DataFrame) -> DataFrame:
    """U2/O19: post-action member set. Deleted members drop out (left_anti);
    isolated members get sort='isolated' and the new location."""
    deletes = actions.filter(F.col("action") == "delete").select("image_id")
    moves = actions.filter(F.col("action") == "isolate").select(
        "image_id", "to_location"
    )
    kept = members.join(deletes, "image_id", "left_anti")
    return (
        kept.join(F.broadcast(moves), "image_id", "left")
        .select(
            "cluster_id",
            "image_id",
            "size",
            F.when(F.col("to_location").isNotNull(), F.lit(ISOLATED))
            .otherwise(F.col("sort"))
            .alias("sort"),
            F.coalesce("to_location", "location").alias("location"),
        )
    )


def maintain_flags(
    flags: DataFrame, members_after: DataFrame, actions: DataFrame
) -> DataFrame:
    """O19 incremental report maintenance: recompute flags ONLY for clusters
    an action touched; untouched clusters pass through (anti join). The
    incremental-MERGE pattern for 10^12-scale reports — the recompute side
    is bounded by the action count, broadcast to prune."""
    touched = actions.select("cluster_id").distinct()
    untouched = flags.join(F.broadcast(touched), "cluster_id", "left_anti")
    recomputed = cluster_flags(
        members_after.join(F.broadcast(touched), "cluster_id", "left_semi")
    )
    return untouched.unionByName(recomputed)
