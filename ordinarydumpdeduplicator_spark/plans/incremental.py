"""Incremental inspections: only new/changed payloads pay feature cost.

The reference's operational loop is re-inspection: every scan creates an
``Inspection`` and each file gets a per-inspection ``FileState`` whose
status (New/Unchanged/Modified/Removed) is derived against the previous
state (Common/FileStatus.cs:5-14, Common/FileState.cs:67-70). At 10^12
rows the analogous property is the one that matters operationally: a
daily increment must NOT re-decode the whole corpus.

``incremental_features`` reuses the stored features table for every image
id already seen and runs the (expensive, Python-side) extraction ONLY for
ids not present yet — a left-anti join. Graph stages then run over the
combined compact features, which is the cheap, JVM-side part. (Fully
incremental LSH — appending band rows and re-clustering only affected
components — is the next refinement; the band/bucket tables checkpointed
by operators/lsh.py are already in the right shape for it.)

Status derivation (CDC) comes from operators/states.derive_status over the
append-only states rows each run emits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.features import extract_features


def incremental_features(
    images: DataFrame, prev_features: DataFrame | None
) -> tuple[DataFrame, DataFrame]:
    """-> (features for the CURRENT corpus, newly_extracted features).

    images: the current full input table (ids present = live rows).
    prev_features: the stored features table from the previous run (or
    None for a first run).

    Reuse rule: an id present in prev_features is NOT re-extracted (the
    input table contract is immutable payload per image_id — a changed
    payload must arrive under a new id, as in any content-addressed
    corpus). Removed ids drop out via the semi join.
    """
    if prev_features is None:
        fresh = extract_features(images)
        return fresh, fresh
    todo = images.join(
        prev_features.select("image_id"), "image_id", "left_anti"
    )
    fresh = extract_features(todo)
    kept = prev_features.join(
        images.select("image_id"), "image_id", "left_semi"
    )
    return kept.unionByName(fresh), fresh


def run_states(
    features: DataFrame, run_id: str, location_col=None
) -> DataFrame:
    """Append-only state rows for this run (feeds states.derive_status)."""
    loc = location_col if location_col is not None else F.concat(
        F.lit("corpus/"), F.col("image_id")
    )
    return features.select(
        "image_id",
        F.lit(run_id).alias("run_id"),
        "size",
        F.unhex("sha").alias("sha"),
        F.when(F.col("status") != "ok", F.col("status"))
        .otherwise(F.lit("new"))
        .alias("status"),
        loc.alias("location"),
        F.lit("original").alias("sort"),
    )
