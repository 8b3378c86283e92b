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


def incremental_caption_candidates(
    new_features: DataFrame,
    prev_bands: DataFrame | None,
    bucket_cap: int = 256,
) -> tuple[DataFrame, DataFrame]:
    """-> (candidate pairs touching a NEW doc, band rows for new docs).

    Incremental LSH: the stored band index (id, band, key) grows append-
    only; a batch's candidates are pairs within the batch plus
    batch-vs-index joins — old-old pairs were already emitted by earlier
    runs, so each pair is discovered exactly once, by the batch that
    completes it. Bucket caps are enforced on the COMBINED bucket size
    (index + batch), mirroring operators/lsh.pairs_from_buckets: an
    over-cap bucket emits star edges to the bucket min instead of all
    pairs. Connectivity (what connected components consumes) is therefore
    preserved; only the pair enumeration is capped, exactly as in the
    batch path.

    Exact-duplicate captions collapse upstream (the caller emits
    caption_exact star edges from caption_sha groups), so the band index
    holds representatives — identical-caption skew never reaches the
    join, same as the batch pipeline."""
    new_bands = (
        new_features.filter(F.col("bands").isNotNull())
        .select(
            F.col("image_id").alias("id"),
            F.posexplode("bands").alias("band", "key"),
        )
    )
    all_bands = (
        new_bands if prev_bands is None
        else prev_bands.unionByName(new_bands)
    )
    stats = (
        all_bands.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("n"), F.min("id").alias("mn"))
        .filter(F.col("n") >= 2)
    )
    nb = new_bands.join(stats, ["band", "key"]).localCheckpoint()
    ab = all_bands.join(stats, ["band", "key"])
    small_new = nb.filter(F.col("n") <= bucket_cap)
    small_all = ab.filter(F.col("n") <= bucket_cap).select(
        "band", "key", F.col("id").alias("other")
    )
    # pair each new member against every bucket member (old or new);
    # least/greatest collapses the doubled new-new direction, the final
    # groupBy collapses multi-band agreement
    p_small = (
        small_new.join(small_all.hint("shuffle_hash"), ["band", "key"])
        .where(F.col("id") != F.col("other"))
        .select(
            F.least("id", "other").alias("src"),
            F.greatest("id", "other").alias("dst"),
            F.lit(False).alias("capped"),
        )
    )
    # a bucket the batch pushed over the cap stars ALL members (old AND
    # new) to the combined-bucket min: the min may be a new id the old
    # members have no historical edge to, so starring only the new rows
    # would split the bucket into two components. Over-cap buckets
    # touched by the batch are few; the broadcast key set keeps this a
    # pruned scan of the index.
    big_keys = (
        nb.filter(F.col("n") > bucket_cap).select("band", "key").distinct()
    )
    p_big = (
        ab.join(F.broadcast(big_keys), ["band", "key"])
        .filter(F.col("id") != F.col("mn"))
        .select(
            F.col("mn").alias("src"),
            F.col("id").alias("dst"),
            F.lit(True).alias("capped"),
        )
    )
    cands = (
        p_small.unionByName(p_big)
        .groupBy("src", "dst")
        .agg(F.max("capped").alias("capped"))
    )
    return cands, new_bands


def incremental_caption_run(
    new_features: DataFrame,
    corpus_captions: DataFrame,
    state: dict | None = None,
    bucket_cap: int = 256,
    jaccard_threshold: float = 0.5,
) -> dict:
    """One incremental batch of the caption near-dup pipeline.

    new_features: extract_features output for the NEW images only
    (image_id, caption_sha, bands, ...).
    corpus_captions: the cumulative images table (image_id, caption) —
    in production the Iceberg table itself; verification joins captions
    for both endpoints by id, old or new.
    state: previous batch's return value, or None for the first batch:
      reps    (caption_sha, rep)   exact-caption representative index
      bands   (id, band, key)      LSH band index (reps only)
      assign  (image_id, cluster_id) current assignments

    Matches the batch pipeline exactly (tests pin equality with a full
    recompute): identical captions collapse to the FIRST-SEEN rep (new
    shas use the batch-min id), only new reps add band rows, candidates
    touch at least one new rep, and only affected components re-cluster
    (operators/connected_components.incremental_clusters)."""
    from ..operators.connected_components import (
        connected_components,
        incremental_clusters,
    )
    from ..operators.verify import verify_caption_pairs

    prev_reps = state["reps"] if state else None
    prev_bands = state["bands"] if state else None
    prev_assign = state["assign"] if state else None

    f = new_features.filter(
        F.col("caption_sha").isNotNull() & F.col("bands").isNotNull()
    )
    batch_groups = f.groupBy("caption_sha").agg(
        F.min("image_id").alias("batch_rep"),
        F.any_value("bands").alias("bands"),
    )
    if prev_reps is not None:
        joined = batch_groups.join(prev_reps, "caption_sha", "left")
        resolved = joined.select(
            "caption_sha",
            F.coalesce("rep", "batch_rep").alias("rep"),
            F.col("rep").isNull().alias("is_new_rep"),
            "batch_rep",
            "bands",
        )
    else:
        resolved = batch_groups.select(
            "caption_sha",
            F.col("batch_rep").alias("rep"),
            F.lit(True).alias("is_new_rep"),
            "batch_rep",
            "bands",
        )
    resolved = resolved.localCheckpoint()
    # caption_exact star edges: every new member -> its (possibly old) rep
    star = (
        f.select("image_id", "caption_sha")
        .join(resolved.select("caption_sha", "rep"), "caption_sha")
        .filter(F.col("image_id") != F.col("rep"))
        .select(F.col("rep").alias("src"), F.col("image_id").alias("dst"))
    )
    new_rep_feats = resolved.filter("is_new_rep").select(
        F.col("rep").alias("image_id"), "bands"
    )
    cands, new_band_rows = incremental_caption_candidates(
        new_rep_feats, prev_bands, bucket_cap=bucket_cap
    )
    near = verify_caption_pairs(
        cands.select("src", "dst", "capped"),
        corpus_captions,
        jaccard_threshold=jaccard_threshold,
    ).select("src", "dst")
    new_edges = star.unionByName(near)
    assign = (
        incremental_clusters(prev_assign, new_edges)
        if prev_assign is not None
        else connected_components(new_edges)
    )
    assign = assign.localCheckpoint()
    new_reps = resolved.filter("is_new_rep").select("caption_sha", "rep")
    reps = (
        new_reps if prev_reps is None else prev_reps.unionByName(new_reps)
    )
    bands = (
        new_band_rows if prev_bands is None
        else prev_bands.unionByName(new_band_rows)
    )
    new_band_rows = new_band_rows.localCheckpoint()
    return dict(
        assign=assign,
        reps=reps.localCheckpoint(),
        bands=bands.localCheckpoint(),
        new_reps=new_reps.localCheckpoint(),
        new_bands=new_band_rows,
        edges=new_edges,
    )


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
