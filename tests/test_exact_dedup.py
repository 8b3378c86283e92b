"""Exact-dedup operator vs the reference semantics + a pandas oracle.

Oracle mirrors DataControllerSimple.GetDuplicates (:247-304): group readable
rows by (size, sha), keep groups > 1.
"""

import hashlib

from pyspark.sql import functions as F

from ordinarydumpdeduplicator_spark.operators.exact_dedup import (
    exact_clusters,
    exact_edges,
    readable,
)
from ordinarydumpdeduplicator_spark.operators.features import (
    EMPTY_SHA256,
    extract_features,
)


def _pandas_oracle(pdf):
    """Reference-semantics oracle in pandas: content key -> member ids."""
    groups = {}
    for r in pdf.itertuples():
        b = r.bytes
        if b is None:
            continue
        b = bytes(b)
        if len(b) > 0:
            try:
                from ordinarydumpdeduplicator_spark.fixtures import codecs

                codecs.decode(b)
            except ValueError:
                continue  # Broken sentinel excluded (DataControllerSimple.cs:265)
        key = (len(b), hashlib.sha256(b).hexdigest())
        groups.setdefault(key, []).append(r.image_id)
    return {
        min(ids): sorted(ids) for ids in groups.values() if len(ids) > 1
    }


def test_exact_clusters_match_oracle(spark, tiny_corpus, tiny_images):
    pdf, _ = tiny_corpus
    feats = extract_features(tiny_images).cache()
    got = exact_clusters(feats).collect()
    got_groups = {}
    for row in got:
        got_groups.setdefault(row.cluster_id, []).append(row.image_id)
    got_groups = {k: sorted(v) for k, v in got_groups.items()}
    assert got_groups == _pandas_oracle(pdf)


def test_empty_payloads_form_one_group(spark, tiny_corpus, tiny_images):
    pdf, _ = tiny_corpus
    empties = sorted(pdf[pdf._class == "empty"].image_id)
    feats = extract_features(tiny_images)
    rows = exact_clusters(feats).filter(F.col("size") == 0).collect()
    assert sorted(r.image_id for r in rows) == empties
    assert {r.cluster_id for r in rows} == {min(empties)}
    assert {r.sha for r in rows} == {EMPTY_SHA256}


def test_undecodable_rows_hash_but_carry_no_pixel_features(
    spark, tiny_corpus, tiny_images
):
    """Content identity comes from the BYTES (the reference hashes without
    decoding, Common/FsUtils.cs:39-54): undecodable payloads still join
    exact grouping; only pixel features are NULL. The Broken sentinel
    (size=-1, no sha) is reserved for missing payloads (I/O failure)."""
    pdf, _ = tiny_corpus
    unread = set(pdf[pdf._class == "unreadable"].image_id)
    feats = extract_features(tiny_images).cache()
    flagged = feats.filter(F.col("status") == "undecodable")
    assert {r.image_id for r in flagged.collect()} == unread
    # hashable: size/sha present, so they BELONG to grouping input
    assert flagged.filter((F.col("size") < 0) | F.col("sha").isNull()).count() == 0
    assert readable(feats).filter(F.col("image_id").isin(unread)).count() == len(unread)
    # but no pixel features
    assert flagged.filter(F.col("phash_v").isNotNull()).count() == 0


def test_exact_edges_are_star_per_group(spark, tiny_images):
    feats = extract_features(tiny_images).cache()
    clusters = exact_clusters(feats)
    edges = exact_edges(feats)
    n_members = clusters.count()
    n_groups = clusters.select("cluster_id").distinct().count()
    assert edges.count() == n_members - n_groups
    assert edges.filter(F.col("src") >= F.col("dst")).count() == 0


def test_features_verify_input_phash(spark, tiny_corpus, tiny_images):
    """Recomputed phash must equal the table's phash column for decodable rows."""
    feats = extract_features(tiny_images)
    joined = feats.filter(F.col("status") == "ok").join(
        tiny_images.select("image_id", "phash"), "image_id"
    )
    mismatches = joined.filter(
        (F.col("size") > 0) & (F.col("phash_v") != F.col("phash"))
    ).count()
    assert mismatches == 0


def test_pixel_exact_edges_cross_container(spark):
    """The same pixels encoded as png and bmp are byte-distinct (the
    (size, sha) key misses them) but pixel-identical: pixel_exact_edges
    links them; the full pipeline then clusters them together."""
    import numpy as np

    from ordinarydumpdeduplicator_spark.fixtures import codecs
    from ordinarydumpdeduplicator_spark.operators.exact_dedup import (
        pixel_exact_edges,
    )
    from ordinarydumpdeduplicator_spark.plans.pipeline import (
        NearDupPipeline,
        PipelineConfig,
    )
    from ordinarydumpdeduplicator_spark.schemas import IMAGES_SCHEMA

    rng = np.random.default_rng(9)
    px_a = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    px_b = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    rows = [
        ("i_png", bytearray(codecs.encode_png(px_a)), 32, 24, "png", "one", 0),
        ("i_bmp", bytearray(codecs.encode_bmp(px_a)), 32, 24, "bmp", "two", 0),
        ("i_other", bytearray(codecs.encode_png(px_b)), 32, 24, "png", "three", 0),
    ]
    images = spark.createDataFrame(rows, schema=IMAGES_SCHEMA)
    feats = extract_features(images).cache()

    # byte key separates them...
    assert exact_edges(feats).count() == 0
    # ...the pixel key links exactly the cross-container pair
    px_edges = {(r.src, r.dst) for r in pixel_exact_edges(feats).collect()}
    assert px_edges == {("i_bmp", "i_png")}

    # end to end: one cluster for the pair, the unrelated image alone
    res = NearDupPipeline(spark, PipelineConfig()).run(images)
    cl = {r.image_id: r.cluster_id for r in res["clusters"].collect()}
    assert cl["i_png"] == cl["i_bmp"]
    assert cl["i_other"] != cl["i_png"]
