"""Incremental runs: only unseen ids pay extraction; clusters match a
full recompute."""

from __future__ import annotations

from pyspark.sql import functions as F

from ordinarydumpdeduplicator_spark.operators.connected_components import (
    connected_components,
)
from ordinarydumpdeduplicator_spark.operators.exact_dedup import exact_edges
from ordinarydumpdeduplicator_spark.operators.features import extract_features
from ordinarydumpdeduplicator_spark.plans.incremental import (
    incremental_features,
)
from tests.conftest import to_spark_images


def _clusters(feats):
    edges = exact_edges(feats)
    return {
        r["image_id"]: r["cluster_id"]
        for r in connected_components(edges.select("src", "dst")).collect()
    }


def test_incremental_matches_full(spark, tiny_corpus):
    pdf, _ = tiny_corpus
    first = to_spark_images(spark, pdf.iloc[:150])
    full = to_spark_images(spark, pdf)  # 200 rows: 150 old + 50 new

    prev_feats, fresh0 = incremental_features(first, None)
    prev_feats = prev_feats.cache()
    assert fresh0.count() == 150

    feats2, fresh = incremental_features(full, prev_feats)
    assert fresh.count() == 50  # ONLY the 50 unseen ids were extracted
    assert feats2.count() == 200

    # cluster assignments identical to a from-scratch run
    assert _clusters(feats2.cache()) == _clusters(
        extract_features(full).cache()
    )


def test_incremental_drops_removed_ids(spark, tiny_corpus):
    pdf, _ = tiny_corpus
    first = to_spark_images(spark, pdf.iloc[:100])
    shrunk = to_spark_images(spark, pdf.iloc[25:100])  # 25 ids removed

    prev_feats, _ = incremental_features(first, None)
    feats2, fresh = incremental_features(shrunk, prev_feats.cache())
    assert fresh.count() == 0
    assert feats2.count() == 75
    kept_ids = {r["image_id"] for r in feats2.select("image_id").collect()}
    gone = set(pdf.iloc[:25]["image_id"])
    assert not (kept_ids & gone)
