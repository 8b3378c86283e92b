"""dedup_pair_metrics: pair recall/precision of a dedup run vs a labeled
pair set (the north rule's acceptance metric as a distributed operator)."""

from __future__ import annotations

from ordinarydumpdeduplicator_spark.operators.dedup_eval import (
    dedup_pair_metrics,
)


def _metrics(spark, assign_rows, golden_rows, **kw):
    assignments = spark.createDataFrame(
        assign_rows, "doc_id long, cluster_id long"
    )
    golden = spark.createDataFrame(golden_rows, "id_a long, id_b long")
    [row] = dedup_pair_metrics(assignments, golden, **kw).collect()
    return row


def test_exact_counts_on_toy_clustering(spark):
    # clusters: {1,2,3}, {4,5}, {6} -> predicted pairs C(3,2)+C(2,2)=3+1=4
    assign = [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6)]
    # golden: (1,2) hit, (2,3) hit, (4,5) hit, (1,6) miss, (7,8) unknown ids
    golden = [(1, 2), (2, 3), (4, 5), (1, 6), (7, 8)]
    r = _metrics(spark, assign, golden)
    assert (r.n_golden, r.n_predicted, r.n_hit) == (5, 4, 3)
    assert r.pair_recall == 3 / 5
    assert r.pair_precision == 3 / 4


def test_golden_canonicalization(spark):
    # reversed order, duplicates, and self-pairs collapse to ONE pair
    assign = [(1, 1), (2, 1)]
    golden = [(1, 2), (2, 1), (1, 2), (1, 1)]
    r = _metrics(spark, assign, golden)
    assert (r.n_golden, r.n_hit) == (1, 1)
    assert r.pair_recall == 1.0


def test_empty_golden_gives_null_recall(spark):
    assign = [(1, 1), (2, 1)]
    r = _metrics(spark, assign, [], )
    assert r.n_golden == 0 and r.n_hit == 0
    assert r.pair_recall is None
    assert r.n_predicted == 1 and r.pair_precision == 0.0


def test_all_singletons_gives_null_precision(spark):
    assign = [(1, 1), (2, 2)]
    r = _metrics(spark, assign, [(1, 2)])
    assert r.n_predicted == 0
    assert r.pair_precision is None
    assert r.pair_recall == 0.0


def test_custom_column_names(spark):
    assignments = spark.createDataFrame(
        [("a", "c1"), ("b", "c1")], "image_id string, cid string"
    )
    golden = spark.createDataFrame([("a", "b")], "left string, right string")
    [r] = dedup_pair_metrics(
        assignments,
        golden,
        id_col="image_id",
        cluster_col="cid",
        id_a="left",
        id_b="right",
    ).collect()
    assert r.pair_recall == 1.0 and r.pair_precision == 1.0


def test_image_pipeline_recall_via_operator(spark, tmp_path):
    """The verify-skill recall drive, distributed: evaluate NearDupPipeline
    clusters against the planted golden pairs with the operator instead of
    a driver-side dict — north-rule bar recall >= 0.99."""
    from ordinarydumpdeduplicator_spark.fixtures.generator import (
        IMAGE_COLS,
        make_corpus,
    )
    from ordinarydumpdeduplicator_spark.plans.pipeline import (
        NearDupPipeline,
        PipelineConfig,
    )
    from ordinarydumpdeduplicator_spark.schemas import IMAGES_SCHEMA

    pdf, golden = make_corpus(1200)
    images = spark.createDataFrame(pdf[IMAGE_COLS], schema=IMAGES_SCHEMA)
    res = NearDupPipeline(
        spark, PipelineConfig(checkpoint_dir=str(tmp_path), run_id="ev")
    ).run(images)
    gdf = spark.createDataFrame(
        golden[["image_id_a", "image_id_b"]],
        "image_id_a string, image_id_b string",
    )
    [r] = dedup_pair_metrics(
        res["clusters"],
        gdf,
        id_col="image_id",
        cluster_col="cluster_id",
        id_a="image_id_a",
        id_b="image_id_b",
    ).collect()
    assert r.n_golden == len(golden)
    assert r.pair_recall >= 0.99
