"""Property-based tests (SURVEY.md §5.5): permutation invariance,
idempotent re-run, CC vs union-find oracle on random graphs."""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ordinarydumpdeduplicator_spark.operators.connected_components import (
    connected_components,
    uf_components,
)

# Spark jobs per example are expensive: keep example counts small but real.
SPARK_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


edges_strategy = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).map(
        lambda t: (f"n{t[0]:02d}", f"n{t[1]:02d}")
    ),
    min_size=1,
    max_size=60,
)


@given(edges=edges_strategy)
@settings(**SPARK_SETTINGS)
def test_cc_matches_union_find_oracle(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    # driver_threshold=0 forces the distributed alternating-star loop —
    # the driver fast path IS uf_components, so only this is a real test
    got = {
        r["image_id"]: r["cluster_id"]
        for r in connected_components(df, driver_threshold=0).collect()
    }
    want = uf_components([(a, b) for a, b in edges if a != b])
    assert got == want


@given(edges=edges_strategy, seed=st.integers(0, 2**16))
@settings(**SPARK_SETTINGS)
def test_cc_permutation_invariant(spark, edges, seed):
    rng = random.Random(seed)
    shuffled = edges[:]
    rng.shuffle(shuffled)
    flipped = [(b, a) if rng.random() < 0.5 else (a, b) for a, b in shuffled]
    a = {
        r["image_id"]: r["cluster_id"]
        for r in connected_components(
            spark.createDataFrame(edges, "src string, dst string")
        ).collect()
    }
    b = {
        r["image_id"]: r["cluster_id"]
        for r in connected_components(
            spark.createDataFrame(flipped, "src string, dst string")
        ).collect()
    }
    assert a == b


def test_pipeline_rerun_identical(spark, tiny_corpus, tmp_path):
    """Idempotent re-run: a second inspection over unchanged data yields
    byte-identical cluster assignments (reference: re-inspection of an
    unchanged tree must re-derive the same duplicate groups)."""
    from ordinarydumpdeduplicator_spark.plans.pipeline import (
        NearDupPipeline,
        PipelineConfig,
    )
    from tests.conftest import to_spark_images

    pdf, _ = tiny_corpus
    images = to_spark_images(spark, pdf)
    runs = []
    for run_id in ("run_a", "run_b"):
        res = NearDupPipeline(
            spark, PipelineConfig(checkpoint_dir=str(tmp_path), run_id=run_id)
        ).run(images)
        runs.append(
            sorted(
                (r["image_id"], r["cluster_id"], r["is_dup"])
                for r in res["clusters"].collect()
            )
        )
    assert runs[0] == runs[1]
