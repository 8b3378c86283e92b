"""Connected-components fixpoint vs a union-find oracle (hypothesis graphs)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ordinarydumpdeduplicator_spark.operators.connected_components import (
    connected_components,
    uf_components,
)


def _run(spark, edge_list):
    """Run BOTH paths — the driver union-find fast path (default
    threshold) and the distributed alternating-star loop
    (driver_threshold=0) — and assert they agree before returning."""
    edges = spark.createDataFrame(
        [(a, b) for a, b in edge_list], schema="src string, dst string"
    )
    fast = {
        r.image_id: r.cluster_id for r in connected_components(edges).collect()
    }
    dist = {
        r.image_id: r.cluster_id
        for r in connected_components(edges, driver_threshold=0).collect()
    }
    assert fast == dist
    return fast


def test_single_edge(spark):
    assert _run(spark, [("b", "a")]) == {"a": "a", "b": "a"}


def test_chain_and_clique(spark):
    # path a-b-c-d plus separate clique e,f,g
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("e", "f"), ("f", "g"), ("e", "g")]
    got = _run(spark, edges)
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a",
                   "e": "e", "f": "e", "g": "e"}


def test_self_loops_and_duplicates_ignored(spark):
    got = _run(spark, [("a", "a"), ("a", "b"), ("b", "a"), ("a", "b")])
    assert got == {"a": "a", "b": "a"}


def test_long_path_converges(spark):
    n = 40  # long path: worst case for naive propagation; log^2 rounds here
    nodes = [f"n{i:03d}" for i in range(n)]
    edges = list(zip(nodes, nodes[1:]))
    got = _run(spark, edges)
    assert set(got.values()) == {"n000"}
    assert len(got) == n


@pytest.mark.slow
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=60,
    )
)
def test_random_graphs_match_union_find(spark, edges):
    named = [(f"v{a:02d}", f"v{b:02d}") for a, b in edges if a != b]
    if not named:
        return
    assert _run(spark, named) == uf_components(named)
