"""Similarity search: brute-force exact correctness vs a numpy oracle, and
IVF recall on a CLUSTERED corpus (the testdata embeddings are pure random
noise, where bucketed ANN is information-theoretically blind — so the ANN
recall gate uses a planted clustered fixture instead)."""

import numpy as np
import pytest
from pyspark.sql import types as T

from ordinarydumpdeduplicator_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)

EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    ]
)


def _clustered_corpus(n=600, dim=32, n_clusters=30, seed=11):
    """Unit vectors in tight clusters: top-k neighbors are same-cluster."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1)[:, None]
    vecs, labels = [], []
    for i in range(n):
        c = i % n_clusters
        v = centers[c] + 0.15 * rng.standard_normal(dim)
        vecs.append((v / np.linalg.norm(v)).astype(np.float32))
        labels.append(c)
    return np.stack(vecs), np.array(labels)


@pytest.fixture(scope="module")
def clustered(spark):
    vecs, labels = _clustered_corpus()
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        schema=EMB_SCHEMA,
    ).cache()
    df.count()
    return df, vecs, labels


def _numpy_topk(vecs, k):
    M = vecs.astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1)[:, None]
    S = Mn @ Mn.T
    np.fill_diagonal(S, -np.inf)
    out = {}
    for i in range(len(M)):
        order = sorted(range(len(M)), key=lambda j: (-S[i, j], j))[:k]
        out[i] = order
    return out


def test_brute_force_matches_numpy(clustered):
    df, vecs, _ = clustered
    got = brute_force_topk(df, k=3).collect()
    by_query = {}
    for r in got:
        by_query.setdefault(r.vec_id, []).append((r.rank, r.neighbor_id))
    expect = _numpy_topk(vecs, 3)
    assert len(by_query) == len(vecs)
    for q, pairs in by_query.items():
        ids = [n for _, n in sorted(pairs)]
        assert ids == expect[q], f"query {q}: {ids} != {expect[q]}"


def test_ivf_recall_on_clustered_corpus(clustered):
    df, vecs, _ = clustered
    exact = _numpy_topk(vecs, 3)
    got = ivf_topk(df, k=3, n_cells=32, n_probe=4).collect()
    by_query = {}
    for r in got:
        by_query.setdefault(r.vec_id, set()).add(r.neighbor_id)
    hits = total = 0
    for q, expect_ids in exact.items():
        total += len(expect_ids)
        hits += len(set(expect_ids) & by_query.get(q, set()))
    recall = hits / total
    assert recall >= 0.95, f"IVF recall@3 = {recall:.3f}"


def test_lsh_finds_high_similarity_neighbors(clustered):
    """Hyperplane LSH is only asked to find genuinely-close (same-cluster)
    neighbors — the regime it is built for."""
    df, vecs, labels = clustered
    got = lsh_topk(df, dim=32, k=3, n_planes=16, bands=4).collect()
    same = sum(1 for r in got if labels[r.vec_id] == labels[r.neighbor_id])
    assert same / max(len(got), 1) >= 0.9
