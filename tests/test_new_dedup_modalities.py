"""SimHash near-pairs and embedding-cosine near-dup operators."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ordinarydumpdeduplicator_spark.operators.similarity import (
    embedding_dup_pairs,
    embedding_near_pairs_lsh,
)
from ordinarydumpdeduplicator_spark.operators.text_dedup import simhash_near_pairs


@pytest.fixture(scope="module")
def emb_df(spark):
    """24 vectors in dim 16: 4 planted near-dup pairs (cosine ~0.99), rest
    random (expected cosine ~0 in high-dim)."""
    rng = np.random.default_rng(11)
    rows = []
    for i in range(8):
        v = rng.standard_normal(16)
        rows.append((f"v{i:03d}", (v / np.linalg.norm(v)).tolist()))
    for j in range(4):
        base = np.asarray(rows[j][1])
        near = base + 0.02 * rng.standard_normal(16)
        near = near / np.linalg.norm(near)
        rows.append((f"v{100+j:03d}", near.tolist()))
    for i in range(12):
        v = rng.standard_normal(16)
        rows.append((f"v{200+i:03d}", (v / np.linalg.norm(v)).tolist()))
    return spark.createDataFrame(rows, "vec_id string, embedding array<double>")


def _planted():
    return {(f"v{j:03d}", f"v{100+j:03d}") for j in range(4)}


def test_embedding_dup_pairs_exact(spark, emb_df):
    got = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in embedding_dup_pairs(emb_df, threshold=0.9).collect()
    }
    assert got == _planted()


def test_embedding_lsh_matches_exact(spark, emb_df):
    exact = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in embedding_dup_pairs(emb_df, threshold=0.9).collect()
    }
    approx = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in embedding_near_pairs_lsh(emb_df, dim=16, threshold=0.9).collect()
    }
    # verification guarantees no false positives; recall on planted pairs
    assert approx <= exact
    assert len(approx & _planted()) >= 3  # >= 75% recall on near-identicals


def test_simhash_near_pairs(spark):
    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep green forest tonight").split()
    docs = [
        ("d1", " ".join(base)),
        ("d2", " ".join(base[:-1] + ["today"])),   # one token differs
        ("d3", " ".join(base)),                    # exact duplicate of d1
        ("d4", "completely different content about spark dataframes and "
               "shuffle partitioning strategies at scale"),
        ("d5", None),
        ("d6", ""),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    pairs = {
        (r["doc_id_a"], r["doc_id_b"]): r["hamming"]
        for r in simhash_near_pairs(df, hamming_threshold=8).collect()
    }
    assert pairs[("d1", "d3")] == 0
    assert ("d1", "d2") in pairs and pairs[("d1", "d2")] <= 8
    assert not any("d4" in p for p in pairs)
    assert not any("d5" in p or "d6" in p for p in pairs)
