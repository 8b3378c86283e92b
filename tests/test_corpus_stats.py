"""Source-level corpus audits (operators/corpus_stats.py) + deterministic
training order (operators/sampling.training_order).

Semantics pinned against pure-python oracles on hand-built corpora; the
DuckDB value-parity for the three contract queries lives in
tests/test_oracle_parity.py."""

from __future__ import annotations

import numpy as np

from ordinarydumpdeduplicator_spark.functions.minhash import (
    NUM_HASHES,
    minhash_signature,
)
from ordinarydumpdeduplicator_spark.operators.corpus_stats import (
    cross_source_dup_matrix,
    source_minhash_sketches,
    source_overlap_minhash,
)
from ordinarydumpdeduplicator_spark.operators.sampling import training_order


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def test_source_sketch_equals_union_minhash(spark):
    """Per-source sketch == elementwise min of the per-doc signatures
    (the minhash of the union shingle set)."""
    texts = {
        "a": ["red fox jumps over", "lazy dog sleeps here now"],
        "b": ["red fox jumps over", "completely different caption words"],
    }
    rows = []
    i = 0
    for src, ts in texts.items():
        for t in ts:
            rows.append((i, t, src))
            i += 1
    sk = source_minhash_sketches(_docs(spark, rows)).collect()
    got = {}
    for r in sk:
        got.setdefault(r["source"], {})[r["j"]] = r["v"]
    for src, ts in texts.items():
        sigs = np.array([minhash_signature(t) for t in ts], dtype=np.int64)
        expected = sigs.min(axis=0)
        assert len(got[src]) == NUM_HASHES
        for j in range(NUM_HASHES):
            assert got[src][j] == expected[j], (src, j)


def test_source_overlap_identical_and_disjoint(spark):
    rows = [
        (1, "red fox jumps over the dog", "s1"),
        (2, "blue whale swims in the sea", "s1"),
        (3, "red fox jumps over the dog", "s2"),
        (4, "blue whale swims in the sea", "s2"),
        (5, "granite mountain stands alone tonight", "s3"),
    ]
    out = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap_minhash(_docs(spark, rows)).collect()
    }
    assert out[("s1", "s2")]["n_agree"] == NUM_HASHES
    assert out[("s1", "s2")]["est_jaccard"] == 1.0
    # disjoint shingle sets: agreement only by hash accident (~0)
    assert out[("s1", "s3")]["est_jaccard"] < 0.2
    assert out[("s2", "s3")]["est_jaccard"] < 0.2


def test_source_overlap_agreement_only_cutover(spark):
    """The >10^4-sources cutover: the (j, v) equi-join path must report
    IDENTICAL n_agree/est_jaccard for every agreeing pair, and only drop
    the zero-agreement rows of the full matrix."""
    rows = [
        (1, "red fox jumps over the dog", "s1"),
        (2, "blue whale swims in the sea", "s1"),
        (3, "red fox jumps over the dog", "s2"),
        (4, "blue whale swims in the sea", "s2"),
        (5, "granite mountain stands alone tonight", "s3"),
        (6, "red fox jumps over the dog", "s4"),
    ]
    full = {
        (r["source_a"], r["source_b"]): (r["n_agree"], r["est_jaccard"])
        for r in source_overlap_minhash(_docs(spark, rows)).collect()
    }
    agree = {
        (r["source_a"], r["source_b"]): (r["n_agree"], r["est_jaccard"])
        for r in source_overlap_minhash(
            _docs(spark, rows), agreement_only=True
        ).collect()
    }
    assert agree == {k: v for k, v in full.items() if v[0] > 0}
    assert ("s1", "s2") in agree and ("s1", "s4") in agree


def test_source_overlap_skips_shingle_free_sources(spark):
    rows = [
        (1, "some real text here", "s1"),
        (2, None, "empty_src"),
        (3, "   ", "empty_src"),
    ]
    out = source_overlap_minhash(_docs(spark, rows)).collect()
    assert out == []  # no pair rows — empty_src has no sketch


def test_cross_source_dup_matrix_counts(spark):
    rows = [
        (1, "shared text one", "s1"),
        (2, "shared text one", "s1"),  # two copies in s1
        (3, "shared text one", "s2"),  # one in s2 -> cross_pairs 2*1
        (4, "shared text two", "s1"),
        (5, "shared text two", "s2"),  # second shared group, 1*1
        (6, "only in s1", "s1"),
        (7, None, "s2"),
    ]
    out = cross_source_dup_matrix(_docs(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["source_a"], r["source_b"]) == ("s1", "s2")
    assert r["shared_groups"] == 2
    assert r["cross_pairs"] == 2 * 1 + 1 * 1


def test_cross_source_dup_matrix_normalizes_text(spark):
    rows = [
        (1, "Hello   World", "s1"),
        (2, "hello world", "s2"),
    ]
    out = cross_source_dup_matrix(_docs(spark, rows)).collect()
    assert len(out) == 1 and out[0]["shared_groups"] == 1


def test_training_order_is_deterministic_permutation(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}", "s") for i in range(500)],
        "doc_id long, text string, source string",
    )
    a = training_order(docs, n_shards=16)
    rows = a.collect()
    assert len(rows) == 500
    assert {r["doc_id"] for r in rows} == set(range(500))
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r["shard"] < 16
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # deterministic re-run
    b = {(r["doc_id"], r["shard"], r["pos"]) for r in a.collect()}
    assert b == {(r["doc_id"], r["shard"], r["pos"]) for r in rows}
    # a different salt reshuffles (at least one doc moves)
    c = training_order(docs, n_shards=16, salt="epoch2").collect()
    moved = sum(
        1
        for r, s in zip(
            sorted(rows, key=lambda r: r["doc_id"]),
            sorted(c, key=lambda r: r["doc_id"]),
        )
        if (r["shard"], r["pos"]) != (s["shard"], s["pos"])
    )
    assert moved > 400


def test_leakage_safe_split_cluster_atomicity(spark):
    from ordinarydumpdeduplicator_spark.operators.sampling import (
        leakage_safe_split,
    )

    # near-dup family: shared long prefix -> same cluster
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, base + f" tail{i % 3}", "s") for i in range(30)]
    rows += [(100 + i, f"unique document number {i} about topic {i}", "s")
             for i in range(40)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    out = leakage_safe_split(docs, test_fraction=0.3).collect()
    assert len(out) == len(rows)
    by_cluster: dict[int, set[str]] = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    # no cluster straddles the boundary
    assert all(len(s) == 1 for s in by_cluster.values())
    sides = {r["split"] for r in out}
    assert sides == {"train", "test"}
    # deterministic
    again = leakage_safe_split(docs, test_fraction=0.3).collect()
    assert {(r["doc_id"], r["split"]) for r in again} == {
        (r["doc_id"], r["split"]) for r in out
    }


def test_leakage_safe_split_accepts_precomputed_clusters(spark):
    from ordinarydumpdeduplicator_spark.operators.sampling import (
        leakage_safe_split,
    )

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3)], "doc_id long, cluster_id long"
    )
    out = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(
            None, test_fraction=0.5, clusters=clusters
        ).collect()
    }
    assert out[1] == out[2]  # same cluster, same side


def test_leakage_safe_split_holdout_mass(spark):
    """The salted-digest draw lands the CLUSTER holdout fraction near
    test_fraction (binomial over clusters; wide tolerance, zero flake:
    seed-fixed ids make this deterministic)."""
    from ordinarydumpdeduplicator_spark.operators.sampling import (
        leakage_safe_split,
    )

    clusters = spark.createDataFrame(
        [(i, i) for i in range(2000)], "doc_id long, cluster_id long"
    )
    out = leakage_safe_split(None, test_fraction=0.2, clusters=clusters)
    n_test = out.where("split = 'test'").count()
    # E=400, sd=sqrt(2000*0.2*0.8)~17.9; +-6 sd
    assert 290 <= n_test <= 510, n_test
    # fraction parameter 0 -> nothing held out
    none_out = leakage_safe_split(None, test_fraction=0.0, clusters=clusters)
    assert none_out.where("split = 'test'").count() == 0


def test_near_dup_source_matrix_injected_clusters(spark):
    from pyspark.sql import functions as F

    from ordinarydumpdeduplicator_spark.operators.corpus_stats import (
        near_dup_source_matrix,
    )

    docs = spark.createDataFrame(
        [
            (1, "wa"), (2, "wa"), (3, "cc"),   # cluster 1 spans wa+cc
            (4, "cc"), (5, "wa"),              # cluster 4 spans cc+wa
            (6, "wa"), (7, "wa"),              # cluster 6: one source only
            (8, "xx"),                         # singleton
        ],
        "doc_id long, source string",
    ).withColumn("text", F.lit("t"))
    clusters = spark.createDataFrame(
        [(1, 1, 3), (2, 1, 3), (3, 1, 3), (4, 4, 2), (5, 4, 2),
         (6, 6, 2), (7, 6, 2), (8, 8, 1)],
        "doc_id long, cluster_id long, n_members long",
    )
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in near_dup_source_matrix(docs, clusters=clusters).collect()
    }
    # the single-source cluster 6 and singleton 8 contribute nothing
    assert set(rows) == {("cc", "wa")}
    r = rows[("cc", "wa")]
    # cluster 1: 2 wa x 1 cc -> 2 pairs; cluster 4: 1 cc x 1 wa -> 1
    assert (r["shared_clusters"], r["cross_pairs"]) == (2, 3)
