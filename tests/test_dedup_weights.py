"""soft_dedup_weights, cluster_representatives, source_quality_rollup.

The drop-free / keep-one / source-grained variants of exact dedup
(reference analogue: DataControllerSimple.cs hash grouping and the
per-directory duplicate report)."""

from __future__ import annotations

from collections import defaultdict

from ordinarydumpdeduplicator_spark.operators.text_analysis import (
    source_quality_rollup,
)
from ordinarydumpdeduplicator_spark.operators.text_dedup import (
    cluster_representatives,
    soft_dedup_weights,
)

DOCS = [
    # cluster A: 3 members, d2 has extra raw whitespace (longest raw text)
    (1, "the quick brown fox", "en", "web"),
    (2, "the   quick  brown   fox", "en", "web"),
    (3, "The Quick Brown FOX", "en", "cc"),
    # cluster B: singleton
    (4, "a unique document", "en", "cc"),
    # cluster C: 2 members, identical raw length -> tie broken by min id
    (5, "same same text", "de", "web"),
    (6, "same same text", "de", "web"),
    # null text
    (7, None, "de", "null_src"),
]


def _docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string"
    )


def test_soft_dedup_weights(spark):
    rows = {r["doc_id"]: r for r in soft_dedup_weights(_docs(spark)).collect()}
    # drop-free for every row with content; NULL text carries no weight
    assert len(rows) == 6 and 7 not in rows
    # per-cluster weights sum to exactly 1.0
    by_cluster = defaultdict(list)
    for r in rows.values():
        by_cluster[r["cluster_id"]].append(r)
    for cid, members in by_cluster.items():
        assert abs(sum(m["weight"] for m in members) - 1.0) < 1e-12
        canonical = [m for m in members if m["is_canonical"]]
        assert len(canonical) == 1
        assert canonical[0]["doc_id"] == cid == min(m["doc_id"] for m in members)
    assert rows[1]["n_members"] == 3 and rows[3]["cluster_id"] == 1
    assert rows[4]["n_members"] == 1 and rows[4]["weight"] == 1.0
    assert rows[5]["weight"] == 0.5


def test_cluster_representatives(spark):
    reps = {
        r["rep_doc_id"]: r
        for r in cluster_representatives(_docs(spark)).collect()
    }
    # cluster A: d2 has the longest RAW text (normalization collapsed ws)
    assert 2 in reps and reps[2]["n_members"] == 3
    assert reps[2]["rep_chars"] == len(DOCS[1][1])
    # singleton represents itself
    assert 4 in reps and reps[4]["n_members"] == 1
    # tie on raw length -> smallest doc_id wins
    assert 5 in reps and 6 not in reps
    # one representative per content cluster; NULL text has none
    assert len(reps) == 3 and 7 not in reps


def test_source_quality_rollup(spark):
    rows = {
        r["source"]: r
        for r in source_quality_rollup(
            _docs(spark), min_docs=2, max_dup_rate=0.4, min_avg_chars=5.0
        ).collect()
    }
    web = rows["web"]
    # web: docs 1,2,5,6 -> 4 docs, 2 distinct shas -> dup_rate 0.5 > 0.4
    assert web["n_docs"] == 4 and web["n_distinct_texts"] == 2
    assert abs(web["dup_rate"] - 0.5) < 1e-12 and not web["keep_source"]
    cc = rows["cc"]
    # cc: docs 3,4 -> 2 docs, 2 distinct -> dup_rate 0, avg_chars fine
    assert cc["n_docs"] == 2 and cc["dup_rate"] == 0.0 and cc["keep_source"]
    # null text source: sum_chars is NULL-sum -> None; keep verdict False/None-safe
    ns = rows["null_src"]
    assert ns["n_docs"] == 1 and not ns["keep_source"]


def test_dup_size_histogram(spark):
    from ordinarydumpdeduplicator_spark.operators.text_dedup import (
        dup_size_histogram,
    )

    rows = {
        r["n_members"]: r for r in dup_size_histogram(_docs(spark)).collect()
    }
    # clusters: A=3 members, B=1, C=2 (null text excluded entirely)
    assert rows[3]["n_clusters"] == 1 and rows[3]["n_docs"] == 3
    assert rows[1]["n_clusters"] == 1 and rows[1]["n_docs"] == 1
    assert rows[2]["n_clusters"] == 1 and rows[2]["n_docs"] == 2
    assert sum(r["n_docs"] for r in rows.values()) == 6


def test_near_dup_text_clusters_pinned_vs_union_find(spark):
    """Cluster assignment == union-find over the verified pair list, with
    numeric-min heads; singletons assigned to themselves."""
    from ordinarydumpdeduplicator_spark.operators.connected_components import (
        uf_components,
    )
    from ordinarydumpdeduplicator_spark.operators.text_dedup import (
        near_dup_text_clusters,
        near_dup_text_pairs,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .orderBy("doc_id")
        .limit(200)
        .cache()
    )
    pairs = [
        (r["doc_id_a"], r["doc_id_b"])
        for r in near_dup_text_pairs(docs).collect()
    ]
    assert pairs, "corpus subset should contain near-dups"
    comp = uf_components([(str(a), str(b)) for a, b in pairs])
    # remap string components to numeric-min heads
    members: dict[str, list[int]] = {}
    for node, c in comp.items():
        members.setdefault(c, []).append(int(node))
    expected = {}
    for mem in members.values():
        head = min(mem)
        for m in mem:
            expected[m] = (head, len(mem))
    got = {
        r["doc_id"]: r for r in near_dup_text_clusters(docs).collect()
    }
    all_ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    assert set(got) == set(all_ids)  # every doc assigned
    for d in all_ids:
        r = got[d]
        exp_head, exp_n = expected.get(d, (d, 1))
        assert (r["cluster_id"], r["n_members"]) == (exp_head, exp_n)
        assert r["is_canonical"] == (r["cluster_id"] == d)


def test_near_soft_dedup_weights_injected_clusters(spark):
    from ordinarydumpdeduplicator_spark.operators.text_dedup import (
        near_soft_dedup_weights,
    )

    clusters = spark.createDataFrame(
        [(1, 1, 3), (2, 1, 3), (3, 1, 3), (4, 4, 1)],
        "doc_id long, cluster_id long, n_members long",
    )
    out = {
        r["doc_id"]: r
        for r in near_soft_dedup_weights(
            _docs(spark), clusters=clusters
        ).collect()
    }
    assert len(out) == 4
    assert out[1]["weight"] == out[2]["weight"] == out[3]["weight"] == 1.0 / 3
    assert out[1]["is_canonical"] and not out[2]["is_canonical"]
    assert out[4]["weight"] == 1.0 and out[4]["is_canonical"]


def test_near_soft_dedup_weights_full_chain(spark):
    """Without injection the weights ride the fuzzy closure: weights sum
    to the number of clusters and every doc keeps a row (drop-free)."""
    from ordinarydumpdeduplicator_spark.operators.text_dedup import (
        near_dup_text_clusters,
        near_soft_dedup_weights,
    )

    docs = _docs(spark)
    out = near_soft_dedup_weights(docs).collect()
    assert len(out) == docs.count()  # NULL-text rows are self-singletons
    n_clusters = near_dup_text_clusters(docs).select(
        "cluster_id"
    ).distinct().count()
    assert abs(sum(r["weight"] for r in out) - n_clusters) < 1e-9


def test_top_reclaimable_clusters(spark):
    from ordinarydumpdeduplicator_spark.operators.text_dedup import (
        top_reclaimable_clusters,
    )

    docs = spark.createDataFrame(
        [
            # cluster 1: lengths 10, 7, 4 -> keep rep (10), reclaim 11
            (1, "a" * 10), (2, "b" * 7), (3, "c" * 4),
            # cluster 4: lengths 6, 6 -> tie, rep = min id 4, reclaim 6
            (4, "d" * 6), (5, "e" * 6),
            # singleton: excluded
            (6, "f" * 99),
        ],
        "doc_id long, text string",
    )
    clusters = spark.createDataFrame(
        [(1, 1, 3), (2, 1, 3), (3, 1, 3), (4, 4, 2), (5, 4, 2), (6, 6, 1)],
        "doc_id long, cluster_id long, n_members long",
    )
    rows = top_reclaimable_clusters(docs, clusters=clusters).collect()
    assert [r["cluster_id"] for r in rows] == [1, 4]  # reclaimable DESC
    r1, r4 = rows
    assert (r1["all_chars"], r1["rep_doc_id"], r1["rep_chars"],
            r1["reclaimable_chars"]) == (21, 1, 10, 11)
    assert (r4["rep_doc_id"], r4["reclaimable_chars"]) == (4, 6)
    # top-k limit honored
    assert len(top_reclaimable_clusters(docs, clusters=clusters, k=1).collect()) == 1


def test_top_reclaimable_rejects_string_ids(spark):
    """Non-numeric doc_id would silently NULL-out the max_by keeper
    ordering (decimal cast) — the operator must refuse eagerly instead."""
    import pytest

    from ordinarydumpdeduplicator_spark.operators.text_dedup import (
        top_reclaimable_clusters,
    )

    docs = spark.createDataFrame(
        [("a", "xxxx"), ("b", "yy")], "doc_id string, text string"
    )
    clusters = spark.createDataFrame(
        [("a", "a", 2), ("b", "a", 2)],
        "doc_id string, cluster_id string, n_members long",
    )
    with pytest.raises(ValueError, match="numeric"):
        top_reclaimable_clusters(docs, clusters=clusters)


def test_pair_score_histogram(spark):
    from ordinarydumpdeduplicator_spark.operators.text_dedup import (
        minhash_candidate_pairs,
        pair_score_histogram,
    )

    docs = _docs(spark)
    hist = pair_score_histogram(docs).collect()
    n_cands = minhash_candidate_pairs(docs).count()
    assert n_cands > 0
    # every candidate pair lands in exactly one bin
    assert sum(r["n_pairs"] for r in hist) == n_cands
    for r in hist:
        assert abs(r["jaccard_lo"] - r["bin"] * 0.05) < 1e-12
    # identical-text pair (docs 5/6) scores jaccard 1.0 -> the top bin
    # (IEEE rounds 1.0/0.05 to exactly 20.0 — same in Spark and DuckDB)
    assert max(r["bin"] for r in hist) == 20
