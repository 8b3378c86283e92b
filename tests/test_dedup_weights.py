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
