"""Exact-substring span dedup (operators/substring_dedup.py) and
SemDeDup-style semantic dedup (operators/similarity.semantic_dedup)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import types as T

from ordinarydumpdeduplicator_spark.operators.similarity import semantic_dedup
from ordinarydumpdeduplicator_spark.operators.substring_dedup import (
    exact_substring_spans,
    substring_dup_stats,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, schema=DOC_SCHEMA)


def _expected_spans(rows, k, min_docs=2):
    """Pure-Python oracle: shared-k-gram hits, merged per doc."""
    toks = {d: [t for t in s.lower().split() if t] for d, s in rows}
    grams: dict[str, set[int]] = {}
    for d, ts in toks.items():
        for i in range(len(ts) - k + 1):
            grams.setdefault(" ".join(ts[i : i + k]), set()).add(d)
    dup = {g for g, ds in grams.items() if len(ds) >= min_docs}
    spans = set()
    for d, ts in toks.items():
        hits = [i for i in range(len(ts) - k + 1) if " ".join(ts[i : i + k]) in dup]
        cur = None
        for i in hits:
            if cur and i <= cur[1]:
                cur = (cur[0], max(cur[1], i + k))
            else:
                if cur:
                    spans.add((d, cur[0], cur[1], cur[1] - cur[0]))
                cur = (i, i + k)
        if cur:
            spans.add((d, cur[0], cur[1], cur[1] - cur[0]))
    return spans


def test_shared_run_found_and_merged(spark):
    # docs 1 & 2 share a 6-token run -> with k=4, three overlapping gram
    # hits per doc merge into ONE maximal span of 6 tokens
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, f"intro words {shared} tail one"),
        (2, f"{shared} completely different ending here"),
        (3, "nothing in common with anyone at all"),
    ]
    got = {
        tuple(r)
        for r in exact_substring_spans(_docs(spark, rows), k=4).collect()
    }
    assert got == {(1, 2, 8, 6), (2, 0, 6, 6)}
    assert got == _expected_spans(rows, k=4)


def test_two_islands_per_doc(spark):
    a = "one two three four"
    b = "five six seven eight"
    rows = [
        (1, f"{a} xxgap yygap zzgap {b}"),
        (2, f"{a} p q r s t u v {b}"),
    ]
    got = {
        tuple(r)
        for r in exact_substring_spans(_docs(spark, rows), k=4).collect()
    }
    # each doc: two disjoint 4-token islands
    assert got == _expected_spans(rows, k=4)
    assert len([g for g in got if g[0] == 1]) == 2


def test_spans_match_python_oracle_on_clumpy_corpus(spark):
    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> frequent collisions
    rows = []
    for d in range(60):
        n = int(rng.integers(3, 30))
        rows.append((d, " ".join(rng.choice(vocab, size=n))))
    for k in (3, 5):
        got = {
            tuple(r)
            for r in exact_substring_spans(_docs(spark, rows), k=k).collect()
        }
        assert got == _expected_spans(rows, k=k)


def test_dup_stats_cover_every_doc(spark):
    shared = "a b c d e f"
    rows = [
        (1, f"{shared} unique1 unique2"),
        (2, f"lead {shared}"),
        (3, "too short"),  # < k tokens
        (4, "long enough but fully unique text body here"),
    ]
    stats = {
        r["doc_id"]: r
        for r in substring_dup_stats(_docs(spark, rows), k=4).collect()
    }
    assert set(stats) == {1, 2, 3, 4}
    assert stats[1]["dup_tokens"] == 6 and stats[1]["n_spans"] == 1
    assert stats[2]["dup_tokens"] == 6
    assert stats[3]["dup_tokens"] == 0 and stats[3]["n_tokens"] == 2
    assert stats[4]["dup_tokens"] == 0 and stats[4]["n_spans"] == 0


def test_corpus_filter_policy(spark):
    from ordinarydumpdeduplicator_spark.operators.substring_dedup import (
        corpus_filter_decisions,
    )

    heavy = "a b c d e f g h i j"  # 10 tokens, fully duplicated vs doc 4
    rows = [
        (1, "Hello   World"),  # exact group rep (normalized == doc 2)
        (2, "hello world"),  # exact dup -> dropped
        (3, f"{heavy} unique tail"),  # 10/12 dup tokens > 1/2 -> dropped
        (4, f"{heavy} different ending that is long enough to stay under"
            " half duplicated tokens overall for sure"),
        (5, "completely unique and short"),  # keep
    ]
    out = {
        r["doc_id"]: r
        for r in corpus_filter_decisions(
            _docs(spark, rows), k=4
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1]["keep"] and not out[1]["is_exact_dup"]
    assert not out[2]["keep"] and out[2]["is_exact_dup"]
    assert out[2]["cluster_id"] == 1
    assert not out[3]["keep"] and not out[3]["is_exact_dup"]  # budget drop
    assert out[4]["keep"]  # same span, but under the 1/2 budget
    assert out[5]["keep"] and out[5]["dup_tokens"] == 0


def test_corpus_filter_keeper_of_exact_group_survives(spark):
    """Dedup-first: a long doc with exact copies must keep exactly ONE
    survivor — the group's own copies must not count toward the keeper's
    substring budget (they share every k-gram by construction)."""
    from ordinarydumpdeduplicator_spark.operators.substring_dedup import (
        corpus_filter_decisions,
    )

    long_text = " ".join(f"tok{i}" for i in range(20))
    rows = [
        (10, long_text),
        (11, long_text),  # exact copy
        (12, long_text.upper()),  # normalizes equal -> same group
        (13, "some other unique content here entirely"),
    ]
    out = {
        r["doc_id"]: r
        for r in corpus_filter_decisions(_docs(spark, rows), k=4).collect()
    }
    assert out[10]["keep"] and out[10]["dup_tokens"] == 0
    assert not out[11]["keep"] and out[11]["is_exact_dup"]
    assert not out[12]["keep"] and out[12]["cluster_id"] == 10
    assert out[13]["keep"]
    kept = [d for d, r in out.items() if r["keep"]]
    assert kept == [10, 13]


EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


@pytest.fixture(scope="module")
def clustered_embeddings(spark):
    """40 well-separated base directions, 5 vectors each: per base, copies
    0-2 are tiny perturbations (near-dups), 3-4 are decorrelated."""
    rng = np.random.default_rng(17)
    dim, rows = 32, []
    for g in range(40):
        base = rng.normal(size=dim)
        base /= np.linalg.norm(base)
        for j in range(5):
            if j < 3:
                v = base + rng.normal(scale=0.01, size=dim)
            else:
                v = base + rng.normal(scale=1.2, size=dim)
            rows.append((g * 5 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, schema=EMB_SCHEMA)
    df.cache().count()
    return df


def _greedy_expected(out_rows, vecs_by_id, tau):
    """Recompute keep/drop per cell with exact numpy cosine, using the
    operator's own cell assignment (centroid training is seeded but we
    don't re-derive it — the contract under test is the within-cell
    greedy rule)."""
    by_cell: dict[int, list[int]] = {}
    for r in out_rows:
        by_cell.setdefault(r["cell"], []).append(r["vec_id"])
    expected = {}
    for cell, ids in by_cell.items():
        for vid in ids:
            a = vecs_by_id[vid]
            keep = True
            for other in ids:
                if other >= vid:
                    continue
                b = vecs_by_id[other]
                cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
                if cos >= tau:
                    keep = False
                    break
            expected[vid] = keep
    return expected


def test_semantic_dedup_greedy_rule(spark, clustered_embeddings):
    tau = 0.95
    out = semantic_dedup(
        clustered_embeddings, threshold=tau, n_cells=16, sample_size=200
    ).collect()
    assert len(out) == clustered_embeddings.count()  # one row per vector
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in clustered_embeddings.collect()
    }
    expected = _greedy_expected(out, vecs, tau)
    got = {r["vec_id"]: r["is_kept"] for r in out}
    assert got == expected
    # the near-dup triples are tight (cos ~ 0.9999): whenever a triple
    # lands in one cell, only its min id survives
    dropped = {v for v, kept in got.items() if not kept}
    assert dropped, "perturbed copies should produce drops"


def test_semantic_dedup_threshold_above_one_keeps_all(spark, clustered_embeddings):
    out = semantic_dedup(
        clustered_embeddings, threshold=1.01, n_cells=16, sample_size=200
    ).collect()
    assert all(r["is_kept"] for r in out)


def test_trim_duplicate_spans(spark):
    from ordinarydumpdeduplicator_spark.operators.substring_dedup import (
        substring_dup_stats,
        trim_duplicate_spans,
    )

    rows = [
        (1, "shared header tokens one two three four five unique content alpha beta"),
        (2, "shared header tokens one two three four five different tail gamma delta"),
        (3, "totally original text with nothing repeated anywhere at all ok fine"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.asDict()
        for r in trim_duplicate_spans(df, k=4).collect()
    }
    assert got[1]["trimmed_text"] == "unique content alpha beta"
    assert got[2]["trimmed_text"] == "different tail gamma delta"
    assert got[3]["trimmed_text"].startswith("totally original")
    assert got[3]["n_kept_tokens"] == got[3]["n_tokens"] == 11
    assert got[4]["trimmed_text"] is None and got[4]["n_kept_tokens"] == 0
    # cross-operator invariant: tokens removed by the trim == the
    # duplication budget substring_dup_stats charges the document
    stats = {r.doc_id: r.asDict()
             for r in substring_dup_stats(df, k=4).collect()}
    for d in (1, 2, 3):
        assert (got[d]["n_tokens"] - got[d]["n_kept_tokens"]
                == stats[d]["dup_tokens"]), d
