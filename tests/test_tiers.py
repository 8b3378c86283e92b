"""Tiered dedup cascade (operators/tiers.py) — semantic unit tests.

A hand-built corpus where every tier's verdict is known a priori:
precedence, keeper selection, and the stats rollup are asserted exactly.
The oracle-parity checks (Spark == DuckDB on the driver augmentation) live
in tests/test_oracle_parity.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ordinarydumpdeduplicator_spark.operators.tiers import (
    dedup_tier_stats,
    dedup_tiers,
)

# near-pair texts: >=3 tokens, high shingle overlap (3-gram Jaccard >= 0.5)
_BASE = "alpha beta gamma delta epsilon zeta eta theta"
_NEAR = "alpha beta gamma delta epsilon zeta eta iota"

_DOCS = [
    (1, _BASE),                       # keeper of everything below
    (2, _BASE),                       # raw-identical        -> exact
    (3, _BASE.upper()),               # case variant         -> normalized
    (4, _BASE.replace(" ", "  ")),    # whitespace variant   -> normalized
    (5, _NEAR),                       # fuzzy paraphrase     -> near (of 1)
    (6, "completely different words about unrelated things here"),  # unique
    (7, None),                        # empty
    (8, ""),                          # empty
    (9, "   "),                       # empty (whitespace only)
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_DOCS, "doc_id long, text string")


def test_tier_attribution(spark, docs):
    rows = {r.doc_id: (r.tier, r.keeper_id) for r in dedup_tiers(docs).collect()}
    assert rows == {
        1: ("unique", 1),
        2: ("exact", 1),
        3: ("normalized", 1),
        4: ("normalized", 1),
        5: ("near", 1),
        6: ("unique", 6),
        7: ("empty", 7),
        8: ("empty", 8),
        9: ("empty", 9),
    }


def test_tier_stats(spark, docs):
    rows = {r.tier: (r.n_docs, r.n_chars) for r in dedup_tier_stats(docs).collect()}
    base_len = len(_BASE)
    assert rows["exact"] == (1, base_len)
    assert rows["normalized"] == (2, base_len + len(_BASE.replace(" ", "  ")))
    assert rows["near"] == (1, len(_NEAR))
    assert rows["unique"][0] == 2
    # NULL text contributes no chars; ''/whitespace rows contribute length
    assert rows["empty"] == (3, 3)


def test_every_doc_exactly_once(spark, docs):
    out = dedup_tiers(docs)
    assert out.count() == len(_DOCS)
    assert out.select("doc_id").distinct().count() == len(_DOCS)


def test_keeper_is_never_above_doc(spark, docs):
    """Keepers are numeric-min group members, so keeper_id <= doc_id."""
    import pyspark.sql.functions as F

    assert dedup_tiers(docs).filter(F.col("keeper_id") > F.col("doc_id")).count() == 0


def test_precomputed_clusters_reuse(spark, docs):
    """Passing a materialized fuzzy assignment (the 100 TB reuse path)
    yields identical verdicts to recomputing the LSH chain in-plan."""
    from ordinarydumpdeduplicator_spark.operators.text_dedup import (
        near_dup_text_clusters,
    )

    pre = near_dup_text_clusters(docs).select("doc_id", "cluster_id")
    a = sorted(map(tuple, dedup_tiers(docs).collect()))
    b = sorted(map(tuple, dedup_tiers(docs, clusters=pre).collect()))
    assert a == b


_WORDS = ["red", "blue", "cat", "dog", "sun"]


def _norm_py(t: str) -> str:
    import re as _re

    return _re.sub(r"\s+", " ", t.lower()).strip()


@pytest.mark.slow
def test_cascade_matches_python_model(spark):
    """Property: against a pure-Python model of the precedence rules, with
    an arbitrary injected fuzzy assignment (covering only some docs — the
    operator must treat uncovered docs as singletons)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    text_st = st.one_of(
        st.none(),
        st.just(""),
        st.just("  "),
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=4).map(
            " ".join
        ),
        st.lists(st.sampled_from([w.upper() for w in _WORDS]), min_size=1,
                 max_size=4).map("  ".join),
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(texts=st.lists(text_st, min_size=1, max_size=12))
    def run(texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        # arbitrary-but-deterministic fake fuzzy clustering: group docs by
        # normalized token count, numeric-min heads, covering only docs
        # with >= 2 tokens
        by_len: dict[int, list[int]] = {}
        for i, t in rows:
            if t and len(t.split()) >= 2:
                by_len.setdefault(len(t.split()), []).append(i)
        fake = {i: min(g) for g in by_len.values() for i in g}
        # python model of the precedence cascade
        def grp_min(key_of):
            groups: dict[str, int] = {}
            for i, t in rows:
                if t is not None and t.strip() != "":
                    k = key_of(t)
                    groups[k] = min(groups.get(k, i), i)
            return groups

        ex = grp_min(lambda t: t)
        nm = grp_min(_norm_py)
        want = {}
        for i, t in rows:
            if t is None or t.strip() == "":
                want[i] = ("empty", i)
            elif i != ex[t]:
                want[i] = ("exact", ex[t])
            elif i != nm[_norm_py(t)]:
                want[i] = ("normalized", nm[_norm_py(t)])
            elif i in fake and i != fake[i]:
                want[i] = ("near", fake[i])
            else:
                want[i] = ("unique", i)

        docs = spark.createDataFrame(rows, "doc_id long, text string")
        clusters = spark.createDataFrame(
            [(i, c) for i, c in fake.items()] or [(None, None)],
            "doc_id long, cluster_id long",
        ).filter("doc_id is not null")
        got = {
            r.doc_id: (r.tier, r.keeper_id)
            for r in dedup_tiers(docs, clusters=clusters).collect()
        }
        assert got == want

    run()


def test_embedding_tier_attribution(spark):
    """Embedding cascade on a hand-built corpus: identical vectors ->
    exact; scaled (same-direction) vectors -> near; orthogonal -> unique;
    empty -> empty."""
    from ordinarydumpdeduplicator_spark.operators.tiers import (
        embedding_dedup_tiers,
    )

    d = 64
    base = [0.0] * d
    base[0] = 1.0
    scaled = [x * 2.0 for x in base]
    ortho = [0.0] * d
    ortho[1] = 1.0
    rows = [
        (1, base),
        (2, list(base)),   # identical           -> exact (keeper 1)
        (3, scaled),       # cosine 1, diff bytes -> near (keeper 1)
        (4, ortho),        # cosine 0            -> unique
        (5, []),           # empty
    ]
    docs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r.vec_id: (r.tier, r.keeper_id)
        for r in embedding_dedup_tiers(docs, dim=d).collect()
    }
    assert got == {
        1: ("unique", 1),
        2: ("exact", 1),
        3: ("near", 1),
        4: ("unique", 4),
        5: ("empty", 5),
    }


def test_image_tier_report_unknown_kind(spark):
    """An edge kind the precedence list doesn't know must rank below every
    known tier as 'other', not crash element_at with index 0."""
    from ordinarydumpdeduplicator_spark.operators.tiers import image_tier_report

    clusters = spark.createDataFrame(
        [("a", "a", True), ("b", "a", True)],
        "image_id string, cluster_id string, is_dup boolean",
    )
    edges = spark.createDataFrame(
        [("a", "b", "bogus_kind")], "src string, dst string, kind string"
    )
    rows = {r.image_id: r.tier for r in image_tier_report(clusters, edges).collect()}
    assert rows == {"a": "canonical", "b": "other"}


def test_no_sort_on_content_keys(spark, docs):
    """Same plan discipline as exact_text_groups: the sha groupings must be
    hash-aggregate + join, never a sort on the 64-hex key."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        dedup_tiers(docs).explain("simple")
    plan = buf.getvalue()
    for line in plan.splitlines():
        if "Sort " in line and ("raw_sha" in line or "norm_sha" in line):
            raise AssertionError(f"sort on content key: {line}")


def test_modality_agreement_hand_case(spark):
    from ordinarydumpdeduplicator_spark.operators.tiers import (
        modality_agreement,
        modality_agreement_stats,
    )

    clusters = spark.createDataFrame(
        [
            ("a", "a", True), ("b", "a", True),   # byte-identical pair
            ("c", "c", True), ("d", "c", True),   # image AND caption evidence
            ("e", "e", True), ("f", "e", True),   # image evidence only
            ("g", "g", True), ("h", "g", True),   # caption evidence only
            ("i", "i", False),                     # singleton
            ("j", "j", True), ("k", "j", True),   # unknown kind only
        ],
        "image_id string, cluster_id string, is_dup boolean",
    )
    edges = spark.createDataFrame(
        [
            ("a", "b", "exact"),
            ("c", "d", "image_near"), ("c", "d", "caption_near"),
            ("e", "f", "pixel_exact"),
            ("g", "h", "caption_exact"),
            ("j", "k", "future_kind"),
        ],
        "src string, dst string, kind string",
    )
    rows = {
        r.image_id: r.agreement
        for r in modality_agreement(clusters, edges).collect()
    }
    assert rows == {
        "a": "file", "b": "file",
        "c": "both", "d": "both",
        "e": "image_only", "f": "image_only",
        "g": "caption_only", "h": "caption_only",
        "i": "unique",
        "j": "other", "k": "other",
    }
    stats = {
        r.agreement: r.n_images
        for r in modality_agreement_stats(clusters, edges).collect()
    }
    assert stats == {
        "file": 2, "both": 2, "image_only": 2, "caption_only": 2,
        "unique": 1, "other": 2,
    }


def test_modality_agreement_mixed_known_unknown_and_file_precedence(spark):
    from ordinarydumpdeduplicator_spark.operators.tiers import (
        modality_agreement,
    )

    clusters = spark.createDataFrame(
        [("a", "a", True), ("b", "a", True)],
        "image_id string, cluster_id string, is_dup boolean",
    )
    # file evidence outranks both-modality evidence; unknown kinds are
    # ignored when any known family is present
    edges = spark.createDataFrame(
        [
            ("a", "b", "exact"),
            ("a", "b", "image_near"),
            ("a", "b", "caption_near"),
            ("a", "b", "mystery"),
        ],
        "src string, dst string, kind string",
    )
    out = {r.image_id: r for r in modality_agreement(clusters, edges).collect()}
    assert out["a"].agreement == "file"
    assert out["a"].has_image and out["a"].has_caption and out["a"].has_file


def test_tier_drift_hand_case(spark):
    from ordinarydumpdeduplicator_spark.operators.tiers import tier_drift

    prev = spark.createDataFrame(
        [(1, "unique"), (2, "unique"), (3, "exact"), (4, "near")],
        "doc_id long, tier string",
    )
    cur = spark.createDataFrame(
        # 1 demoted by a new copy, 2 unchanged, 3 removed, 5 arrived
        [(1, "exact"), (2, "unique"), (4, "near"), (5, "exact")],
        "doc_id long, tier string",
    )
    cells = {
        (r.tier_from, r.tier_to): r.n_docs
        for r in tier_drift(prev, cur).collect()
    }
    assert cells == {
        ("unique", "exact"): 1,
        ("unique", "unique"): 1,
        ("exact", "absent"): 1,
        ("near", "near"): 1,
        ("absent", "exact"): 1,
    }
    # the matrix accounts for every id in the union exactly once
    assert sum(cells.values()) == 5


def test_tier_drift_contract_invariants(spark):
    import __spark_entry__ as e

    rows = e.queries()["tier_drift"](spark, "/root/testdata/sf0.001").collect()
    cells = {(r.tier_from, r.tier_to): r.n_docs for r in rows}
    # the planted wave only ADDS documents: nothing becomes absent
    assert not any(to == "absent" for _, to in cells)
    # planted ids arrive (negative ids absent before)
    assert sum(n for (f, _), n in cells.items() if f == "absent") > 0
    # demotions happen: some previously-unique doc gained a copy
    assert any(
        f == "unique" and t in ("exact", "normalized") for f, t in cells
    )
    assert all(n > 0 for n in cells.values())


def test_embedding_band_sizing_enforced(spark):
    """20k+ vectors at the 4-bit oracle config would drop EVERY bucket
    (expected load 20000/16 >> cap) — the cascade must auto-widen the band
    keys so buckets stay bounded and planted near-pairs still surface
    (VERDICT r02 item 6: the sizing rule lives in code, not prose)."""
    import warnings as _warnings

    import numpy as np
    import pandas as pd

    from ordinarydumpdeduplicator_spark.operators.tiers import (
        embedding_dedup_tiers,
    )

    rng = np.random.default_rng(3)
    n = 20_000
    base = rng.normal(size=(n, 16)).astype("float32")
    rows = [(i, base[i].tolist()) for i in range(n)]
    # planted near-pairs: x2-scaled copies of every 500th vector (same
    # direction => cosine 1) under fresh ids ABOVE the originals
    planted = [
        (n + j, (base[j * 500] * 2.0).astype("float32").tolist())
        for j in range(40)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows + planted, columns=["vec_id", "embedding"])
    )
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        tiers = embedding_dedup_tiers(
            df, dim=16, threshold=0.95, bands=16, n_planes=64,
            bucket_cap=256,
        )
        got = {
            r.vec_id: (r.tier, r.keeper_id)
            for r in tiers.filter("vec_id >= 20000").collect()
        }
    assert any("widened band keys" in str(w.message) for w in caught)
    # every planted scaled copy must land in the near tier with its
    # original as keeper — a collapsed (all-dropped-buckets) sketch would
    # tier them 'unique'
    near = {v: k for v, (t, k) in got.items() if t == "near"}
    assert len(near) == 40, {v: t for v, (t, _) in got.items() if t != "near"}
    for j in range(40):
        assert near[20_000 + j] == j * 500


def test_embedding_dup_pairs_guard(spark):
    """The quadratic oracle baseline refuses production-sized input and
    points at the LSH path (VERDICT r02 item 3)."""
    import pytest as _pytest

    from ordinarydumpdeduplicator_spark.operators.similarity import (
        embedding_dup_pairs,
    )

    df = spark.range(0, 101).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    with _pytest.raises(ValueError, match="embedding_near_pairs_lsh"):
        embedding_dup_pairs(df, max_rows=100).count()
    # cap disabled -> runs (101 identical unit vectors => all pairs)
    assert embedding_dup_pairs(df, max_rows=0).count() == 101 * 100 // 2
