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


# --------------------------------------------------------- session-5 ops

_LINE_KEEP = "alpha beta gamma delta works fine."      # 6 words, punct
_LINE_SHORT = "too short."                              # 2 words
_LINE_NOPUNCT = "five words but no punctuation here"    # no terminal
_LINE_BAD = "enable javascript to view this page."      # bad phrase


@given(
    st.lists(
        st.sampled_from([_LINE_KEEP, _LINE_SHORT, _LINE_NOPUNCT, _LINE_BAD]),
        min_size=0,
        max_size=8,
    )
)
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_c4_kept_count_matches_construction(spark, lines):
    from ordinarydumpdeduplicator_spark.operators.line_dedup import (
        c4_line_filter,
    )

    text = "\n".join(lines) if lines else ""
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = c4_line_filter(docs).collect()[0]
    expect_kept = sum(1 for x in lines if x == _LINE_KEEP)
    # split("") yields one empty line; the empty doc still has n_lines=1
    assert row.n_lines == max(1, len(lines))
    assert row.n_kept == expect_kept
    assert row.doc_keep == (expect_kept >= 1)
    if row.doc_keep:
        assert row.clean_text == "\n".join(
            x for x in lines if x == _LINE_KEEP
        )


@given(st.integers(0, 2**31 - 1))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_dsir_weights_partition_invariant(spark, seed):
    """DSIR weights are a set-level fact: repartitioning / reordering the
    input must not change any document's weight (the float-sum rounding
    policy absorbs order-of-summation ulps)."""
    import random as _random

    from pyspark.sql import functions as F

    from ordinarydumpdeduplicator_spark.operators.sampling import (
        dsir_importance_weights,
    )

    rng = _random.Random(seed)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    rows = [
        (
            i,
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))),
            rng.choice(["en", "de"]),
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).withColumn("source", F.lit("s"))
    t = F.col("lang") == "en"
    base = {
        r.doc_id: (r.n_ngrams, r.dsir_logweight, r.dsir_score)
        for r in dsir_importance_weights(df, t).collect()
    }
    shuffled = {
        r.doc_id: (r.n_ngrams, r.dsir_logweight, r.dsir_score)
        for r in dsir_importance_weights(
            df.repartition(7, "doc_id").sortWithinPartitions(
                F.col("doc_id").desc()
            ),
            t,
        ).collect()
    }
    # the round-to-4dp policy absorbs order-of-summation ulps EXCEPT when
    # a sum lands within half an ulp of a .00005 boundary and the two
    # orderings round to adjacent grid points — so equality is asserted
    # at one 4dp grid step, not bitwise (ADVICE r02)
    assert base.keys() == shuffled.keys()
    for k in base:
        bn, blw, bsc = base[k]
        sn, slw, ssc = shuffled[k]
        assert bn == sn
        assert abs(blw - slw) <= 1.0001e-4, (k, blw, slw)
        assert abs(bsc - ssc) <= 1.0001e-4, (k, bsc, ssc)


# ---- segment-core invariants (shared by video/audio/region dedup) ----

hash64 = st.integers(-(2**63), 2**63 - 1)


@settings(max_examples=100, deadline=None)
@given(a=hash64, b=hash64, bands=st.sampled_from([2, 4, 8, 16]))
def test_band_slices_pigeonhole(a, b, bands):
    """Hamming(a,b) < bands implies the two hashes share at least one of
    the `bands` disjoint bit slices (candidate recall guarantee); and
    slices are a partition of the 64 bits (identical hashes share all)."""
    width = 64 // bands
    mask = (1 << width) - 1
    sa = [(a >> (i * width)) & mask for i in range(bands)]
    sb = [(b >> (i * width)) & mask for i in range(bands)]
    ham = bin((a ^ b) & (2**64 - 1)).count("1")
    shared = sum(1 for x, y in zip(sa, sb) if x == y)
    if ham < bands:
        assert shared >= 1
    if a == b:
        assert shared == bands


@settings(**SPARK_SETTINGS)
@given(
    ha=st.lists(hash64, min_size=1, max_size=6),
    hb=st.lists(hash64, min_size=1, max_size=6),
    r=st.sampled_from([0, 3, 6]),
)
def test_match_frac_symmetric_bounded(spark, ha, hb, r):
    """match_frac_expr is symmetric, in [0, 1], and exactly 1.0 for an
    identical hash multiset."""
    from pyspark.sql import functions as F

    from ordinarydumpdeduplicator_spark.operators.segment_dedup import (
        match_frac_expr,
    )

    df = spark.createDataFrame(
        [(ha, hb)], "ha array<long>, hb array<long>"
    ).select(
        match_frac_expr("ha", "hb", r).alias("ab"),
        match_frac_expr("hb", "ha", r).alias("ba"),
        match_frac_expr("ha", "ha", r).alias("aa"),
    )
    row = df.collect()[0]
    assert abs(row["ab"] - row["ba"]) < 1e-12
    assert 0.0 <= row["ab"] <= 1.0
    assert row["aa"] == 1.0


def test_band_slices_expression_matches_math(spark):
    """The Spark band_slices expression (shiftrightunsigned + AND)
    produces exactly the Python slice math the pigeonhole property tests,
    including for negative int64 hashes."""
    from pyspark.sql import functions as F

    from ordinarydumpdeduplicator_spark.operators.segment_dedup import (
        band_slices,
    )

    vals = [0, 1, -1, 2**63 - 1, -(2**63), 0x1234_5678_9ABC_DEF0]
    bands = 4
    width = 64 // bands
    mask = (1 << width) - 1
    df = spark.createDataFrame([(v,) for v in vals], "h long").select(
        "h", band_slices(F.col("h"), bands).alias("s")
    )
    for row in df.collect():
        got = {(e["band"], e["key"]) for e in row["s"]}
        want = {
            (i, ((row["h"] & (2**64 - 1)) >> (i * width)) & mask)
            for i in range(bands)
        }
        assert got == want
