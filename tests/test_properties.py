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
