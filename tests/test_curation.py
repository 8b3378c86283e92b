"""Tests for plans/curation.py — the quality -> exact dedup ->
decontamination -> mixture funnel."""

from __future__ import annotations

from pyspark.sql import functions as F

from ordinarydumpdeduplicator_spark.plans.curation import (
    FUNNEL_STAGES,
    curation_attribution,
    curation_funnel,
)

GOOD = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lamda mu nu xi omicron pi rho sigma tau upsilon"
)  # 20 tokens, mean length in [3, 10]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_funnel_hand_example(spark):
    eval_docs = _df(spark, [(100, "mark one mark two mark three", "en")])
    docs = _df(
        spark,
        [
            (1, GOOD, "en"),  # survives everything
            (2, "too short", "en"),  # quality drop (2 tokens)
            (3, GOOD, "en"),  # exact dup of 1 -> dropped (keeper=1)
            # contaminated: contains the eval 4-gram "mark one mark two"
            (4, GOOD + " mark one mark two", "en"),
            (5, None, "en"),  # NULL text -> quality drop
        ],
    )
    # single-stratum target at 1.0: binding stratum kept whole, so the
    # mixture stage drops nothing and the funnel is fully hand-checkable
    out = {
        r.stage: r
        for r in curation_funnel(docs, eval_docs, {"en": 1.0}).collect()
    }
    assert [out[s].stage_idx for s in FUNNEL_STAGES] == [1, 2, 3, 4]
    assert (out["quality"].docs_in, out["quality"].docs_out) == (5, 3)
    assert (out["exact_dedup"].docs_in, out["exact_dedup"].docs_out) == (3, 2)
    assert out["decontamination"].docs_out == 1
    assert (out["mixture"].docs_in, out["mixture"].docs_out) == (1, 1)
    assert out["mixture"].chars_out == len(GOOD)
    att = {
        r.doc_id: r.survived
        for r in curation_attribution(docs, eval_docs, {"en": 1.0}).collect()
    }
    assert att == {1: 4, 2: 0, 3: 1, 4: 2, 5: 0}


def test_funnel_chain_invariants(spark):
    import __spark_entry__ as e

    rows = sorted(
        e.queries()["curation_funnel"](spark, "/root/testdata/sf0.001")
        .collect(),
        key=lambda r: r.stage_idx,
    )
    assert [r.stage for r in rows] == FUNNEL_STAGES
    for prev, cur in zip(rows, rows[1:]):
        assert cur.docs_in == prev.docs_out
        assert cur.chars_out <= prev.chars_out
    for r in rows:
        assert r.docs_dropped == r.docs_in - r.docs_out >= 0
    # every stage fires at driver scale (planted variants guarantee it)
    assert all(r.docs_dropped > 0 for r in rows), rows


def test_funnel_empty_corpus(spark):
    eval_docs = _df(spark, [(1, GOOD, "en")])
    out = curation_funnel(
        _df(spark, []).limit(0), eval_docs, {"en": 1.0}
    ).collect()
    assert len(out) == 4
    assert all(
        (r.docs_in, r.docs_out, r.docs_dropped, r.chars_out)
        == (0, 0, 0, 0)
        for r in out
    )


def test_funnel_keeper_is_min_id_and_stratum_outside_targets_drops(spark):
    eval_docs = _df(spark, [(100, "mark one mark two mark three", "en")])
    docs = _df(
        spark,
        [
            (7, GOOD, "en"),
            (3, GOOD, "en"),  # min id -> keeper
            (9, GOOD + " unique tail", "zh"),  # zh outside targets
        ],
    )
    att = {
        r.doc_id: r.survived
        for r in curation_attribution(docs, eval_docs, {"en": 1.0}).collect()
    }
    assert att[3] == 4  # keeper survives
    assert att[7] == 1  # non-keeper dropped at exact stage
    assert att[9] == 3  # no target share -> dropped at mixture
