"""The synthetic media-fingerprint corpus (operators/segment_synth.py)
and its DuckDB mirror (oracles.segment_fps_ctes): the injectable frame
that puts the segment dedup chain behind the driver's value-exact gate.

Pins (a) the generator bit-for-bit against the SQL mirror on driver
testdata, (b) that the planted families exercise EVERY tier and both
novelty verdicts — a gate over a corpus that only ever hits one branch
tests nothing."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    return con


def test_fps_frame_matches_sql_mirror(spark, duck):
    from ordinarydumpdeduplicator_spark.operators.segment_synth import (
        synthetic_segment_fingerprints,
    )
    from ordinarydumpdeduplicator_spark.oracles import segment_fps_ctes

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {
        r["media_id"]: (r["status"], r["file_sha"], r["seg_hashes"])
        for r in synthetic_segment_fingerprints(docs).collect()
    }
    want = {
        mid: (status, sha, hashes)
        for mid, status, sha, hashes in duck.sql(
            f"WITH {segment_fps_ctes()} "
            "SELECT media_id, status, sha256(payload_key), seg_hashes "
            "FROM seg_fps"
        ).fetchall()
    }
    assert set(got) == set(want)
    for mid in got:
        s_st, s_sha, s_h = got[mid]
        d_st, d_sha, d_h = want[mid]
        assert (s_st, s_sha) == (d_st, d_sha), mid
        assert (s_h is None) == (d_h is None), mid
        if s_h is not None:
            assert list(s_h) == list(d_h), mid


def test_planted_families_cover_every_branch(spark):
    """Tier attribution over the synthetic frame must produce all five
    tiers, novelty both verdicts, and the cross-modal probe both exact
    and Hamming-1 matches — i.e. the planted structure is non-trivial
    for every contract entry built on it."""
    import __spark_entry__ as e

    q = e.queries()
    tiers = {
        r["tier"]
        for r in q["segment_clusters"](spark, SF_DIR)
        .select("tier")
        .distinct()
        .collect()
    }
    assert tiers == {"canonical", "exact", "seg_exact", "seg_near",
                     "unique"}

    nov = {
        r["is_novel"]
        for r in q["segment_novelty"](spark, SF_DIR)
        .select("is_novel")
        .distinct()
        .collect()
    }
    assert nov == {True, False}

    ham = {
        r["hamming"]
        for r in q["frames_matching_images"](spark, SF_DIR)
        .select("hamming")
        .distinct()
        .collect()
    }
    assert ham == {0, 1}


def test_broken_rows_pair_by_bytes_only(spark):
    """Broken (NULL-hash) rows must still dedup byte-exactly via the
    shared payload key — the reference's unparseable-content rule — and
    must never appear with a seg_* tier."""
    import __spark_entry__ as e

    from ordinarydumpdeduplicator_spark.operators.segment_synth import (
        synthetic_segment_fingerprints,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    fps = synthetic_segment_fingerprints(docs)
    broken_ids = {
        r["media_id"]
        for r in fps.filter(F.col("status") == "broken").collect()
    }
    assert broken_ids, "corpus too small to plant broken rows"
    out = {
        r["media_id"]: r["tier"]
        for r in e.queries()["segment_clusters"](spark, SF_DIR).collect()
    }
    assert {out[i] for i in broken_ids} <= {"exact", "canonical",
                                            "unique"}
    # at least one broken pair actually groups
    assert any(out[i] in ("exact", "canonical") for i in broken_ids)


def test_media_pair_recall_is_one_on_planted_families(spark):
    """The VERDICT r04 item-4 gate: the segment chain recalls EVERY
    planted duplicate pair (family members, byte-identical broken
    payloads) through the first-class dedup_pair_metrics operator —
    pair_recall == 1.0 exactly, with the star-golden counts consistent
    (n_hit == n_golden > 0)."""
    import __spark_entry__ as e

    [r] = e.queries()["segment_pair_metrics"](spark, SF_DIR).collect()
    assert r["n_golden"] > 0
    assert r["n_hit"] == r["n_golden"]
    assert r["pair_recall"] == 1.0
    # precision reflects the star-shaped label set vs the clique-fold
    # prediction count, not a correctness defect: a 4-member family
    # predicts C(4,2)=6 pairs against 3 golden star pairs
    assert 0 < r["pair_precision"] <= 1.0
