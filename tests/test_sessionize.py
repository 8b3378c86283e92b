"""Gap-based sessionization over the events table."""

from __future__ import annotations

import datetime as dt

from ordinarydumpdeduplicator_spark.operators.states import sessionize


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, value double"
    )


def test_sessionize_gap_split(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: 3 events within 30min, then a 31-min gap, then 1 more
        (1, t0, 1, 1.0),
        (2, t0 + dt.timedelta(minutes=10), 1, 2.0),
        (3, t0 + dt.timedelta(minutes=40), 1, 3.0),
        (4, t0 + dt.timedelta(minutes=71, seconds=1), 1, 4.0),
        # user 2: single event
        (5, t0, 2, 10.0),
        # tie timestamps: event_id breaks order deterministically
        (6, t0 + dt.timedelta(minutes=71, seconds=1), 1, 5.0),
    ]
    out = sessionize(_ev(spark, rows), gap_minutes=30).collect()
    by_key = {(r["user_id"], r["session_seq"]): r for r in out}
    assert len(by_key) == 3
    s1 = by_key[(1, 1)]
    assert s1["n_events"] == 3 and abs(s1["sum_value"] - 6.0) < 1e-9
    assert s1["duration_us"] == 40 * 60 * 1_000_000
    s2 = by_key[(1, 2)]  # events 4 and 6 share a timestamp
    assert s2["n_events"] == 2 and s2["duration_us"] == 0
    assert by_key[(2, 1)]["n_events"] == 1


def test_sessionize_exact_gap_boundary(spark):
    # a gap of EXACTLY 30 minutes does not split (strict >)
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, 1, 0.5), (2, t0 + dt.timedelta(minutes=30), 1, 0.5)]
    out = sessionize(_ev(spark, rows), gap_minutes=30).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2
