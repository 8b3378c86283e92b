"""Versioned run/state model tests — the Inspection/FileState semantics
(two-run fixture per FIXTURES.md §2)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from ordinarydumpdeduplicator_spark.operators.states import (
    derive_status,
    detect_moved,
    latest_runs,
    latest_states,
)

RUNS_DDL = "run_id string, source_id string, start_ts timestamp, finish_ts timestamp"
STATES_DDL = (
    "image_id string, run_id string, size bigint, sha string, "
    "status string, location string, sort string"
)


@pytest.fixture(scope="module")
def two_run(spark):
    """Run A then run B over the same source; B moves one image, removes
    one, modifies one, keeps one unchanged, adds one."""
    runs = spark.createDataFrame(
        [
            ("rA", "src", datetime(2026, 1, 1), datetime(2026, 1, 1, 1)),
            ("rB", "src", datetime(2026, 2, 1), datetime(2026, 2, 1, 1)),
            ("rX", "other", datetime(2026, 1, 15), datetime(2026, 1, 15, 1)),
        ],
        schema=RUNS_DDL,
    )
    states = spark.createDataFrame(
        [
            # run A
            ("i1", "rA", 10, "h1", "new", "loc/a", "original"),
            ("i2", "rA", 20, "h2", "new", "loc/a", "original"),
            ("i3", "rA", 30, "h3", "new", "loc/b", "original"),
            ("i4", "rA", 40, "h4", "new", "loc/b", "original"),
            # run B: i1 unchanged; i2 modified; i3 removed;
            # i4's content shows up as i4 at a NEW location (moved);
            # i5 brand new
            ("i1", "rB", 10, "h1", "new", "loc/a", "original"),
            ("i2", "rB", 21, "h2b", "new", "loc/a", "original"),
            ("i3", "rB", 30, "h3", "removed", "loc/b", "original"),
            ("i4", "rB", 40, "h4", "new", "loc/isolated", "isolated"),
            ("i5", "rB", 50, "h5", "new", "loc/c", "original"),
        ],
        schema=STATES_DDL,
    )
    return runs, states


def test_latest_runs_argmax(spark, two_run):
    runs, _ = two_run
    got = {r.source_id: r.run_id for r in latest_runs(runs).collect()}
    assert got == {"src": "rB", "other": "rX"}


def test_latest_states_semi_join(spark, two_run):
    runs, states = two_run
    got = latest_states(states, runs)
    assert {r.run_id for r in got.collect()} == {"rB"}
    assert got.count() == 5


def test_derive_status_cdc(spark, two_run):
    runs, states = two_run
    got = {
        (r.image_id, r.run_id): r.derived_status
        for r in derive_status(states, runs).collect()
    }
    # run A: everything is a first sighting
    assert got[("i1", "rA")] == "new"
    assert got[("i4", "rA")] == "new"
    # run B: full FileStatus derivation (Common/FileStatus.cs:5-14)
    assert got[("i1", "rB")] == "unchanged"
    assert got[("i2", "rB")] == "modified"
    assert got[("i3", "rB")] == "removed"  # passthrough
    assert got[("i4", "rB")] == "unchanged"  # same content, new location
    assert got[("i5", "rB")] == "new"


def test_detect_moved(spark, two_run):
    runs, states = two_run
    got = detect_moved(states, runs).collect()
    moved = {(r.image_id, r.from_location, r.to_location) for r in got}
    assert moved == {("i4", "loc/b", "loc/isolated")}


def test_moved_ignores_unchanged_location(spark, two_run):
    runs, states = two_run
    ids = {r.image_id for r in detect_moved(states, runs).collect()}
    assert "i1" not in ids and "i2" not in ids


def test_removed_not_marked_moved_to_self(spark, two_run):
    """i3 is removed (same location) — not a move."""
    runs, states = two_run
    ids = {r.image_id for r in detect_moved(states, runs).collect()}
    assert "i3" not in ids

def test_copy_with_live_original_is_not_moved(spark):
    """A duplicate COPY whose original stays live must not be reported as
    moved (the reference marks old states Removed only on actual moves)."""
    runs = spark.createDataFrame(
        [
            ("rA", "src", datetime(2026, 1, 1), datetime(2026, 1, 1, 1)),
            ("rB", "src", datetime(2026, 2, 1), datetime(2026, 2, 1, 1)),
        ],
        schema=RUNS_DDL,
    )
    states = spark.createDataFrame(
        [
            # same content at two locations, both alive in the latest run
            ("c1", "rA", 10, "hx", "new", "loc/a", "original"),
            ("c1", "rB", 10, "hx", "unchanged", "loc/a", "original"),
            ("c2", "rB", 10, "hx", "new", "loc/b", "original"),
        ],
        schema=STATES_DDL,
    )
    assert detect_moved(states, runs).count() == 0


def test_event_props_stats(spark):
    from ordinarydumpdeduplicator_spark.operators.states import (
        event_props_stats,
    )

    events = spark.createDataFrame(
        [
            ("click", '{"k": 10}'),
            ("click", '{"k": 4}'),
            ("click", None),            # null sidecar
            ("view", '{"other": 1}'),   # field absent
            ("view", "not json"),       # malformed -> null, no crash
            ("view", '{"k": 7}'),
        ],
        "event_type string, props string",
    )
    rows = {r["event_type"]: r for r in event_props_stats(events).collect()}
    c, v = rows["click"], rows["view"]
    assert (c["n_events"], c["n_with_field"], c["sum_k"]) == (3, 2, 14)
    assert (c["min_k"], c["max_k"], c["avg_k"]) == (4, 10, 7.0)
    assert (v["n_events"], v["n_with_field"], v["sum_k"]) == (3, 1, 7)
    assert v["avg_k"] == 7.0
