"""Native session_window sessionization: batch parity + streaming emit."""

from __future__ import annotations

import datetime as dt
import os

from ordinarydumpdeduplicator_spark.operators.states import sessionize
from ordinarydumpdeduplicator_spark.streaming.sessions import (
    session_rollup,
    stream_user_sessions,
)

SCHEMA = "event_id long, ts timestamp_ntz, user_id long, value double"
T0 = dt.datetime(2026, 1, 1, 8, 0, 0)


def _rows(*offsets_minutes, user=1, v=1.0, start_id=1):
    return [
        (start_id + i, T0 + dt.timedelta(minutes=m), user, v)
        for i, m in enumerate(offsets_minutes)
    ]


def test_session_rollup_batch_parity(spark):
    """On a batch frame, session_window must produce the same session
    memberships as the batch lag-window sessionize (no exact-boundary
    gaps in the data — the two formulations differ only there)."""
    rows = (
        _rows(0, 5, 20, 65, 70, user=1)      # sessions: {0,5,20}, {65,70}
        + _rows(0, 45, 120, user=2, start_id=10)  # three singletons
    )
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r["user_id"], r["session_start"]): r
        for r in session_rollup(df, gap="30 minutes").collect()
    }
    batch = {
        (r["user_id"], r["session_start"]): r
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert set(got) == set(batch)
    for k, r in got.items():
        assert r["n_events"] == batch[k]["n_events"]
        assert abs(r["sum_value"] - batch[k]["sum_value"]) < 1e-9
        # close-out semantics: emitted end = last event + gap
        last_event_end = batch[k]["session_end"]
        assert r["session_end"] == last_event_end + dt.timedelta(minutes=30)


def test_stream_sessions_two_batches(spark, tmp_path):
    """Append mode emits a session only after a later batch advances the
    watermark past its close-out; the checkpoint carries watermark +
    open-session state across availableNow runs, exactly once."""
    ind = str(tmp_path / "in")
    outd = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(ind)

    def run_once():
        q = stream_user_sessions(
            spark, ind + "/*", outd, ckpt,
            gap="30 minutes", watermark="10 minutes",
        )
        q.awaitTermination(120)

    def emitted():
        try:
            return spark.read.parquet(outd).collect()
        except Exception:  # sink not created / no data files yet
            return []

    b0 = spark.createDataFrame(
        _rows(0, 10, user=1) + _rows(2, user=2, start_id=5), SCHEMA
    )
    b0.coalesce(1).write.parquet(ind + "/b0")
    run_once()
    # single batch: the watermark only advances AFTER it -> nothing closed
    emitted0 = len(emitted())

    # later batches carry far-future events; the advancing watermark closes
    # out batch-0 sessions (exact run count where the flush lands depends
    # on Spark's no-data-batch policy, so allow a couple of drains)
    got = []
    for i, future_min in enumerate((600, 1800, 3000)):
        b = spark.createDataFrame(
            _rows(future_min, user=1, start_id=20 + i), SCHEMA
        )
        b.coalesce(1).write.parquet(ind + f"/b{i + 1}")
        run_once()
        got = emitted()
        if len(got) >= 2:
            break
    rows = {(r["user_id"], r["session_start"]): r for r in got}
    assert (1, T0) in rows and rows[(1, T0)]["n_events"] == 2
    k2 = (2, T0 + dt.timedelta(minutes=2))
    assert k2 in rows and rows[k2]["n_events"] == 1
    # batch-0 sessions appear exactly once (no duplicates across drains)
    assert emitted0 == 0 and len(got) == len(rows)
