"""Versioned run/state model — the reference's Inspection/FileState story.

The reference mutates an object graph in place: each scan creates an
``Inspection`` (Common/Inspection.cs:7-29), each file gets a ``FileState``
per inspection with a ``previousState`` pointer chain
(Common/FileState.cs:7-16,67-70), and duplicate queries only consider
states of the LATEST inspection per data location
(DataControllerSimple.cs:190-208,255-258). Here the same semantics are
append-only DataFrames + window functions:

- O5  latest run per source     = row_number over (source_id, start_ts desc)
- P1  latest-state filter       = left_semi join states -> latest runs
- J6  previousState chain       = lag(...) over (image_id order by run order)
- CDC New/Unchanged/Modified/Removed — the statuses the reference declares
  (Common/FileStatus.cs:5-14) but only partially derives (SURVEY.md §2.11):
  derived here in full from consecutive state pairs.
- O17 "moved" detection         = same content key (size, sha) alive at a
  new location while the old row went removed
  (DuplicatesProcessor.cs:157-170 semantics, no pointer surgery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _liveness_rank() -> F.Column:
    """Deterministic tie-break for two states of the SAME (image, run):
    apply_actions emits a 'removed' row at the old location AND the live
    successor at the new one for an isolate commit. Within a run the
    removed row is the predecessor (rank 0), the live row the successor
    (rank 1) — without this, window ties on (start_ts, run_id) resolve
    nondeterministically and an isolated image could be derived 'removed'."""
    return F.when(F.col("status") == "removed", 0).otherwise(1)


def latest_runs(runs: DataFrame) -> DataFrame:
    """O5: arg-max start_ts per source_id (GetLastInspections,
    DataControllerSimple.cs:190-208). run_id breaks timestamp ties."""
    w = Window.partitionBy("source_id").orderBy(
        F.col("start_ts").desc(), F.col("run_id").desc()
    )
    return (
        runs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def latest_states(states: DataFrame, runs: DataFrame) -> DataFrame:
    """P1: keep only states of the latest run per source — a left-semi
    broadcast join against the tiny latest-runs dim (J1)."""
    lr = F.broadcast(latest_runs(runs).select("run_id"))
    return states.join(lr, "run_id", "left_semi")


def with_previous_state(states: DataFrame, runs: DataFrame) -> DataFrame:
    """J6: attach the previous state's (size, sha, location, status) via
    lag() over the per-image run history — the previousState pointer chain
    (Common/FileState.cs:67-70) as a window."""
    run_order = runs.select("run_id", "start_ts")
    w = Window.partitionBy("image_id").orderBy(
        "start_ts", "run_id", _liveness_rank()
    )
    return (
        states.join(F.broadcast(run_order), "run_id")
        .withColumn("prev_size", F.lag("size").over(w))
        .withColumn("prev_sha", F.lag("sha").over(w))
        .withColumn("prev_location", F.lag("location").over(w))
        .withColumn("prev_status", F.lag("status").over(w))
    )


def derive_status(states: DataFrame, runs: DataFrame) -> DataFrame:
    """CDC status per (image, run) from consecutive state pairs: completes
    the FileStatus enum (Common/FileStatus.cs:5-14) the reference only ever
    assigns partially (New/Unreadable/Error/Removed —
    OrdinaryDumpDeduplicator.cs:117,122,170,178).

    new        first sighting of the image_id
    unchanged  same content key as previous state
    modified   different content key
    (removed/unreadable/error pass through from ingest)"""
    df = with_previous_state(states, runs)
    derived = (
        F.when(F.col("status").isin("removed", "unreadable", "error"), F.col("status"))
        .when(F.col("prev_sha").isNull() & F.col("prev_size").isNull(), F.lit("new"))
        .when(
            (F.col("size") == F.col("prev_size"))
            & (F.col("sha") == F.col("prev_sha")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("modified"))
    )
    return df.withColumn("derived_status", derived)


def detect_moved(states: DataFrame, runs: DataFrame) -> DataFrame:
    """O17 semantics -> (image_id, size, sha, from_location, to_location),
    from the two signals a move leaves in the state history:

    1. intra-id: the SAME image's location changed between consecutive
       states with unchanged content (lag window — the previousState chain,
       Common/FileState.cs:67-70).
    2. cross-id: the content key appears LIVE under a new image id while
       another image's LATEST state with the same key is ``removed`` at the
       old location (content-key equi-join; skew-safe, near-unique keys).

    Content that still lives at its old location — an ordinary duplicate
    copy — is NOT reported as moved: the reference only marks the old
    state Removed on an actual move (DuplicatesProcessor.cs:157-170)."""
    prev = with_previous_state(states, runs)
    intra = (
        prev.filter(
            F.col("prev_location").isNotNull()
            & (F.col("location") != F.col("prev_location"))
            & (F.col("size") == F.col("prev_size"))
            & (F.col("sha") == F.col("prev_sha"))
            & ~F.col("status").isin("removed", "error", "unreadable")
        )
        .select(
            "image_id", "size", "sha",
            F.col("prev_location").alias("from_location"),
            F.col("location").alias("to_location"),
        )
    )
    run_order = runs.select("run_id", "start_ts")
    st = states.join(F.broadcast(run_order), "run_id")
    w = Window.partitionBy("image_id").orderBy(
        F.col("start_ts").desc(), F.col("run_id").desc(), _liveness_rank().desc()
    )
    latest = st.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    cur = latest.filter(
        ~F.col("status").isin("removed", "error", "unreadable")
    ).select("image_id", "size", "sha", "location", "start_ts")
    gone = latest.filter(F.col("status") == "removed").select(
        F.col("size").alias("p_size"),
        F.col("sha").alias("p_sha"),
        F.col("location").alias("from_location"),
        F.col("start_ts").alias("p_ts"),
    )
    cross = (
        cur.join(
            gone,
            (F.col("size") == F.col("p_size"))
            & (F.col("sha") == F.col("p_sha"))
            & (F.col("location") != F.col("from_location"))
            & (F.col("p_ts") <= F.col("start_ts")),
        )
        .select(
            "image_id", "size", "sha", "from_location",
            F.col("location").alias("to_location"),
        )
    )
    return intra.unionByName(cross).distinct()


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessionization: split each user's event stream into
    sessions wherever consecutive events are more than ``gap_minutes``
    apart, then roll each session up to (start, end, count, duration,
    value sum). The composite generalization of the J6 previousState
    chain (with_previous_state above): the same per-entity lag window,
    but the lag feeds a cumulative-sum session counter instead of a
    status compare.

    Scale shape: both window passes (lag + running sum) share one
    (user, ts, tiebreak) sort, so Catalyst plans a single Exchange +
    Sort reused by two Window nodes, and the final rollup groups on
    (user, session_seq) — a subset of the window partition key, so AQE
    can coalesce without a second wide shuffle. Event time is compared
    in integer microseconds (``timestamp_diff``, NTZ-native — the parquet
    column is TIMESTAMP_NTZ, which ``unix_micros`` rejects) — exact, no
    float drift — and the value sum is rounded to 2 decimals to stay
    hash-stable against the DuckDB oracle (same as pricing_summary)."""
    gap_us = int(gap_minutes) * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap = F.timestamp_diff("MICROSECOND", prev_ts, F.col(ts_col))
    flagged = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(order_tiebreak).alias("_tb"),
        F.col(value_col).alias("_value"),
        F.when(prev_ts.isNull() | (gap > gap_us), F.lit(1))
        .otherwise(F.lit(0))
        .alias("_new_session"),
    )
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = flagged.select(
        "user_id",
        "ts",
        "_value",
        F.sum("_new_session").over(wcum).alias("session_seq"),
    )
    start = F.min("ts")
    end = F.max("ts")
    return numbered.groupBy("user_id", "session_seq").agg(
        start.alias("session_start"),
        end.alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.timestamp_diff("MICROSECOND", start, end).alias("duration_us"),
        F.round(F.sum("_value"), 2).alias("sum_value"),
    )


def event_props_stats(
    events: DataFrame, props_col: str = "props", field: str = "k"
) -> DataFrame:
    """Semi-structured metadata rollup: parse the per-event JSON sidecar
    column with an EXPLICIT schema (`from_json` — JVM-side, inside
    whole-stage codegen; at 100 TB a schema-inferred parse would scan the
    data twice and a per-row Python json.loads would dominate the job)
    and aggregate the extracted field per event type in one
    hash-aggregate.

    No reference analogue — the reference carries no attribute payloads —
    but it is the metadata-sidecar shape every training-data pipeline
    has (per-record JSON provenance/config next to the payload columns).
    Missing/null fields count in ``n_events`` but not ``n_with_field``;
    sum/avg are exact (integer sum, one final division), so the DuckDB
    oracle (json_extract) is value-exact."""
    k = F.from_json(F.col(props_col), f"{field} INT")[field]
    return (
        events.select("event_type", k.alias("_k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("_k").alias("n_with_field"),
            F.sum("_k").cast("long").alias("sum_k"),
            F.min("_k").alias("min_k"),
            F.max("_k").alias("max_k"),
            (F.sum("_k").cast("double") / F.count("_k")).alias("avg_k"),
        )
    )
