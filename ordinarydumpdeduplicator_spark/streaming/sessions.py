"""Streaming sessionization — Spark-native ``session_window``.

The streaming twin of the batch ``operators/states.sessionize``: instead
of the lag + running-sum window pair (which needs the whole history per
user), the built-in session window merges events into dynamic-gap
sessions INCREMENTALLY — state per (user, open session) only, closed and
emitted once the event-time watermark passes the session end. That is
exactly the reference's "latest inspection wins" lifecycle
(DataControllerSimple.cs:190-208) generalized to unbounded event streams.

Boundary semantics differ from the batch operator in two documented ways:
- ``session_window`` closes a session when the next event is >= gap away
  (the batch lag formulation splits only on STRICTLY greater), and
- the emitted window end is ``last event + gap``, not the last event's
  timestamp — so ``session_end`` here is the close-out time, and the
  batch operator's ``duration_us`` (last - first event) equals
  ``(session_end - session_start) - gap`` for multi-event sessions.

Scale shape: one stateful aggregation keyed by user — state store rows
are bounded by concurrently-open sessions, not history; the watermark
ages closed sessions out of the store. No Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def session_rollup(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Dynamic-gap session aggregation; same code path on batch frames
    (watermark is a no-op there) and on streams (append mode emits each
    session exactly once, when the watermark passes its end)."""
    win = F.session_window(F.col(ts_col), gap)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col).alias("user_id"), win.alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def stream_user_sessions(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_dir: str,
    schema=None,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    available_now: bool = True,
):
    """File-source stream -> watermarked session windows -> parquet append.

    Append mode: a session row lands in the sink only after a LATER
    micro-batch advances the watermark past its close-out — under
    ``availableNow`` each run drains pending files as one batch and emits
    the sessions prior batches closed (the checkpoint carries watermark +
    open-session state across runs, so nothing is lost or duplicated)."""
    if schema is None:
        schema = "event_id long, ts timestamp_ntz, user_id long, value double"
    stream = spark.readStream.schema(schema).parquet(input_path)
    # Streaming watermarks require TIMESTAMP (with tz); the events table
    # stores TIMESTAMP_NTZ. The cast interprets NTZ in the session
    # timezone, and collect() round-trips back to the same naive value.
    if dict(stream.dtypes).get("ts") == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    sessions = session_rollup(stream, gap=gap, watermark=watermark)
    writer = (
        sessions.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
