"""Event-stream analytics (batch form of the streaming patterns).

Tumbling-window aggregation and gap-based sessionization over the
``events`` table.  Written as plain Column algebra so the DuckDB oracle
computes identical results; in streaming mode the same logic maps to
``window()`` + watermark / ``session_window()``.

Scale: both operators shuffle once on (user_id) / (window, type) — keys
are high-cardinality and uniform here; for skewed user histories the
sessionize shuffle is the salting point (per-user sequential scan is
irreducible for gap sessionization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1h windows x event_type (streaming-equivalent rollup)."""
    return (
        events
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"),
                 "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 2).alias("total_value"),
             F.countDistinct("user_id").alias("users"))
        .orderBy("hour", "event_type")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user; one row per session.

    session starts where the gap to the previous event exceeds
    ``gap_minutes``; session id = cumulative count of starts.
    """
    w = Window.partitionBy("user_id").orderBy("ts")
    # TIMESTAMP_NTZ needs the two-step cast; any session-tz offset is a
    # constant that cancels in gaps and durations
    tl = F.col("ts").cast("timestamp").cast("long")
    gap = tl - F.lag(tl).over(w)
    with_start = events.withColumn("tl", tl).withColumn(
        "is_start",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0))
    with_sid = with_start.withColumn(
        "session_seq", F.sum("is_start").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        with_sid
        .groupBy("user_id", "session_seq")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.min("ts").alias("started_at"),
             (F.max("tl") - F.min("tl")).alias("duration_secs"),
             F.round(F.sum("value"), 2).alias("session_value"))
        .orderBy("user_id", "session_seq")
    )


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Corpus-level session distribution (count, avg length, max)."""
    s = sessionize(events, gap_minutes)
    return s.agg(
        F.count(F.lit(1)).alias("sessions"),
        F.countDistinct("user_id").alias("users"),
        F.round(F.avg("n_events"), 3).alias("avg_events_per_session"),
        F.max("duration_secs").alias("max_duration_secs"),
    )
