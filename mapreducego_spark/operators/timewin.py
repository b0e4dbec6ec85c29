"""Event-time windows over the ``events`` table, batch form.

These are the batch-mode equivalents of the Structured Streaming
tier (streaming/pipelines.py runs the same logic with watermarks);
batch form first so DuckDB can oracle-check the semantics
(SURVEY.md §7 step 3).

Timestamp hygiene: events.ts is nanosecond parquet; Spark truncates
to microseconds, DuckDB keeps ns — so every output surfaces window
bounds as epoch SECONDS (bigint), which both engines agree on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducego_spark.operators.util import davg, dec, dsum
from mapreducego_spark.sources.catalog import load_table


def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows: count + exact sum per (window, type).
    F.window() assigns each event to exactly one bucket; partial
    aggregation makes this a single small shuffle at any scale."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(dec("value", 18, 6), "sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 min — each event lands in 2
    overlapping windows (F.window duplicates rows per window; the
    oracle reproduces this with an explicit 2-offset union)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            davg(dec("value", 18, 6), "avg_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("win_start"),
            "n_events",
            "avg_value",
        )
    )


def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user with a 30-minute inactivity gap.

    Uses F.session_window (merging-window aggregation). Spark defines
    a session's end as last_event_ts + gap; we surface
    (user_id, session_start, n_events, session_seconds) with
    session_seconds = last-first event gap so the oracle (a
    gaps-and-islands window construction) matches exactly.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"),
            F.col("user_id").cast("long").alias("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            "user_id",
            F.unix_timestamp("first_ts").cast("long").alias("session_start"),
            "n_events",
            (F.unix_timestamp("last_ts") - F.unix_timestamp("first_ts"))
            .cast("long")
            .alias("session_seconds"),
        )
    )


def dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful-dedup batch equivalent: one row per event_id (first
    by timestamp), then a per-type count — the batch twin of
    dropDuplicatesWithinWatermark in the streaming tier."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_id").orderBy(F.col("ts").asc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique_events"))
        .orderBy("event_type")
    )
