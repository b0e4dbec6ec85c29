"""Structured Streaming tier.

The reference is batch-only (no streaming code exists anywhere in
/root/reference — SURVEY.md §2.B); this tier is north-star scope:
the same event-time window semantics as operators/timewin.py, run
incrementally with watermarks, late-data handling, stateful dedup,
and a custom stateful operator via applyInPandasWithState.

Design for scale: every pipeline here is a pure function from a
streaming DataFrame to a streaming DataFrame — source and sink are
injected, so the same logic runs against Kafka/file/rate sources
and is unit-tested with trigger(availableNow) + memory sink against
the batch twins (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Schema of the events table as the file-stream source sees it
# (ts arrives as nanosecond LONG under nanosAsLong; converted below).
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (the batch fixture
    replayed as a stream). One file = one micro-batch under
    availableNow; a production deployment swaps this for Kafka with
    the same downstream pipelines.

    FileStreamSource requires a *directory* to monitor; the fixture is
    a single .parquet file, so stage a hardlink/copy into a temp dir
    (cheap, read-only fixture stays untouched).
    """
    import os
    import shutil
    import tempfile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stage = tempfile.mkdtemp(prefix="events_stream_")
    src = os.path.join(sf_dir, "events.parquet")
    dst = os.path.join(stage, "events.parquet")
    try:
        os.link(src, dst)
    except OSError:
        shutil.copyfile(src, dst)
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .format("parquet")
        .load(stage)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def tumbling_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of timewin.window_tumbling: 1-hour tumbling
    count+sum per event type, late data beyond the watermark dropped.
    State size is bounded by (|windows within watermark| x |types|)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_avg(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of timewin.window_sliding."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("win_start"),
            "n_events",
            "avg_value",
        )
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Streaming session windows (merging state) per user."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("sw.start")).cast("long").alias("session_start"),
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful dedup on event_id within the watermark horizon —
    the streaming form of timewin.dedup_events. State is purged as
    the watermark advances (bounded memory at any throughput)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_memory(
    stream: DataFrame, spark: SparkSession, name: str = "mem_out"
) -> DataFrame:
    """Execute a streaming DataFrame to completion with
    trigger(availableNow) into a memory sink; returns the batch
    result table. Test/demo harness — production uses parquet/Kafka
    sinks with checkpointing."""
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(_output_mode(stream))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def _output_mode(df: DataFrame) -> str:
    # Pick the sink output mode the plan requires: stateful
    # flatMapGroupsWithState(update) demands "update"; aggregated
    # streams need "complete" in a memory sink; plain pipelines append.
    plan = df._jdf.queryExecution().analyzed().toString()
    if "FlatMapGroupsInPandasWithState" in plan:
        return "update"
    if "Aggregate" in plan:
        return "complete"
    return "append"


# --- custom stateful operator: per-user running counters ---------------


def user_running_stats(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user cumulative event count and value sum, emitted on every
    update — the stateful-operator escape hatch for semantics the
    built-in windows can't express (reference analog: the generic
    Reduce contract, mpWorker/worker.go:22).

    State: one (count, sum) pair per user_id; GroupStateTimeout is
    off because the fixture is finite — a production deployment sets
    EventTimeTimeout to bound state.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("sum_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("cnt", LongType()), StructField("total", DoubleType())]
    )

    def update(key, pdfs, state: GroupState):
        cnt, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf["value"].sum())
        state.update((cnt, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [cnt], "sum_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
