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


def _set_mode(df: DataFrame, mode: str) -> DataFrame:
    """Tag a streaming DataFrame with the sink output mode its plan
    requires. Explicit declaration by each pipeline replaces the old
    private-API plan probe (df._jdf string matching), which broke
    under Spark Connect and across plan-name changes."""
    df._mrg_output_mode = mode
    return df


def events_stream(
    spark: SparkSession, sf_dir: str, stage_dir: str | None = None
) -> DataFrame:
    """File-source stream over the events parquet (the batch fixture
    replayed as a stream). One file = one micro-batch under
    availableNow; a production deployment swaps this for Kafka with
    the same downstream pipelines.

    FileStreamSource requires a *directory* to monitor; the fixture is
    a single .parquet file, so stage a hardlink/copy into a temp dir
    (cheap, read-only fixture stays untouched; removed at interpreter
    exit via atexit). nanosAsLong must be session-wide — parquet nanos
    handling is an SQLConf, not a reader option — and only affects
    reads that would otherwise fail outright (session.get_spark sets
    it up front; this set covers driver-owned sessions).

    ``stage_dir``: pass a stable directory when the stream runs
    against a checkpoint — restart recovery requires the SAME source
    path across runs (a fresh temp dir per call would invalidate the
    checkpoint's recorded offsets).
    """
    import atexit
    import os
    import shutil
    import tempfile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if stage_dir is None:
        stage = tempfile.mkdtemp(prefix="events_stream_")
        atexit.register(shutil.rmtree, stage, ignore_errors=True)
    else:
        stage = stage_dir
        os.makedirs(stage, exist_ok=True)
    src = os.path.join(sf_dir, "events.parquet")
    dst = os.path.join(stage, "events.parquet")
    if not os.path.exists(dst):
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


def rate_stream(spark: SparkSession, rows_per_batch: int = 1000) -> DataFrame:
    """Rate source demo (SURVEY §7 step 3 "rate/file sources"):
    rate-micro-batch generates a DETERMINISTIC sequence (value =
    0..rows_per_batch-1 in batch 0), mapped here onto the events
    schema so every downstream pipeline (tumbling_counts, dedup_stream,
    user_running_stats) runs unchanged against a synthetic firehose —
    the standard soak-test harness for a streaming deploy."""
    raw = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("numPartitions", 4)
        .option("startTimestamp", 0)
        .load()
    )
    return raw.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 100).alias("user_id"),
        F.concat(F.lit("type_"), (F.col("value") % 5).cast("string")).alias(
            "event_type"
        ),
        ((F.col("value") % 1000) / F.lit(10.0)).alias("value"),
        F.lit("{}").alias("props"),
    )


def tumbling_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of timewin.window_tumbling: 1-hour tumbling
    count+sum per event type, late data beyond the watermark dropped.
    State size is bounded by (|windows within watermark| x |types|)."""
    return _set_mode(
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
        ),
        "complete",
    )


def sliding_avg(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of timewin.window_sliding."""
    return _set_mode(
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
        ),
        "complete",
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Streaming session windows (merging state) per user."""
    return _set_mode(
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("sw.start")).cast("long").alias("session_start"),
            "n_events",
        ),
        "complete",
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful dedup on event_id within the watermark horizon —
    the streaming form of timewin.dedup_events. State is purged as
    the watermark advances (bounded memory at any throughput)."""
    return _set_mode(
        events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        ),
        "append",
    )


def run_to_memory(
    stream: DataFrame,
    spark: SparkSession,
    name: str = "mem_out",
    output_mode: str | None = None,
    once: bool = False,
) -> DataFrame:
    """Execute a streaming DataFrame to completion with
    trigger(availableNow) into a memory sink; returns the batch
    result table. Test/demo harness — production uses parquet/Kafka
    sinks with checkpointing.

    ``output_mode`` defaults to the mode the pipeline declared via
    _set_mode (append if untagged); ``once=True`` runs exactly one
    micro-batch instead (for unbounded sources like rate_stream)."""
    mode = output_mode or getattr(stream, "_mrg_output_mode", "append")
    writer = stream.writeStream.format("memory").queryName(name).outputMode(mode)
    if once:
        q = writer.trigger(once=True).start()
    else:
        q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    return spark.table(name)


def stream_static_enrich(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static join: enrich the event stream with the (batch)
    customer dimension. The static side is broadcast per micro-batch
    — no stream state at all, the cheapest join a stream can do; the
    standard dimension-enrichment stage of any event pipeline."""
    from pyspark.sql import functions as F2

    dim = customers.select(
        F2.col("c_custkey").alias("user_id"), "c_name", "c_mktsegment"
    )
    return _set_mode(
        events.join(F2.broadcast(dim), "user_id", "left").select(
            "event_id", "user_id", "event_type", "ts", "c_name", "c_mktsegment"
        ),
        "append",
    )


def stream_stream_purchase_attribution(events: DataFrame) -> DataFrame:
    """Stream-stream interval join with watermarks on BOTH sides:
    attribute each purchase to the same user's clicks in the
    preceding 30 minutes. State is bounded by the watermark + the
    join's time-range condition (Spark evicts click state once no
    future purchase can reach it) — the canonical funnel-attribution
    shape."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    return _set_mode(
        purchases.join(
            clicks,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")),
            "inner",
        ).select("purchase_id", "click_id", F.col("p_user").alias("user_id")),
        "append",
    )


def run_to_parquet(
    stream: DataFrame, path: str, checkpoint: str, output_mode: str | None = None
) -> None:
    """Checkpointed parquet sink, availableNow: the production write
    path. The checkpoint directory carries source offsets + sink
    commit log, so re-running after a crash (or on a schedule)
    resumes exactly-once — re-invoking on fully-consumed input
    appends nothing."""
    mode = output_mode or getattr(stream, "_mrg_output_mode", "append")
    q = (
        stream.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# --- custom stateful operator: per-user running counters ---------------


def user_running_stats(
    events: DataFrame,
    watermark: str = "1 hour",
    state_ttl_ms: int = 24 * 3600 * 1000,
) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user cumulative event count and value sum, emitted on every
    update — the stateful-operator escape hatch for semantics the
    built-in windows can't express (reference analog: the generic
    Reduce contract, mpWorker/worker.go:22).

    State: one (count, sum) pair per user_id, bounded by
    EventTimeTimeout — a user idle for ``state_ttl_ms`` past the
    watermark has its state evicted, so total state is
    O(active users), not O(all users ever seen). Without this a
    100 TB/day stream grows state without bound."""
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
        if state.hasTimedOut:
            state.remove()
            return
        cnt, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf["value"].sum())
        state.update((cnt, total))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + state_ttl_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [cnt], "sum_value": [total]}
        )

    return _set_mode(
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        ),
        "update",
    )
