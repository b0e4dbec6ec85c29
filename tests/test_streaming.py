"""Structured Streaming tier: each streaming pipeline, run to
completion with trigger(availableNow) into a memory sink, must agree
with its batch twin from operators/timewin.py."""

from __future__ import annotations

import uuid

import pandas as pd
import pyspark.sql.functions as F
import pytest

from mapreducego_spark.operators.timewin import (
    window_session,
    window_sliding,
    window_tumbling,
)
from mapreducego_spark.sources.catalog import load_table
from mapreducego_spark.streaming.pipelines import (
    FLUSH_EVENT_TYPE,
    FLUSH_TS_SECONDS,
    FLUSH_USER_ID,
    dedup_stream,
    events_stream,
    rate_stream,
    run_to_memory,
    session_counts,
    sliding_avg,
    tumbling_counts,
    user_running_stats,
)


def _run(stream, spark):
    return run_to_memory(stream, spark, name=f"t_{uuid.uuid4().hex[:8]}")


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    # flush=True: in append mode windows only emit once the watermark
    # passes them; the sentinel closes every real window, then is
    # filtered back out of the comparison.
    got = {
        (r.win_start, r.event_type): (r.n_events, r.sum_value)
        for r in _run(
            tumbling_counts(events_stream(spark, sf_dir, flush=True)), spark
        ).collect()
        if r.event_type != FLUSH_EVENT_TYPE
    }
    want = {
        (r.win_start, r.event_type): (r.n_events, r.sum_value)
        for r in window_tumbling(spark, sf_dir).collect()
    }
    assert got == want


def test_streaming_sliding_equals_batch(spark, sf_dir):
    got = {
        r.win_start: (r.n_events, round(r.avg_value, 9))
        for r in _run(
            sliding_avg(events_stream(spark, sf_dir, flush=True)), spark
        ).collect()
        if r.win_start < FLUSH_TS_SECONDS - 86400
    }
    want = {
        r.win_start: (r.n_events, round(r.avg_value, 9))
        for r in window_sliding(spark, sf_dir).collect()
    }
    assert got == want


def test_streaming_sessions_cover_all_events(spark, sf_dir):
    rows = _run(
        session_counts(events_stream(spark, sf_dir, flush=True)), spark
    ).collect()
    total = sum(r.n_events for r in rows if r.user_id != FLUSH_USER_ID)
    assert total == load_table(spark, sf_dir, "events").count()


def test_streaming_dedup_keeps_unique_ids(spark, sf_dir):
    out = _run(dedup_stream(events_stream(spark, sf_dir)), spark)
    n_unique = (
        load_table(spark, sf_dir, "events").select("event_id").distinct().count()
    )
    assert out.count() == n_unique


def test_rate_source_feeds_pipelines(spark):
    """SURVEY §7 step 3 rate source: one deterministic micro-batch of
    the synthetic firehose through the tumbling pipeline."""
    # complete mode override: a single once-triggered batch never
    # advances the watermark, so append would emit nothing — complete
    # surfaces the in-flight state for inspection (memory sink only).
    out = run_to_memory(
        tumbling_counts(rate_stream(spark, rows_per_batch=500)),
        spark,
        name=f"t_{uuid.uuid4().hex[:8]}",
        once=True,
        output_mode="complete",
    )
    rows = out.collect()
    assert sum(r.n_events for r in rows) == 500
    assert {r.event_type for r in rows} == {f"type_{i}" for i in range(5)}


def test_stateful_state_is_event_time_bounded(spark, sf_dir):
    """user_running_stats must plan an EventTimeTimeout (bounded
    state); NoTimeout would grow state forever on a real stream."""
    spec = user_running_stats(events_stream(spark, sf_dir))
    plan = spec.df._jdf.queryExecution().analyzed().toString()
    assert "EventTimeTimeout" in plan
    assert spec.mode == "update"


def test_stateful_running_stats_final_totals(spark, sf_dir):
    """applyInPandasWithState: last update per user must equal the
    batch per-user totals."""
    out = _run(user_running_stats(events_stream(spark, sf_dir)), spark)
    # update-mode memory sink appends every update; the max count per
    # user is the final state
    final = (
        out.groupBy("user_id")
        .agg(F.max("n_events").alias("n"), F.max("sum_value").alias("s"))
        .collect()
    )
    want = {
        r.user_id: (r.n, round(r.s, 6))
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("s"))
        .collect()
    }
    got = {r.user_id: (r.n, round(r.s, 6)) for r in final}
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0]
        assert abs(got[u][1] - want[u][1]) < 1e-3


def test_stream_static_enrich_matches_batch_join(spark, sf_dir):
    from mapreducego_spark.streaming.pipelines import stream_static_enrich

    customers = load_table(spark, sf_dir, "customer")
    out = _run(stream_static_enrich(events_stream(spark, sf_dir), customers), spark)
    events = load_table(spark, sf_dir, "events")
    want = events.join(
        customers.withColumnRenamed("c_custkey", "user_id"), "user_id", "left"
    ).count()
    assert out.count() == want


def test_stream_stream_join_matches_batch_twin(spark, sf_dir):
    from mapreducego_spark.streaming.pipelines import (
        stream_stream_purchase_attribution,
    )

    out = _run(
        stream_stream_purchase_attribution(events_stream(spark, sf_dir)), spark
    )
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter("event_type = 'click'").selectExpr(
        "user_id AS c_user", "event_id AS click_id", "ts AS click_ts"
    )
    purchases = ev.filter("event_type = 'purchase'").selectExpr(
        "user_id AS p_user", "event_id AS purchase_id", "ts AS purchase_ts"
    )
    want = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")),
    ).count()
    got = {(r.purchase_id, r.click_id) for r in out.collect()}
    assert len(got) == want


def test_checkpointed_parquet_sink_is_exactly_once(spark, sf_dir, tmp_path):
    from mapreducego_spark.streaming.pipelines import run_to_parquet

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stage = str(tmp_path / "stage")  # stable source path across runs
    n_events = load_table(spark, sf_dir, "events").count()
    run_to_parquet(events_stream(spark, sf_dir, stage_dir=stage), out, ckpt)
    assert spark.read.parquet(out).count() == n_events
    # same checkpoint, fully-consumed source: nothing is re-appended
    run_to_parquet(events_stream(spark, sf_dir, stage_dir=stage), out, ckpt)
    assert spark.read.parquet(out).count() == n_events


def test_stream_tumbling_sink_matches_batch_twin(spark, sf_dir):
    """The registry's oracle-checked stream row: parquet sink
    read-back must equal the batch tumbling window exactly."""
    from mapreducego_spark.streaming.pipelines import stream_tumbling_sink

    got = {
        (r.win_start, r.event_type): (r.n_events, r.sum_value)
        for r in stream_tumbling_sink(spark, sf_dir).collect()
    }
    want = {
        (r.win_start, r.event_type): (r.n_events, r.sum_value)
        for r in window_tumbling(spark, sf_dir).collect()
    }
    assert got == want


def test_stream_sliding_sink_matches_batch_twin(spark, sf_dir):
    from mapreducego_spark.streaming.pipelines import stream_sliding_sink

    got = {
        r.win_start: (r.n_events, round(r.avg_value, 9))
        for r in stream_sliding_sink(spark, sf_dir).collect()
    }
    want = {
        r.win_start: (r.n_events, round(r.avg_value, 9))
        for r in window_sliding(spark, sf_dir).collect()
    }
    assert got == want


def test_stream_session_sink_matches_batch_twin(spark, sf_dir):
    from mapreducego_spark.streaming.pipelines import stream_session_sink

    got = {
        (r.user_id, r.session_start): (r.n_events, r.session_seconds)
        for r in stream_session_sink(spark, sf_dir).collect()
    }
    want = {
        (r.user_id, r.session_start): (r.n_events, r.session_seconds)
        for r in window_session(spark, sf_dir).collect()
    }
    assert got == want


def test_streaming_replay_is_multi_batch(spark, sf_dir, tmp_path):
    """The staged replay must be a REAL multi-batch run (ts-sorted
    chunks, maxFilesPerTrigger=1), not one batch plus the sentinel —
    otherwise watermark advancement across batches is never
    exercised."""
    from mapreducego_spark.streaming.pipelines import (
        N_STREAM_CHUNKS,
        run_to_parquet,
    )

    q = run_to_parquet(
        events_stream(spark, sf_dir, stage_dir=str(tmp_path / "stage")),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    assert q.lastProgress["batchId"] >= N_STREAM_CHUNKS - 1


def _write_events_fixture(dirpath, encoding):
    """Tiny events fixture in one of the three ts encodings the
    fixture generator has shipped (or could ship)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = dt.datetime(2024, 1, 1)
    rows = 6
    t = pa.table(
        {
            "event_id": pa.array(range(rows), pa.int64()),
            "ts": pa.array(
                [base + dt.timedelta(minutes=40 * i) for i in range(rows)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([i % 2 for i in range(rows)], pa.int64()),
            "event_type": pa.array(["click"] * rows),
            "value": pa.array([float(i) for i in range(rows)], pa.float64()),
            "props": pa.array(["{}"] * rows),
        }
    )
    path = f"{dirpath}/events.parquet"
    if encoding == "nanos":
        t = t.set_column(
            1, pa.field("ts", pa.timestamp("ns")), t.column("ts").cast(pa.timestamp("ns"))
        )
        pq.write_table(t, path, version="2.6", coerce_timestamps=None)
    elif encoding == "int64_nanos":
        ns = t.column("ts").cast(pa.timestamp("ns")).cast(pa.int64())
        t = t.set_column(1, pa.field("ts", pa.int64()), ns)
        pq.write_table(t, path)
    else:
        pq.write_table(t, path)
    return path


@pytest.mark.parametrize("encoding", ["micros", "nanos", "int64_nanos"])
def test_events_stream_ts_encoding_canary(spark, tmp_path, encoding):
    """Round-3 regression canary: the stream source must yield the
    SAME event times as catalog.load_table for every ts encoding the
    fixture has shipped with. The r3 bug (hardcoded nanos-as-long
    schema + div 1000 against a micros fixture) collapsed all events
    to ~1970 — this asserts real 2024 wall times per encoding."""
    import pyarrow.parquet as pq

    d = tmp_path / encoding
    d.mkdir()
    _write_events_fixture(str(d), encoding)
    out = _run(events_stream(spark, str(d)), spark)
    got = sorted((r.event_id, r.ts) for r in out.collect())
    want = sorted(
        (r.event_id, r.ts)
        for r in load_table(spark, str(d), "events").collect()
    )
    assert got == want
    assert all(ts.year == 2024 for _, ts in got)
    # the staged chunks themselves are canonical micros
    stage = tmp_path / f"stage_{encoding}"
    events_stream(spark, str(d), stage_dir=str(stage))
    chunk0 = sorted(f for f in stage.iterdir() if f.name.startswith("chunk_"))[0]
    assert str(pq.read_schema(chunk0).field("ts").type) == "timestamp[us]"


def test_stream_dedup_exactly_once_under_duplicated_replay(spark, sf_dir):
    """copies=2 replays every event in two different micro-batches;
    the dedup sink must still hold each event exactly once."""
    from mapreducego_spark.streaming.pipelines import stream_dedup_sink

    out = stream_dedup_sink(spark, sf_dir)
    n = load_table(spark, sf_dir, "events").count()
    assert out.count() == n
    assert out.select("event_id").distinct().count() == n


def test_run_to_parquet_rejects_non_append(spark, sf_dir, tmp_path):
    """The file sink only supports append; a non-append StreamSpec
    must fail fast with a clear error, not at start()."""
    from mapreducego_spark.streaming.pipelines import (
        run_to_parquet,
        user_running_stats,
    )

    spec = user_running_stats(events_stream(spark, sf_dir))  # update mode
    with pytest.raises(ValueError, match="append"):
        run_to_parquet(spec, str(tmp_path / "o"), str(tmp_path / "c"))


def test_stage_dir_reuse_rejects_mismatched_params(spark, tmp_path):
    """Reusing a staged directory is only sound with identical staging
    parameters — a copies=2 replay request over a dir staged with
    copies=1 must raise, not silently deliver a single replay."""
    import pytest as _pytest

    d = tmp_path / "fixture"
    d.mkdir()
    _write_events_fixture(str(d), "micros")
    stage = tmp_path / "stage"
    events_stream(spark, str(d), stage_dir=str(stage), n_chunks=4, copies=1)
    # identical params: reuse is fine (checkpoint restart needs this)
    events_stream(spark, str(d), stage_dir=str(stage), n_chunks=4, copies=1)
    with _pytest.raises(ValueError, match="staged with"):
        events_stream(spark, str(d), stage_dir=str(stage), n_chunks=4, copies=2)
    with _pytest.raises(ValueError, match="staged with"):
        events_stream(spark, str(d), stage_dir=str(stage), n_chunks=8, copies=1)


def test_stateful_totals_state_survives_event_time_gaps(spark, tmp_path):
    """The oracle-checked stateful operator must not let event-time
    TTL purge a user who goes quiet: with an eviction TTL, a user
    absent for more than the TTL of event time restarts at 0 and the
    final total silently undercounts. user_totals_exact defaults to
    NoTimeout, so user 1's two bursts 10 days apart must sum."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from mapreducego_spark.streaming.pipelines import user_totals_exact

    base = 1_700_000_000_000_000  # 2023-11-14, micros
    day = 86_400_000_000
    rows = []
    # user 1: events on day 0 and day 10; user 2 active throughout
    for i in range(8):
        rows.append((i, base + i * day + (0 if i in (0, 7) else 0), 2, 2.5))
    rows.append((100, base, 1, 1.5))
    rows.append((101, base + 10 * day, 1, 2.0))
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    d = tmp_path / "gap_fixture"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    spec = user_totals_exact(events_stream(spark, str(d), n_chunks=8))
    out = _run(spec, spark)
    final = (
        out.groupBy("user_id")
        .agg(
            F.max_by("sum_micros", "n_events").alias("sum_micros"),
            F.max("n_events").alias("n_events"),
        )
        .collect()
    )
    got = {r["user_id"]: (r["n_events"], r["sum_micros"]) for r in final}
    assert got[1] == (2, 3_500_000), got  # both bursts counted
    assert got[2] == (8, 20_000_000), got


def test_crash_mid_replay_recovers_exactly_once(spark, sf_dir, tmp_path):
    """Exactly-once under FAILURE, not just under clean availableNow
    restarts: a poison UDF kills the query partway through the 9-file
    replay (after several batches have committed), then the identical
    query restarts on the same checkpoint and must (a) resume batch
    numbering where the crash left off rather than reprocessing from
    zero, and (b) leave the sink equal to the batch twin.

    What the checkpoint protects, concretely: the offset log pins
    which staged chunk files each committed batch consumed, the state
    store versions let window state reload as of the last commit, and
    the sink's _spark_metadata commit log keeps any parquet written
    by the dying batch invisible to readers — so the crash can lose
    in-flight work but can neither duplicate nor drop a committed
    row."""
    import os as _os

    from mapreducego_spark.streaming.pipelines import run_to_parquet

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stage = str(tmp_path / "stage")
    flag = str(tmp_path / "poison_flag")

    ev = load_table(spark, sf_dir, "events")
    cutover = int(
        ev.selectExpr("percentile(unix_micros(ts), 0.6) AS p").collect()[0]["p"]
    )

    @F.pandas_udf("boolean")
    def alive(ts_us: pd.Series) -> pd.Series:
        if _os.path.exists(flag) and bool((ts_us >= cutover).any()):
            raise RuntimeError("injected crash: worker dies mid-batch")
        return pd.Series([True] * len(ts_us))

    def attempt():
        src = events_stream(spark, sf_dir, stage_dir=stage, flush=True)
        spec = tumbling_counts(src.filter(alive(F.unix_micros("ts"))))
        return run_to_parquet(spec, out, ckpt)

    open(flag, "w").close()
    with pytest.raises(Exception, match="injected crash"):
        attempt()
    committed_before = len(
        [f for f in _os.listdir(_os.path.join(ckpt, "commits")) if f.isdigit()]
    )
    # the crash happened mid-replay: some batches committed, not all
    assert 0 < committed_before < 9, committed_before

    _os.remove(flag)
    q = attempt()
    # batch numbering continued from the checkpoint, no restart-at-0
    assert q.lastProgress["batchId"] >= committed_before

    got = {
        (r.win_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.read.parquet(out)
        .filter(F.col("event_type") != FLUSH_EVENT_TYPE)
        .collect()
    }
    want = {
        (r.win_start, r.event_type): (r.n_events, r.sum_value)
        for r in window_tumbling(spark, sf_dir).collect()
    }
    assert got == want


def test_stream_upsert_crash_recovers_and_gcs_versions(spark, sf_dir, tmp_path):
    """The foreachBatch MERGE under failure: a poison UDF kills the
    replay mid-run; the restart must replay the crashed batch (LWW
    merge makes the rewrite idempotent), _CURRENT must never point
    at a partial table, and the final table equals the batch argmax.
    Also pins the version GC: at most 2 v* dirs retained."""
    import os as _os

    from mapreducego_spark.streaming.pipelines import (
        _latest_per_user,
        events_stream,
        stream_upsert_maintenance,
    )

    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    stage = str(tmp_path / "stage")
    flag = str(tmp_path / "poison_flag")

    ev = load_table(spark, sf_dir, "events")
    cutover = int(
        ev.selectExpr("percentile(unix_micros(ts), 0.6) AS p").collect()[0]["p"]
    )

    @F.pandas_udf("boolean")
    def alive(ts_us: pd.Series) -> pd.Series:
        if _os.path.exists(flag) and bool((ts_us >= cutover).any()):
            raise RuntimeError("injected crash: worker dies mid-batch")
        return pd.Series([True] * len(ts_us))

    def attempt():
        src = events_stream(spark, sf_dir, stage_dir=stage)
        stream_upsert_maintenance(
            src.filter(alive(F.unix_micros("ts"))), table, ckpt
        )

    open(flag, "w").close()
    with pytest.raises(Exception, match="injected crash"):
        attempt()
    committed = len(
        [f for f in _os.listdir(_os.path.join(ckpt, "commits")) if f.isdigit()]
    )
    assert committed > 0  # mid-replay, not instant death
    # _CURRENT points at a fully-written version even after the crash
    cur = open(_os.path.join(table, "_CURRENT")).read().strip()
    assert _os.path.exists(_os.path.join(table, cur, "_SUCCESS"))

    _os.remove(flag)
    attempt()

    got = {
        (r.user_id, r.event_id)
        for r in spark.read.parquet(
            _os.path.join(table, open(_os.path.join(table, "_CURRENT")).read())
        ).collect()
    }
    want = {(r.user_id, r.event_id) for r in _latest_per_user(ev).collect()}
    assert got == want
    versions = [d for d in _os.listdir(table) if d.startswith("v")]
    assert len(versions) <= 2, versions


def test_stream_left_outer_join_emits_unmatched_purchases(spark, sf_dir):
    """The left-outer interval join must emit every purchase exactly
    once — matched ones per click, unmatched ones with NULL click_id,
    INCLUDING purchases inside the final watermark horizon (the rows
    that vanish if the sentinel is predicate-pushed below the
    watermark node or no post-watermark batch runs)."""
    from mapreducego_spark.streaming.pipelines import stream_left_join_sink

    got = {
        (r.purchase_id, r.click_id)
        for r in stream_left_join_sink(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("pts"),
    )
    c = ev.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    want = {
        (r.purchase_id, r.click_id)
        for r in p.join(
            c,
            (p.u == c.cu)
            & (c.cts <= p.pts)
            & (c.cts >= p.pts - F.expr("INTERVAL 30 MINUTES")),
            "left_outer",
        ).collect()
    }
    assert got == want
    # the horizon rows specifically: unmatched purchases within the
    # last watermark-delay of event time must be present
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    horizon = {
        pid
        for (pid, cid) in want
        if cid is None
    } & {
        r.purchase_id
        for r in p.filter(
            F.col("pts") >= F.lit(max_ts) - F.expr("INTERVAL 1 HOUR")
        ).collect()
    }
    got_unmatched = {pid for (pid, cid) in got if cid is None}
    assert horizon <= got_unmatched


def test_stream_funnel_state_machine_equals_batch(spark, sf_dir):
    """The greedy per-user state machine must equal the one-shot
    min-chain funnel on the fixture, and respect STRICT ordering on
    a crafted stream (a click at exactly t_view must not count)."""
    from mapreducego_spark.operators.timewin import funnel_conversion
    from mapreducego_spark.streaming.pipelines import (
        run_to_memory,
        stream_funnel_sink,
        user_funnel_stream,
    )

    got = {r.stage: r.users for r in stream_funnel_sink(spark, sf_dir).collect()}
    want = {r.stage: r.users for r in funnel_conversion(spark, sf_dir).collect()}
    assert got == want and want["1_view"] > 0

    # strictness: click at t == t_view is NOT after the view
    import pandas as pd

    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame(
        {
            "event_id": [0, 1, 2],
            "ts": [base, base, base + pd.Timedelta("1min")],
            "user_id": [1, 1, 1],
            "event_type": ["view", "click", "purchase"],
            "value": 1.0,
            "props": "{}",
        }
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="funnel_strict_")
    pdf.to_parquet(f"{d}/events.parquet")
    from mapreducego_spark.streaming.pipelines import events_stream

    out = run_to_memory(
        user_funnel_stream(events_stream(spark, d, n_chunks=1)),
        spark,
        name="funnel_strict",
    ).collect()
    final = out[-1]
    assert final.t_view is not None
    assert final.t_click is None  # same-ts click rejected (strict >)
    assert final.t_purchase is None  # no click -> purchase unreachable
