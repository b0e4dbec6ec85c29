"""Incremental rollup maintenance: merge-equals-rebuild, untouched
partitions physically untouched, idempotence; parquet compaction."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mapreducego_spark.operators.rollup import (
    build_rollup,
    read_rollup,
    update_rollup,
)
from mapreducego_spark.sources.catalog import load_table


def _split_events(spark, sf_dir):
    """First 80% of event time -> history, last 20% -> late arrivals
    (plus some events for EXISTING hours, so the merge path — not
    just the new-partition path — is exercised)."""
    ev = load_table(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    cut = lo + (hi - lo) * 0.8
    return ev.filter(F.col("ts") <= F.lit(cut)), ev.filter(F.col("ts") > F.lit(cut))


def _snapshot(spark, path):
    return {
        (r.day, r.win_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in read_rollup(spark, path).collect()
    }


def _partition_files(path):
    out = {}
    for d in os.listdir(path):
        if d.startswith("day="):
            full = os.path.join(path, d)
            out[d] = sorted(
                (f, os.path.getsize(os.path.join(full, f)))
                for f in os.listdir(full)
                if f.endswith(".parquet")
            )
    return out


def test_incremental_update_equals_full_rebuild(spark, sf_dir, tmp_path):
    hist, late = _split_events(spark, sf_dir)
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    build_rollup(hist, inc)
    update_rollup(spark, late, inc)
    build_rollup(load_table(spark, sf_dir, "events"), full)
    assert _snapshot(spark, inc) == _snapshot(spark, full)


def test_update_rewrites_only_affected_partitions(spark, sf_dir, tmp_path):
    hist, late = _split_events(spark, sf_dir)
    path = str(tmp_path / "roll")
    build_rollup(hist, path)
    before = _partition_files(path)
    update_rollup(spark, late, path)
    after = _partition_files(path)
    affected = {
        f"day={r.day}"
        for r in late.select(
            F.date_format(F.window("ts", "1 hour").start, "yyyy-MM-dd").alias("day")
        )
        .distinct()
        .collect()
    }
    assert affected, "fixture split produced no late days"
    untouched = set(before) - affected
    assert untouched, "every partition affected — split too coarse to test pruning"
    for d in untouched:
        assert before[d] == after[d], f"partition {d} was rewritten"
    assert any(before.get(d) != after.get(d) for d in affected)


def test_update_is_not_applied_twice_semantically(spark, sf_dir, tmp_path):
    """Applying the SAME late batch twice double-counts (the rollup
    is an additive fold, not an idempotent upsert) — assert the
    documented semantics so misuse is caught by contract."""
    hist, late = _split_events(spark, sf_dir)
    path = str(tmp_path / "roll2")
    build_rollup(hist, path)
    update_rollup(spark, late, path)
    once = _snapshot(spark, path)
    update_rollup(spark, late, path)
    twice = _snapshot(spark, path)
    n_late = late.count()
    assert (
        sum(v[0] for v in twice.values()) - sum(v[0] for v in once.values())
        == n_late
    )


def test_compact_parquet(spark, tmp_path):
    from mapreducego_spark.sources.catalog import compact_parquet

    src = str(tmp_path / "many")
    dst = str(tmp_path / "few")
    df = spark.range(0, 10_000).withColumn("x", F.col("id") * 2)
    df.repartition(64).write.parquet(src)
    n_src = sum(1 for f in os.listdir(src) if f.endswith(".parquet"))
    assert n_src >= 32
    n_out = compact_parquet(spark, src, dst, target_bytes=1 << 30)
    assert n_out < n_src
    back = spark.read.parquet(dst)
    assert back.count() == 10_000
    assert back.agg(F.sum("x")).collect()[0][0] == df.agg(F.sum("x")).collect()[0][0]


def test_stream_rollup_matches_batch_build(spark, sf_dir, tmp_path):
    """The foreachBatch continuous aggregate, fed the events fixture
    split across two files (two micro-batches: one cold build + one
    incremental fold), must equal a one-shot batch build."""
    from mapreducego_spark.streaming.pipelines import (
        EVENTS_STREAM_SCHEMA,
        stream_rollup_maintenance,
    )

    ev = load_table(spark, sf_dir, "events")
    stage = str(tmp_path / "stage")
    # two staged files in the canonical normalized form (what
    # events_stream stages; encoding handling itself is covered by
    # test_events_stream_ts_encoding_canary)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    cut = lo + (hi - lo) * 0.5
    ev.filter(F.col("ts") <= F.lit(cut)).coalesce(1).write.parquet(stage + "/a")
    ev.filter(F.col("ts") > F.lit(cut)).coalesce(1).write.parquet(stage + "/b")
    import glob
    import os
    import shutil

    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    for i, f in enumerate(
        sorted(glob.glob(stage + "/*/part-*.parquet"))
    ):
        shutil.copyfile(f, os.path.join(src_dir, f"{i:02d}.parquet"))

    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src_dir)
    )
    roll = str(tmp_path / "roll")
    stream_rollup_maintenance(stream, roll, str(tmp_path / "ckpt"))
    full = str(tmp_path / "full")
    build_rollup(ev, full)
    assert _snapshot(spark, roll) == _snapshot(spark, full)


def test_sketch_actives_tracks_exact_and_merges_lawfully(spark):
    """The sketch-table estimate must track the exact rolling
    distinct within HLL tolerance on every day, be run-to-run
    deterministic, and satisfy the mergeability law (union of daily
    sketches == one sketch over the whole range)."""
    from pyspark.sql import functions as F2

    from mapreducego_spark.operators.rollup import sketch_active_users
    from mapreducego_spark.operators.timewin import active_users_rolling
    from mapreducego_spark.sources.catalog import load_table

    SF = "/root/testdata/sf0.01"
    est = {r.day: r.wau7_est for r in sketch_active_users(spark, SF).collect()}
    exact = {r.day: r.wau7 for r in active_users_rolling(spark, SF).collect()}
    assert set(est) == set(exact)
    for d in exact:
        assert abs(est[d] - exact[d]) <= max(3, 0.05 * exact[d]), (d, est[d], exact[d])

    again = {r.day: r.wau7_est for r in sketch_active_users(spark, SF).collect()}
    assert again == est

    # mergeability: union of per-day sketches over ALL days ==
    # estimate of one sketch built over all events
    ev = load_table(spark, SF, "events").select(
        F2.col("user_id").cast("long").alias("user_id"),
        F2.datediff(F2.to_date("ts"), F2.lit("2024-01-01")).alias("day"),
    )
    merged = (
        ev.groupBy("day")
        .agg(F2.hll_sketch_agg("user_id").alias("sk"))
        .agg(F2.hll_sketch_estimate(F2.hll_union_agg("sk")).alias("e"))
        .collect()[0]["e"]
    )
    direct = ev.agg(
        F2.hll_sketch_estimate(F2.hll_sketch_agg("user_id")).alias("e")
    ).collect()[0]["e"]
    assert merged == direct
