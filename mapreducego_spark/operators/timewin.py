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


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-step funnel over the event log: view -> click (after
    the first view) -> purchase (after that click), counted per
    stage.

    Distributed shape: each stage is ONE shuffle on user_id — filter
    the raw scan on the stage's type (pushed to the parquet reader),
    join the previous stage's (user_id, ts) frame, keep only later
    events, take the min. No per-user sort, no window over the whole
    log, no state; at 100 TB the stage frames are |users| rows, tiny
    next to the event scan, and AQE broadcasts them when they fit.
    Timestamps compare as epoch-microsecond longs (events.ts is ns
    parquet; both engines floor to us — see module docstring)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.unix_micros("ts").alias("us"),
        "event_type",
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("us") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("us") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t_purchase"))
    )

    def stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(name).alias("stage"), "users"
        )

    return (
        stage(v, "1_view")
        .unionAll(stage(c, "2_click"))
        .unionAll(stage(p, "3_purchase"))
    )


def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join, scale form: purchases landing
    within 10 minutes after each error event.

    A naive theta join (join_theta / BroadcastNestedLoopJoin) dies
    when both sides are facts. Binning fixes it: with bin width =
    the max interval length (10 min), an interval (t0, t0+W] overlaps
    at most TWO bins, so the interval side explodes to <=2 rows; a
    point belongs to exactly ONE bin, so each qualifying
    (interval, point) pair meets in exactly one bin — an equi
    shuffle join on the bin key plus a residual range predicate, no
    CartesianProduct, output needs no dedup. Both sides can be
    100 TB; the shuffle is keyed and AQE-coalesced like any other
    equi join."""
    W = 600_000_000  # 10 minutes in microseconds = the bin width
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_id").cast("long").alias("event_id"),
        F.unix_micros("ts").alias("us"),
        "event_type",
    )
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("us").alias("t0"),
        (F.col("us") + F.lit(W)).alias("t1"),
    )
    err_binned = err.withColumn(
        "bin", F.explode(F.sequence(F.expr(f"t0 div {W}"), F.expr(f"t1 div {W}")))
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("us").alias("tp"), F.expr(f"us div {W}").alias("bin")
    )
    return (
        err_binned.join(pur, "bin")
        .filter((F.col("tp") > F.col("t0")) & (F.col("tp") <= F.col("t1")))
        .groupBy("err_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.min("tp").alias("first_purchase_us"),
        )
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention grid — with the funnel, the other canonical
    product-analytics query over an event log: users grouped by
    first-activity week (their cohort), counted in each subsequent
    week they were active.

    Distributed shape: cohort assignment is one map-side-combined
    min per user; weekly activity is one distinct over (user, week);
    both are single shuffles on user_id, and the final aggregate
    runs over the tiny |cohorts| x |weeks| grid. No windows, no
    per-user sort. Week bucketing uses epoch SECONDS (exact in
    double well past 2^53 headroom) so engine and oracle floor
    identically."""
    week_s = 7 * 24 * 3600
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.floor(F.unix_timestamp("ts") / F.lit(week_s)).cast("long").alias("week"),
    )
    cohort = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = ev.distinct()
    return (
        active.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).cast("long").alias("week_n"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("active_users"))
        .orderBy("cohort_week", "week_n")
    )


def gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-fill with last-observation-carried-forward — the
    continuous-aggregate companion every time-series store ships
    (missing hours materialize with n_events = 0 and the last seen
    hourly sum carried forward).

    Distributed shape: the hourly rollup is one map-side-combined
    shuffle; the spine is generated per series with sequence() —
    |series| x |hours| rows, no driver loop; the fill is one window
    per series ordered by hour, bounded by the series' hour count
    (thousands per year), not the event count — so the skew story is
    |hours|, even when one event_type holds most of the data."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type",
            (F.floor(F.unix_timestamp("ts") / F.lit(3600)) * 3600)
            .cast("long")
            .alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            dsum(dec("value", 18, 6), "sum_value"),
        )
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select(
            "event_type",
            F.explode(F.sequence("h0", "h1", F.lit(3600))).alias("hour"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.last("sum_value", ignorenulls=True).over(w).alias("sum_value_filled"),
        )
        .orderBy("event_type", "hour")
    )


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition counts (the Markov-chain /
    clickstream-path primitive): for each user's time-ordered event
    sequence, count (current type -> next type) pairs corpus-wide.

    One shuffle: a per-user window ordered by (ts, event_id) — the
    event_id tie-break makes the sequence a total order, so the
    result is deterministic and engine-portable — then a small
    aggregate over the |types|^2 transition matrix. Per-user frames
    bound the window sort; no global sort anywhere."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        F.unix_micros("ts").alias("us"),
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    return (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
        .orderBy("from_type", "next_type")
    )


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization with explicit session IDs — the
    companion to session_window aggregation: every user's events are
    cut into sessions at >30-minute silences, and each session
    surfaces as one row with its ordinal, bounds, and size (the form
    downstream attribution/joins need, which the windowed aggregate
    alone doesn't give).

    One shuffle: lag + running-sum windows over the per-user
    (ts, event_id) total order mark and number the session starts,
    then the per-(user, session) aggregate is map-side combined.
    Per-user frames bound every sort; nothing global."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        F.unix_micros("ts").alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap_us = 30 * 60 * 1_000_000
    new_sess = F.when(
        F.lag("us").over(w).isNull() | (F.col("us") - F.lag("us").over(w) > gap_us),
        1,
    ).otherwise(0)
    sess_n = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn("session_n", sess_n.cast("long"))
        .groupBy("user_id", "session_n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("us").alias("sess_start_us"),
            F.max("us").alias("sess_end_us"),
        )
        .orderBy("user_id", "session_n")
    )


def trend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares trend over daily event counts — the
    capacity-planning / anomaly-baseline query every metrics
    warehouse runs. OLS needs only five algebraic sums (n, Σt, Σy,
    Σtt, Σty), so the whole fit is two map-side-combined aggregates
    (daily rollup, then per-group sums) — no window, no iteration,
    and it would shuffle |groups|x|days| rows at any corpus size.

    Engine-exactness: t is an integer day index (datediff from a
    fixed epoch) and y an integer count, so all five sums are exact
    LONGs; slope's numerator/denominator stay integer to the final
    ONE double division, and intercept/forecast reuse slope through
    a fixed IEEE expression tree mirrored verbatim in the oracle."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("t"),
        )
        .agg(F.count(F.lit(1)).alias("y"))
    )
    sums = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum("y").alias("sy"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum(F.col("t") * F.col("y")).alias("sty"),
        F.max("t").alias("tmax"),
    )
    num = (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).cast("double")
    slope = num / den
    intercept = (
        F.col("sy").cast("double") - slope * F.col("st").cast("double")
    ) / F.col("n").cast("double")
    forecast = intercept + slope * (F.col("tmax") + 1).cast("double")
    return (
        sums.select(
            "event_type",
            F.col("n").cast("long").alias("n_days"),
            F.round(slope, 6).alias("slope"),
            F.round(intercept, 6).alias("intercept"),
            F.round(forecast, 6).alias("forecast_next"),
        )
        .orderBy("event_type")
    )


def session_paths(spark: SparkSession, sf_dir: str, top_n: int = 20) -> DataFrame:
    """Top-N session PATHS: the ordered event-type sequence of each
    gap-based session, counted across all sessions — the product
    question behind funnel design ("what do users actually do in a
    visit?"). Reuses sessionize's lag/cumsum construction for the
    session ids, then builds each path with the order-imposed
    nested-collect pattern (sort_array over (ts, event_id)-keyed
    structs — collect_list alone is shuffle-order-nondeterministic,
    the nest_order_lines trap) and counts paths.

    Scale shape: one user_id shuffle for the windows, one path
    shuffle for the count (paths are short strings), top-N via the
    count ordering with a path tie-break for determinism."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        F.unix_micros("ts").alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap_us = 30 * 60 * 1_000_000
    new_sess = F.when(
        F.lag("us").over(w).isNull() | (F.col("us") - F.lag("us").over(w) > gap_us),
        1,
    ).otherwise(0)
    sess_n = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    path = F.array_join(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct("us", "event_id", "event_type"))
            ),
            lambda x: x["event_type"],
        ),
        ">",
    )
    return (
        ev.withColumn("session_n", sess_n)
        .groupBy("user_id", "session_n")
        .agg(path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(top_n)
    )


def active_users_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling 7-day active users (WAU) beside daily actives
    (DAU) — the growth dashboard's headline pair. Exact rolling
    DISTINCT does not decompose algebraically (you cannot merge two
    days' distinct counts), so the scalable exact construction is
    contribution explosion: each (user, day) activity row fans out
    to the <=7 window-days it can appear in, then one distinct +
    count per window-day. Cost is a bounded 7x row fan-out of the
    ALREADY-DEDUPED (user, day) table — |users x days|, not |events|
    — which beats a per-day window over raw events by the event
    multiplicity, and sketches (HLL merge) are the approximate
    fallback when even that is too wide."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("day"),
    )
    du = ev.distinct()
    max_day = du.agg(F.max("day").alias("mx"))
    dau = du.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    contrib = (
        du.select(
            "user_id",
            F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("day"),
        )
        .crossJoin(F.broadcast(max_day))
        .filter(F.col("day") <= F.col("mx"))
        .select("user_id", "day")
        .distinct()
    )
    wau = contrib.groupBy("day").agg(F.countDistinct("user_id").alias("wau7"))
    return (
        wau.join(dau, "day", "left")
        .select(
            F.col("day").cast("long").alias("day"),
            F.coalesce(F.col("dau"), F.lit(0)).cast("long").alias("dau"),
            F.col("wau7").cast("long").alias("wau7"),
        )
        .orderBy("day")
    )


def concurrent_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line maximum concurrency per event type: treat each
    event as an interval [ts, ts + value seconds) and report, per
    type, the peak number of simultaneously open intervals and the
    earliest instant that peak is reached — the capacity question
    ("how many X are in flight at once?") behind connection-pool
    sizing, ad-slot pacing, and concurrent-viewer dashboards.

    Classic sweep: each interval emits (+1 at start, -1 at end),
    the stream is ordered by (time, delta) — ends sort BEFORE
    starts at the same instant, so half-open [a,b) touching
    intervals never count as concurrent — and a running sum walks
    the timeline; its max is the answer. The running sum is a
    window per event_type, so the sort is bounded per type and all
    types sweep in parallel. For one giant key the two-phase form
    (per-partition prefix sums + exclusive-scan offsets broadcast —
    the pack_shards construction, text.py) replaces the window; the
    multiset of prefix values is invariant to ordering within equal
    (time, delta) groups, so max and argmin-time are deterministic
    without a per-row total order.

    Engine exactness: interval ends are floor(value * 1e6) micro-
    second offsets (one explicit floor — Spark CASTs truncate where
    DuckDB's round, so never cast a fractional double directly) and
    the peak/argmin are integer max/min over LONG prefix sums."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros("ts").alias("s_us"),
        (F.unix_micros("ts") + F.floor(F.col("value") * 1e6).cast("long")).alias(
            "e_us"
        ),
    )
    return sweep_max_concurrency(ev)


def sweep_max_concurrency(ev: DataFrame) -> DataFrame:
    """Core sweep over (event_type, s_us, e_us) interval rows; see
    concurrent_events for the semantics and scale notes."""
    deltas = ev.selectExpr(
        "event_type", "s_us AS t_us", "CAST(1 AS BIGINT) AS delta"
    ).unionAll(
        ev.selectExpr("event_type", "e_us AS t_us", "CAST(-1 AS BIGINT) AS delta")
    )
    w = Window.partitionBy("event_type").orderBy("t_us", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = deltas.withColumn("open_now", F.sum("delta").over(w))
    peaks = run.groupBy("event_type").agg(
        F.max("open_now").cast("long").alias("max_concurrent")
    )
    return (
        run.join(peaks, "event_type")
        .filter(F.col("open_now") == F.col("max_concurrent"))
        .groupBy("event_type", "max_concurrent")
        .agg(F.min("t_us").cast("long").alias("peak_at_us"))
        .orderBy("event_type")
    )


def attribution_last_touch(
    spark: SparkSession, sf_dir: str, lookback_days: int = 7
) -> DataFrame:
    """Last-touch marketing attribution: every purchase is credited
    to the user's most recent preceding non-purchase touchpoint
    within a lookback window — the default conversion-attribution
    model of every ads/analytics warehouse. Purchases with no
    touchpoint in the window land in the 'direct' bucket (the
    all-models-must-sum-to-total invariant; a pytest pins it).

    One pass, no self-join: per user the event stream is scanned in
    (ts, event_id) order and the last non-purchase touch is carried
    forward with last(..., ignorenulls) over an unbounded-preceding
    frame — the LOCF construction (gapfill_locf) applied to
    attribution. The lookback cut then compares carried timestamp
    to purchase timestamp. Revenue is credited in integer cents
    (floor(value*100), the udaf_revenue_cents contract) so sums are
    engine-exact.

    Scale: one user_id shuffle; frames are bounded per user. The
    self-join alternative (purchases x touches) would shuffle the
    event table twice and blow up on power users."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        F.unix_micros("ts").alias("us"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.when(F.col("event_type") != "purchase",
                   F.struct("us", "event_type"))
    carried = ev.select(
        "user_id", "event_id", "event_type", "us", "value",
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
    )
    lookback_us = lookback_days * 86_400 * 1_000_000
    purchases = carried.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.col("last_touch").isNotNull()
            & (F.col("us") - F.col("last_touch.us") <= lookback_us),
            F.col("last_touch.event_type"),
        )
        .otherwise(F.lit("direct"))
        .alias("credited_to"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    return (
        purchases.groupBy("credited_to")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .orderBy("credited_to")
    )


def gapfill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-fill with LINEAR interpolation — gapfill_locf's
    companion for continuous measures (LOCF suits step-wise state;
    interpolation suits rates/levels, the timeseries-store
    ``interpolate()`` verb). Missing hours between two present
    hours get v0 + (v1-v0)*(h-h0)/(h1-h0); leading/trailing gaps
    (no neighbor on one side) stay NULL rather than invent data.

    Engine exactness: hourly sums are exact LONG cents
    (floor(value*100) per event), and the interpolation expression
    is one fixed double tree over those longs — identical operands
    and operator order on both engines, then floor() back to cents
    (floor, not round: round's half-boundary is the cross-engine
    trap, label_centroids' lesson). Two windows per series (carry
    prev/next observation), both bounded by |hours|, same scale
    story as LOCF."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type",
            (F.floor(F.unix_timestamp("ts") / F.lit(3600)) * 3600)
            .cast("long")
            .alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("v_cents"),
        )
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select(
            "event_type",
            F.explode(F.sequence("h0", "h1", F.lit(3600))).alias("hour"),
        )
    )
    joined = spine.join(hourly, ["event_type", "hour"], "left")
    wb = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs = F.when(
        F.col("v_cents").isNotNull(), F.struct("hour", "v_cents")
    )
    marked = joined.select(
        "event_type",
        "hour",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        "v_cents",
        F.last(obs, ignorenulls=True).over(wb).alias("prev"),
        F.first(obs, ignorenulls=True).over(wf).alias("nxt"),
    )
    interp = (
        F.col("prev.v_cents").cast("double")
        + (F.col("nxt.v_cents") - F.col("prev.v_cents")).cast("double")
        * (F.col("hour") - F.col("prev.hour")).cast("double")
        / (F.col("nxt.hour") - F.col("prev.hour")).cast("double")
    )
    filled = (
        F.when(F.col("v_cents").isNotNull(), F.col("v_cents"))
        .when(
            F.col("prev").isNotNull() & F.col("nxt").isNotNull(),
            F.floor(interp).cast("long"),
        )
        .otherwise(F.lit(None).cast("long"))
    )
    return marked.select(
        "event_type", "hour", "n_events", filled.alias("filled_cents")
    ).orderBy("event_type", "hour")


def running_balance_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running balance with a clamp at zero — purchases
    credit floor(value*100) cents, clicks debit it, and the balance
    can never go negative (prepaid-wallet / inventory-on-hand
    semantics): b_i = max(b_{i-1} + delta_i, 0).

    This fold is NON-ASSOCIATIVE (max-with-floor does not decompose
    into partial aggregates: clamp(a+b) != clamp(a)+clamp(b)), so
    no window frame, no two-phase combine, and no SQL aggregate can
    express it — it is the textbook case for applyInPandas: group
    by the entity, Arrow-ship each user's ordered ledger to Python
    once, run the sequential scan vectorized-per-group, return one
    summary row. Parallelism is ACROSS users (the shuffle key);
    within a user the scan is inherently sequential — that's the
    semantics, not a missed optimization.

    The oracle reproduces the fold with a recursive CTE stepping
    row-by-row per user (set-based across users), so the driver
    hash match proves the Python fold against pure SQL."""
    import pandas as pd

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("event_id").cast("long").alias("event_id"),
            F.unix_micros("ts").alias("us"),
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100),
            )
            .otherwise(-F.floor(F.col("value") * 100))
            .cast("long")
            .alias("delta_cents"),
        )
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["us", "event_id"])
        bal, clamps = 0, 0
        for d in pdf["delta_cents"]:
            bal += int(d)
            if bal < 0:
                bal = 0
                clamps += 1
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "final_balance_cents": [bal],
                "n_clamped": [clamps],
                "n_tx": [len(pdf)],
            }
        )

    return (
        ev.groupBy("user_id")
        .applyInPandas(
            fold,
            "user_id long, final_balance_cents long, n_clamped long, n_tx long",
        )
        .orderBy("user_id")
    )
