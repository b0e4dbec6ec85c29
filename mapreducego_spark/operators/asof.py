"""As-of (nearest-event) join — an operator Spark lacks natively.

Semantics: for each left row (event), attach the most recent right
row (order of the same customer) with right.time <= left.time;
tie-break latest (o_orderdate, o_orderkey). Null if none.

Implemented as the *union-merge* construction, NOT a range join:
tag both sides, union, window over (key, time) with
last(..., ignorenulls=True) over an unbounded-preceding frame, keep
left rows. Cost: ONE shuffle of |L|+|R| rows on the join key plus a
per-key sort — exactly the as-of algorithm in kdb/QuestDB/Flink,
and it scales linearly at 100 TB where the naive
range-join-then-rank explodes to |L|x|matching R| intermediates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducego_spark.sources.catalog import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    tie_break: str | None = None,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Generic as-of join. ``direction="backward"`` (default): latest
    right row per key with right_time <= left_time (the kdb `aj`).
    ``direction="forward"``: earliest right row with right_time >=
    left_time — same union-merge construction walked in descending
    time order, so it stays ONE |L|+|R| shuffle. ``tie_break``: extra
    right column ordering rows that share a right_time (highest wins).
    ``tolerance_seconds`` (pandas merge_asof's ``tolerance``): a match
    farther than this from the left timestamp is treated as no match
    (values null) — the guard against stale quotes in market-data /
    sensor joins. Implemented by carrying the matched right TIME
    through the same last(ignorenulls) walk and nulling the payload
    where the gap exceeds the bound, so it adds zero shuffles.

    ``right_values`` must be disjoint from ``left.columns`` — the
    merged frame carries both sides' payloads, so an overlap would
    produce ambiguous duplicate names downstream."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    overlap = set(right_values) & set(left.columns)
    if overlap:
        raise ValueError(
            f"asof_join: right_values {sorted(overlap)} collide with left "
            "columns; alias the right-side columns before joining"
        )
    lt = F.col(left_time).cast("timestamp")
    rt = F.col(right_time).cast("timestamp")
    # side=0 for right rows so, at equal timestamps, the right row
    # sorts before the left row and is visible to it (<= semantics).
    tb_col = F.col(tie_break) if tie_break else F.lit(0)
    r = right.select(
        # left payload columns travel as nulls on right-side rows
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        F.col(right_on).alias("__k"),
        rt.alias("__t"),
        F.lit(0).alias("__side"),
        tb_col.alias("__tb"),
        *[F.col(c) for c in right_values],
    )
    l = left.select(
        "*",
        F.col(left_on).alias("__k"),
        lt.alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__tb"].dataType).alias("__tb"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_values],
    )
    merged = r.unionByName(l)
    # backward: ascending walk — the last right row seen has the
    # largest rt <= lt. forward: descending walk — the last right row
    # seen has the SMALLEST rt >= lt. Right rows sort before left at
    # equal timestamps either way (<=/>= inclusive semantics).
    t_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(t_order, F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = list(right_values)
    merged = merged.withColumn(
        "__rt", F.when(F.col("__side") == 0, F.col("__t"))
    )
    carried.append("__rt")
    filled = merged.select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in carried
        ],
    )
    if tolerance_seconds is not None:
        # microsecond-exact gap: unix_timestamp truncates to whole
        # seconds, which would admit matches up to ~1s staler than
        # the bound on sub-second timestamps (and diverge from an
        # INTERVAL compare, which is microsecond-exact)
        gap = F.abs(
            F.unix_micros(F.col("__t"))
            - F.unix_micros(F.col("__asof___rt"))
        )
        ok = F.col("__asof___rt").isNotNull() & (
            gap <= F.lit(int(tolerance_seconds) * 1_000_000)
        )
        keep = [c for c in left.columns] + [
            F.when(ok, F.col(f"__asof_{c}")).alias(c) for c in right_values
        ]
    else:
        keep = [c for c in left.columns] + [
            F.col(f"__asof_{c}").alias(c) for c in right_values
        ]
    return filled.filter(F.col("__side") == 1).select(*keep)


def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as-of orders: each event picks the customer's latest
    order at event time. Output: per-event matched order key +
    price (null-preserving), aggregated per event_type for a compact
    deterministic result plus a raw per-event id sum as checksum."""
    ev = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    matched = asof_join(
        ev.select("event_id", "user_id", "ts", "event_type"),
        o.select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"),
        left_on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_values=["o_orderkey", "o_totalprice"],
        tie_break="o_orderkey",
    )
    return matched.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("o_orderkey").cast("long").alias("matched_orderkey"),
        F.col("o_totalprice").alias("matched_price"),
    )


def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each event picks the customer's NEXT order at
    or after event time (the look-ahead twin of join_asof — e.g.
    'did this click lead to an order?'). Same linear union-merge."""
    ev = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    matched = asof_join(
        ev.select("event_id", "user_id", "ts", "event_type"),
        o.select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"),
        left_on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_values=["o_orderkey", "o_totalprice"],
        tie_break="o_orderkey",
        direction="forward",
    )
    return matched.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("o_orderkey").cast("long").alias("next_orderkey"),
        F.col("o_totalprice").alias("next_price"),
    )


def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of: each event picks the customer's order
    CLOSEST in time, before or after (pandas merge_asof
    direction='nearest') — the missing third member of the as-of
    family (backward/forward/nearest). Ties on |gap| prefer the
    backward match; ties within a direction at equal timestamps take
    the largest order key (the same contract as join_asof /
    join_asof_forward).

    Shape: two single-shuffle union-merge passes (the backward and
    forward walks), joined on the unique event id to pick the smaller
    microsecond gap — no range join, no per-row subquery; cost is
    exactly 2x the one-directional as-of. Gap arithmetic is
    unix_micros (whole-second truncation would misorder sub-second
    ties)."""
    ev = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    rv = ["o_orderkey", "o_totalprice", "o_orderdate"]
    kw = dict(
        left_on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_values=rv,
        tie_break="o_orderkey",
    )
    left = ev.select("event_id", "user_id", "ts", "event_type")
    back = asof_join(left, o.select("o_custkey", *rv), **kw).select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts"),
        F.col("o_orderkey").alias("b_key"),
        F.col("o_totalprice").alias("b_price"),
        F.col("o_orderdate").cast("timestamp").alias("b_date"),
    )
    fwd = asof_join(
        left, o.select("o_custkey", *rv), direction="forward", **kw
    ).select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("o_orderkey").alias("f_key"),
        F.col("o_totalprice").alias("f_price"),
        F.col("o_orderdate").cast("timestamp").alias("f_date"),
    )
    j = back.join(fwd, "event_id")
    gap_b = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("b_date")
    )
    gap_f = F.unix_micros(F.col("f_date")) - F.unix_micros(
        F.col("ts").cast("timestamp")
    )
    take_back = F.col("b_key").isNotNull() & (
        F.col("f_key").isNull() | (gap_b <= gap_f)
    )
    return j.select(
        "event_id",
        "user_id",
        F.when(take_back, F.col("b_key"))
        .otherwise(F.col("f_key"))
        .cast("long")
        .alias("nearest_orderkey"),
        F.when(take_back, F.col("b_price"))
        .otherwise(F.col("f_price"))
        .alias("nearest_price"),
        F.when(take_back, gap_b)
        .otherwise(gap_f)
        .cast("long")
        .alias("nearest_gap_us"),
    ).orderBy("event_id")


def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded backward as-of: each event picks the
    customer's latest order at event time ONLY if it is within 30
    days — a match staler than the bound is no match (nulls), the
    merge_asof(tolerance=...) contract. Same single-shuffle
    union-merge as join_asof; the tolerance is applied to the
    carried match time, not with an extra join."""
    ev = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    matched = asof_join(
        ev.select("event_id", "user_id", "ts", "event_type"),
        o.select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"),
        left_on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_values=["o_orderkey", "o_totalprice"],
        tie_break="o_orderkey",
        tolerance_seconds=30 * 86400,
    )
    return matched.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("o_orderkey").cast("long").alias("matched_orderkey"),
        F.col("o_totalprice").alias("matched_price"),
    )
