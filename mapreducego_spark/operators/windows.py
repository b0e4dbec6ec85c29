"""Window functions: ranking, analytic (lag/lead), running frames.

Closure construction in the reference's terms: shuffle by the
partition key (reference worker.go:142-151) + per-key sorted reduce
(worker.go:171-177) — exactly Spark's WindowExec: one exchange on
partitionBy, sort within, then a streaming frame evaluator. Scale
note: a window with no partitionBy collapses to a single partition —
every window here partitions on a real key so parallelism survives
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducego_spark.operators.util import dec
from mapreducego_spark.sources.catalog import load_table


def _orders_window(spark: SparkSession, sf_dir: str):
    o = load_table(spark, sf_dir, "orders")
    # Deterministic total order inside each customer: date then key.
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return o, w


def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank of each order within its
    customer, keeping only the first 3 per customer (top-n pattern:
    rank + filter, the distributed top-n-per-group idiom)."""
    o, w = _orders_window(spark, sf_dir)
    return (
        o.select(
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            F.col("o_custkey").cast("long").alias("o_custkey"),
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank()
            .over(
                Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
            )
            .cast("long")
            .alias("price_rank"),
            F.dense_rank()
            .over(
                Window.partitionBy("o_custkey").orderBy(F.col("o_orderstatus").asc())
            )
            .cast("long")
            .alias("status_drank"),
        )
        .filter(F.col("rn") <= 3)
    )


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead across each customer's order history: previous/next
    order totals and gap-in-days between consecutive orders."""
    o, w = _orders_window(spark, sf_dir)
    return o.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
        F.datediff("o_orderdate", F.lag("o_orderdate", 1).over(w))
        .cast("long")
        .alias("days_since_prev"),
    )


def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — ntile quartiles, percent_rank,
    cume_dist — over each customer's orders by value. Tie-broken on
    the key so both engines rank identically."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering: each order's trailing
    30-day spend per customer (rangeBetween on days since epoch —
    value-based frames, unlike the row-count frames above, include
    ALL rows within the value interval regardless of ties)."""
    o = load_table(spark, sf_dir, "orders")
    day = (F.unix_timestamp(F.col("o_orderdate")) / 86400).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-30, 0)
    )
    return o.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.sum(dec("o_totalprice", 14, 2)).over(w).cast("double").alias("spend_30d"),
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
    )


def window_value_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value window functions: first/last/nth order key in each
    customer's full history (unbounded frame so last/nth see the
    whole partition, not the default running frame)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.first("o_orderkey").over(w).cast("long").alias("first_order"),
        F.last("o_orderkey").over(w).cast("long").alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).cast("long").alias("second_order"),
    )


def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + running count + moving average (3-row frame)
    over each customer's orders — rowsBetween frames."""
    o, w = _orders_window(spark, sf_dir)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    moving3 = w.rowsBetween(-2, Window.currentRow)
    price = dec("o_totalprice", 14, 2)
    return o.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.sum(price).over(running).cast("double").alias("running_total"),
        F.count(F.lit(1)).over(running).alias("order_seq"),
        (
            F.sum(price).over(moving3).cast("double")
            / F.count(F.lit(1)).over(moving3).cast("double")
        ).alias("moving_avg3"),
    )


def topk_per_group_df(
    df: DataFrame, group_col: str, value_col: str, key_col: str, k: int
) -> DataFrame:
    """Per-group top-k, skew-safe form.

    The textbook window (row_number over partitionBy(group)) sorts
    EVERY group member — with a handful of group values over a
    100 TB table that is a few giant skewed sort partitions.
    Instead: phase 1 keeps each input partition's local top-k per
    group (collect_list per (group, partition-id) cell is bounded
    by the partition size, then sort+slice to k); the union of
    local top-ks provably contains the global top-k. Phase 2 runs
    the window over that pruned set — |groups| x partitions x k
    rows, trivially small. Output is identical to the naive window
    and partition-count-invariant (tested against the naive form
    under several repartitionings).

    Tie-break: (value DESC, key ASC) is a total order; the struct
    sorts on (value, -key) DESC so phase 1 agrees with phase 2's
    ordering exactly (key must be numeric)."""
    local = (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy(group_col, "pid")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col(value_col).alias("val"),
                            (-F.col(key_col)).alias("negkey"),
                        )
                    ),
                    asc=False,
                ),
                1,
                k,
            ).alias("top")
        )
        .select(group_col, F.explode("top").alias("t"))
        .select(
            group_col,
            F.col("t.val").alias(value_col),
            (-F.col("t.negkey")).alias(key_col),
        )
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).desc(), F.col(key_col).asc()
    )
    return (
        local.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select(group_col, key_col, value_col, "rn")
    )


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 highest-value orders per priority class via the skew-safe
    two-phase construction above."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_totalprice"),
    )
    return topk_per_group_df(
        o, "o_orderpriority", "o_totalprice", "o_orderkey", k=3
    )
