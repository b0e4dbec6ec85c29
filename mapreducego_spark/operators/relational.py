"""Relational core: projection/filter, every join flavor, aggregation
(basic / distinct / rollup / cube / grouping sets / approx), set ops,
global sort, top-k, dedup, scalar functions.

All of these are the capability closure of the reference's generic
Map/Reduce contract (SURVEY.md §2.B): each is expressible as Map
tagging + hash shuffle + Reduce merge (reference mpWorker/worker.go:
21-22,142-151), and each is implemented here as the native Catalyst
operator instead — declarative, whole-stage-codegen'd, AQE-replanned.

Every function takes (spark, sf_dir) and returns a DataFrame whose
column names match its DuckDB oracle twin in queries.py.

Scale notes (100 TB posture), applied throughout:
- dimension joins (region/nation/part/supplier) are broadcast —
  marked explicitly with F.broadcast so the plan survives stats loss;
- fact-fact joins (orders x lineitem) shuffle on the join key and
  rely on AQE skew splitting;
- aggregates are partial (map-side combine) automatically via
  Catalyst HashAggregate — the combiner the reference never built;
- filters sit directly on scans so they push into parquet
  (PushedFilters), projections prune columns (ReadSchema).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducego_spark.operators.util import davg, dec, dsum
from mapreducego_spark.sources.catalog import load_table


# --- projection / filter ------------------------------------------------


def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight filter + arithmetic projection + global
    agg. The filter pushes to the parquet scan; only 4 columns read."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount").between(0.02, 0.06))
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(dec("l_extendedprice", 12, 2) * dec("l_discount", 4, 2), "revenue", cents=True),
        F.count(F.lit(1)).alias("n_rows"),
    )


def computed_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with computed columns + complex predicate
    (=, <, LIKE, IN, IS NOT NULL, AND/OR) — the Map-that-drops-
    records closure row of SURVEY §2.B."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(
            (F.col("p_size") < 30)
            & F.col("p_type").like("%BRASS%")
            | F.col("p_brand").isin("Brand#1", "Brand#2")
        )
        .filter(F.col("p_name").isNotNull())
        .select(
            F.col("p_partkey").cast("long").alias("p_partkey"),
            F.col("p_brand").alias("brand"),
            F.upper("p_type").alias("type_upper"),
            (dec("p_retailprice", 12, 2) * dec(F.lit(1.1), 4, 2))
            .cast("double")
            .alias("marked_up"),
            (F.col("p_size") * 2 + 1).cast("long").alias("size_calc"),
        )
    )


# --- joins --------------------------------------------------------------


def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join, dims broadcast, facts shuffled.
    revenue per nation for one region + date year."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .groupBy("n_name")
        .agg(
            dsum(
                dec("l_extendedprice", 12, 2)
                * (F.lit(1).cast("decimal(4,2)") - dec("l_discount", 4, 2)),
                "revenue",
                cents=True,
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("n_name")
    )


def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer: every customer, their order count + total (0/null
    preserved for customers without orders)."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        cu.join(o, cu.c_custkey == o.o_custkey, "left")
        .groupBy(F.col("c_custkey").cast("long").alias("c_custkey"))
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum(dec("o_totalprice", 14, 2), "total_spent"),
        )
    )


def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer: high-value orders RIGHT JOIN customer — every
    customer preserved, null-extended where no order matches (the
    mirror of join_left_outer; SURVEY §2.B joins row "left/right/full
    outer"). Same scale shape as a left join: one shuffle on the key,
    the preserved side streams."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return (
        o.join(cu, o.o_custkey == cu.c_custkey, "right")
        .groupBy(F.col("c_custkey").cast("long").alias("c_custkey"))
        .agg(
            F.count("o_orderkey").alias("n_big_orders"),
            dsum(dec("o_totalprice", 14, 2), "total_big"),
        )
    )


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of per-nation customer and supplier counts —
    nations may appear on either side only."""
    cu = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    c_agg = cu.groupBy(F.col("c_nationkey").cast("long").alias("nk_c")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    s_agg = su.groupBy(F.col("s_nationkey").cast("long").alias("nk_s")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return c_agg.join(s_agg, c_agg.nk_c == s_agg.nk_s, "full").select(
        F.coalesce("nk_c", "nk_s").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi: customers having at least one high-value order.
    Semi avoids the duplicate-multiplying inner join + distinct."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cu.join(o, cu.c_custkey == o.o_custkey, "left_semi").select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        F.col("c_name").alias("c_name"),
    )


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti: customers with no high-value order (the classic
    NOT EXISTS; exact complement of join_semi). Reduce-emits-iff-
    absent in MapReduce terms."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cu.join(o, cu.c_custkey == o.o_custkey, "left_anti").select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        F.col("c_mktsegment").alias("c_mktsegment"),
    )


def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast (map-side) join: lineitem x part. The Spark
    analog of the reference shipping its small .so to every worker
    (reference mpMaster/master.go:258-273) — ship the small side,
    never shuffle the big side."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum(dec("l_quantity", 12, 2), "sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("p_brand")
    )


def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join: equi key + inequality residual
    (l_quantity > p_size on the matching part). Catalyst plans the
    equi part as the join key and the inequality as a post-join
    filter — the scalable form of a theta join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(
            F.broadcast(p),
            (li.l_partkey == p.p_partkey) & (li.l_quantity > p.p_size),
        )
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_over"))
        .orderBy("p_brand")
    )


# --- aggregation --------------------------------------------------------


def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: the canonical partial-agg workload. Map-side combine
    (Catalyst partial HashAggregate) shrinks the shuffle to
    |groups| x |partitions| rows — the combiner optimization the
    reference's per-bucket sort hints at but never implements
    (reference worker.go:153-192)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice", 12, 2) * (
        F.lit(1).cast("decimal(4,2)") - dec("l_discount", 4, 2)
    )
    charge = disc_price * (F.lit(1).cast("decimal(4,2)") + dec("l_tax", 4, 2))
    # The two product sums carry scale 4/6 decimals; their exact sums
    # are engine-identical, but DECIMAL->DOUBLE conversion is only
    # correctly rounded by every engine while the scaled integer fits
    # 2^53 — at sf1 a scale-6 sum is 17 digits and DuckDB's int/10^6
    # conversion drifts one ulp from Spark's. Rounding the SUM to
    # cents first keeps the conversion a single exact-integer/100
    # division everywhere (sound up to sums of ~9e13).
    return (
        li.filter(F.col("l_shipdate") <= "2001-06-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec("l_quantity", 12, 2), "sum_qty"),
            dsum(dec("l_extendedprice", 12, 2), "sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            davg(dec("l_quantity", 12, 2), "avg_qty"),
            davg(dec("l_extendedprice", 12, 2), "avg_price"),
            davg(dec("l_discount", 4, 2), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum/avg/min/max/count + countDistinct per market segment."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(cu, o.o_custkey == cu.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            dsum(dec("o_totalprice", 14, 2), "sum_price"),
            davg(dec("o_totalprice", 14, 2), "avg_price"),
            F.min(dec("o_totalprice", 14, 2)).cast("double").alias("min_price"),
            F.max(dec("o_totalprice", 14, 2)).cast("double").alias("max_price"),
        )
        .orderBy("c_mktsegment")
    )


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over nation -> segment with GROUPING id for subtotal
    disambiguation (a null key vs a rollup total)."""
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    return (
        cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum(dec("c_acctbal", 14, 2), "sum_acctbal"),
            F.grouping_id("n_name", "c_mktsegment").cast("long").alias("gid"),
        )
    )


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over orderstatus x orderpriority."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(dec("o_totalprice", 14, 2), "sum_price"),
            F.grouping_id("o_orderstatus", "o_orderpriority")
            .cast("long")
            .alias("gid"),
        )
    )


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((status), (priority)) via SQL — the
    general form rollup/cube specialize."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB answer to
    countDistinct's full shuffle. HLL sketches merge associatively,
    so the combine is map-side and tiny. No SQL oracle (sketch
    estimates are engine-specific); the driver rows-only checks it,
    and tests assert relative error vs exact."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )


def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per priority, one column per order status.
    Explicit pivot values keep the plan single-pass (without them
    Spark first runs a distinct scan to discover columns)."""
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        *[F.coalesce(F.col(s), F.lit(0)).cast("long").alias(f"n_{s}") for s in "FOP"],
    )


def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide part metrics to (key, metric, value)
    long form — the inverse of pivot, one narrow scan, no shuffle."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    wide = p.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").cast("double").alias("retailprice"),
    )
    return wide.unpivot(
        ["p_partkey"], ["size", "retailprice"], "metric", "metric_value"
    )


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation) of order value per
    market segment. Exact percentile is a full sort per group — the
    approx twin below is the 100 TB path."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    j = o.join(cu, o.o_custkey == cu.c_custkey)
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.25)), 6).alias("p25"),
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.75)), 6).alias("p75"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (t-digest-style sketch): mergeable partial
    sketches make this one map-side-combined shuffle of O(sketch)
    rows — the scale answer to exact percentile's per-group sort.
    No SQL oracle (sketch estimates are engine-specific); tests
    assert relative error vs the exact percentiles."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(1000)).alias(
            "approx_p50"
        ),
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("exact_p50"),
    )


def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... HAVING: post-aggregation predicate (a filter above
    the Aggregate node — Catalyst cannot push it below, by design)."""
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    return (
        cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum(dec("c_acctbal", 14, 2), "sum_acctbal"),
        )
        .filter(F.col("n_customers") > 50)
    )


def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: aggregation OVER an aggregation — customers
    histogrammed by how many orders they placed (left join keeps
    zero-order customers in the 0 bucket). Two shuffles, both
    map-side combined; the classic distribution query."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        cu.join(o, cu.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.col("n_orders").asc())
    )


def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL surface: orders
    whose value exceeds 1.5x their customer's average. Catalyst
    decorrelates this into an aggregate + join — asserted by the
    no-cartesian plan test, and the same rewrite a user would
    otherwise hand-write."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq")
    return spark.sql(
        """
        SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
               CAST(o_custkey AS BIGINT) AS o_custkey,
               o_totalprice
        FROM orders_sq o
        WHERE o_totalprice > (
            SELECT 1.5 * AVG(o2.o_totalprice)
            FROM orders_sq o2
            WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argument aggregates: max_by/min_by (which row held the
    extreme), count_if, bool_or/bool_and — one pass, map-side
    combined, no window needed. The ordering key is a zero-padded
    (price-cents, orderkey) string so ties resolve identically in
    any engine (bare max_by on a tied price is nondeterministic)."""
    o = load_table(spark, sf_dir, "orders")
    cents = (dec("o_totalprice", 14, 2) * 100).cast("bigint")
    ordkey = F.concat(
        F.lpad(cents.cast("string"), 12, "0"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
    )
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.max_by("o_orderkey", ordkey).cast("long").alias("best_order"),
            F.min_by("o_orderkey", ordkey).cast("long").alias("worst_order"),
            F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_huge"),
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        )
        .orderBy("o_orderstatus")
    )


def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregates surfaced deterministically: sorted
    collect_list / collect_set joined to strings (a shuffle of values
    into one row per group — bounded here by the 5-region dimension;
    at scale only safe for low-cardinality groups)."""
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    return (
        na.join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.size(F.collect_set("n_name")).cast("long").alias("n_nations"),
        )
        .orderBy("r_name")
    )


def null_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling scalar surface: coalesce/nullif/nvl2/ifnull plus
    null-safe equality, driven off a left join that actually produces
    nulls (customers without qualifying orders)."""
    cu = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    j = cu.join(o, cu.c_custkey == o.o_custkey, "left")
    return j.select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        F.coalesce(F.col("n_big"), F.lit(0)).cast("long").alias("big_or_zero"),
        F.nullif(F.coalesce(F.col("n_big"), F.lit(0)), F.lit(0))
        .cast("long")
        .alias("big_or_null"),
        F.when(F.col("n_big").isNull(), "none").otherwise("some").alias("has_big"),
        (F.col("n_big").eqNullSafe(F.lit(1))).alias("exactly_one"),
    )


def explode_outer_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer (lateral fan-out preserving empty arrays as one
    null row) over the tokenized part name — vs plain explode, rows
    with no elements survive."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    # BRASS-only words; parts without any produce an empty array
    brass_words = F.filter(
        F.split(F.col("p_type"), " "), lambda w: w == F.lit("BRASS")
    )
    return p.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        F.explode_outer(brass_words).alias("word"),
    )


# --- set operations -----------------------------------------------------


def _nation_keys(spark, sf_dir: str, table: str, col: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, table)
        .select(F.col(col).cast("long").alias("nationkey"))
    )


def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of customer and supplier nation keys."""
    return (
        _nation_keys(spark, sf_dir, "customer", "c_nationkey")
        .union(_nation_keys(spark, sf_dir, "supplier", "s_nationkey"))
        .distinct()
    )


def set_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL preserved-duplicates semantics, aggregated to be
    hash-comparable."""
    u = _nation_keys(spark, sf_dir, "customer", "c_nationkey").unionAll(
        _nation_keys(spark, sf_dir, "supplier", "s_nationkey")
    )
    return u.groupBy("nationkey").agg(F.count(F.lit(1)).alias("n_rows"))


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _nation_keys(spark, sf_dir, "customer", "c_nationkey").intersect(
        _nation_keys(spark, sf_dir, "supplier", "s_nationkey")
    )


def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiplicity-preserving), aggregated to counts
    so the result is hash-comparable."""
    return (
        _nation_keys(spark, sf_dir, "customer", "c_nationkey")
        .intersectAll(_nation_keys(spark, sf_dir, "supplier", "s_nationkey"))
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _nation_keys(spark, sf_dir, "customer", "c_nationkey").exceptAll(
        _nation_keys(spark, sf_dir, "supplier", "s_nationkey")
    ).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n_rows"))


def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on a projection (exact row dedup)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").dropDuplicates()


# --- sort / limit -------------------------------------------------------


def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global total-order sort (range-partitioned exchange — Spark
    samples ranges so output partitions are balanced; the closure's
    range-partition variant of the reference's per-bucket sort)."""
    su = load_table(spark, sf_dir, "supplier")
    return su.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey").asc()).select(
        F.col("s_suppkey").cast("long").alias("s_suppkey"),
        "s_name",
        F.col("s_acctbal").alias("s_acctbal"),
    )


def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: orderBy + limit compiles to TakeOrderedAndProject —
    per-partition top-k then a k-row merge on the driver; no global
    sort materialized. Deterministic tie-break on the key."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select(
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            "o_totalprice",
        )
    )


# --- scalar functions ---------------------------------------------------


def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String / date / math scalar coverage in one projection —
    all JVM built-ins inside whole-stage codegen."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") < 2000).select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.lower("o_orderstatus").alias("status_lower"),
        F.trim(F.concat(F.lit("  "), F.col("o_orderpriority"), F.lit(" "))).alias(
            "prio_trim"
        ),
        F.substring("o_orderpriority", 1, 3).alias("prio_sub"),
        F.regexp_replace("o_orderpriority", "[0-9]", "#").alias("prio_masked"),
        F.length("o_orderpriority").cast("long").alias("prio_len"),
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("o_day"),
        F.date_format("o_orderdate", "yyyy-MM").alias("o_ym"),
        F.round(F.sqrt(F.abs(F.col("o_totalprice"))), 6).alias("price_sqrt"),
        F.round(F.log(F.col("o_totalprice") + 1.0), 6).alias("price_log"),
        (F.col("o_orderkey") % 7).cast("long").alias("key_mod"),
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("price_band"),
    )


def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type scalar functions (SURVEY §2.B scalar row: map):
    create_map / map_from_arrays / map_concat / map_keys / map_values
    / element_at / size — all JVM built-ins inside codegen. Scalars
    are extracted back out of the maps before output so the oracle
    compares engine-portable scalar columns, not map renderings."""
    o = load_table(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("prio"), F.col("o_orderpriority"),
    )
    m2 = F.map_from_arrays(
        F.array(F.lit("band")),
        F.array(F.when(F.col("o_totalprice") > 150000, "big").otherwise("small")),
    )
    merged = F.map_concat(m, m2)
    return o.filter(F.col("o_orderkey") < 1000).select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.element_at(m, F.lit("status")).alias("m_status"),
        F.element_at(m, F.lit("prio")).alias("m_prio"),
        F.element_at(m, F.lit("missing")).alias("m_missing"),
        F.size(merged).cast("long").alias("m_size"),
        F.array_join(F.map_keys(merged), ",").alias("m_keys"),
        F.array_join(F.map_values(merged), ",").alias("m_vals"),
        F.element_at(merged, F.lit("band")).alias("m_band"),
    )


def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar coverage: split/size/contains/sort/slice/flatten/
    sequence plus a higher-order aggregate fold — all JVM-side
    (SURVEY §2.B scalar row: array)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    words = F.split(F.col("p_type"), " ")
    return p.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        F.size(words).cast("long").alias("n_words"),
        F.array_contains(words, "BRASS").alias("has_brass"),
        F.array_join(F.sort_array(words), ",").alias("sorted_words"),
        F.array_join(F.slice(words, 1, 2), ",").alias("first_two"),
        F.size(F.flatten(F.array(words, words))).cast("long").alias("n_doubled"),
        # fold: sum 1..p_size via aggregate over sequence
        F.aggregate(
            F.sequence(F.lit(1), F.col("p_size")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("tri_sum"),
    )


def string_functions2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string scalar coverage: pad/translate/repeat/reverse/
    ascii/levenshtein/regexp_extract_all (SURVEY §2.B scalar row)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        F.lpad("p_brand", 12, "*").alias("brand_lpad"),
        F.rpad("p_brand", 12, ".").alias("brand_rpad"),
        F.translate("p_brand", "#", "-").alias("brand_trans"),
        F.repeat(F.lit("ab"), 3).alias("rep_ab"),
        F.reverse("p_brand").alias("brand_rev"),
        F.ascii("p_name").cast("long").alias("name_ascii"),
        F.levenshtein("p_brand", F.lit("Brand#00")).cast("long").alias("lev_dist"),
        F.array_join(
            F.regexp_extract_all("p_type", F.lit("[A-Z]+"), 0), ","
        ).alias("caps_runs"),
    )


def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date scalar coverage: add/diff/trunc/last_day/quarter/
    weekofyear/dayofweek (SURVEY §2.B scalar row: date)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.date_add(d, 30).cast("string").alias("plus_30d"),
        F.add_months(d, 2).cast("string").alias("plus_2m"),
        F.datediff(F.lit("1998-12-31").cast("date"), d)
        .cast("long")
        .alias("days_to_eoy"),
        F.last_day(d).cast("string").alias("month_end"),
        F.date_trunc("quarter", d).cast("date").cast("string").alias("q_start"),
        F.quarter(d).cast("long").alias("qtr"),
        F.weekofyear(d).cast("long").alias("iso_week"),
        F.dayofweek(d).cast("long").alias("dow"),
    )


def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction on events.props (get_json_object) +
    array/explode surface via a split of event_type chars."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.col("event_id").cast("long").alias("event_id"),
            F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
            F.col("event_type"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("prop_k").cast("long").alias("sum_k"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: the canonical selective 3-way star join.
    Physical plan the 100 TB posture wants: both fact filters push to
    the parquet scans BEFORE the joins; the filtered customer dim
    (1/5 of customers, keys only) is broadcast so the orders-side
    join is map-side; only the lineitem-orders join shuffles; the
    final top-10 is TakeOrderedAndProject, never a global sort."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1997-01-01"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1997-01-01"
    )
    revenue = dec("l_extendedprice", 12, 2) * (
        F.lit(1).cast("decimal(4,2)") - dec("l_discount", 4, 2)
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, "revenue", cents=True))
        .select(
            F.col("l_orderkey").cast("long").alias("l_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(
            F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey")
        )
        .limit(10)
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue in a quarter.
    lineitem('R') |><| orders(quarter) is the one big shuffle join;
    the customer join is left unhinted — after the two fact filters
    the probe side is small enough that AQE picks broadcast-vs-
    shuffle per run (the right call depends on the quarter's volume,
    not on a compile-time guess); nation (25 rows) is explicitly
    broadcast. Top-20 via TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    revenue = dec("l_extendedprice", 12, 2) * (
        F.lit(1).cast("decimal(4,2)") - dec("l_discount", 4, 2)
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(revenue, "revenue", cents=True))
        .select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            "c_name",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics (variance/stddev/covariance/corr) per
    return flag, computed from the six algebraic partials
    (n, Σx, Σx², Σy, Σy², Σxy) instead of Spark's built-in
    var_samp/corr.

    Why not the built-ins: their merge order is partition-dependent,
    so the low bits drift run-to-run AND engine-to-engine. The
    partials are exact DECIMAL sums (order-independent), and every
    derived value is a fixed IEEE expression over their double casts
    — bit-identical in Spark and DuckDB (util.py preamble). Bonus:
    the six sums partial-aggregate map-side, so the shuffle carries
    |flags| x |partitions| rows — the same single-pass shape the
    built-ins use, with none of their nondeterminism.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = dec("l_quantity", 18, 2)
    y = dec("l_extendedprice", 18, 2)
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n = F.col("n_rows").cast("double")
    sx, sxx = F.col("sx"), F.col("sxx")
    sy, syy = F.col("sy"), F.col("syy")
    sxy = F.col("sxy")
    # fixed-shape numerators: (n*Σx² - Σx*Σx) etc.; the oracle SQL
    # spells the identical expression tree so IEEE rounding agrees
    var_x = (n * sxx - sx * sx) / (n * (n - F.lit(1.0)))
    var_y = (n * syy - sy * sy) / (n * (n - F.lit(1.0)))
    cov = (n * sxy - sx * sy) / (n * (n - F.lit(1.0)))
    corr = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return g.select(
        "l_returnflag",
        "n_rows",
        (sx / n).alias("mean_qty"),
        var_x.alias("var_qty"),
        F.sqrt(var_x).alias("std_qty"),
        (sy / n).alias("mean_price"),
        var_y.alias("var_price"),
        cov.alias("covar_qty_price"),
        corr.alias("corr_qty_price"),
    ).orderBy("l_returnflag")


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): aggregate-then-join.

    The lineitem pre-aggregation runs BEFORE any join — at 100 TB
    that is the difference between shuffling the whole fact table
    through a join and shuffling |qualifying orders| rows. The
    HAVING filter lands on the agg output (Catalyst keeps it above
    the partial agg, so the map-side combine still applies); the
    orders join then sees only qualifying keys, and the customer
    join is AQE-decided on the post-filter size. Top-100 is
    TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(dec("l_quantity", 12, 2), "sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            F.col("c_custkey").cast("long").alias("c_custkey"),
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.col("o_totalprice").alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where the customer and the
    supplier share that nation. Five joins, one of them a residual
    equality (c_nationkey = s_nationkey) that Catalyst folds into
    the supplier join condition rather than a post-join filter.
    nation is broadcast (25 rows); supplier and customer are left to
    AQE. The year filter pushes to the orders scan; everything else
    is key-pruned through the joins."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    revenue = dec("l_extendedprice", 12, 2) * (
        F.lit(1).cast("decimal(4,2)") - dec("l_discount", 4, 2)
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue", cents=True))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS subquery decorrelated to a left-semi
    join with a non-equi residual — count orders per priority over a
    quarter where at least one lineitem shipped after the order date.
    The semi join never widens rows (probe side only), the quarter
    filter pushes to the orders scan, and the lineitem side is
    pruned to (l_orderkey, l_shipdate) — two columns of the fact
    table regardless of its width."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between a nation pair, by year and
    direction. The two nation dims are filtered to the pair BEFORE
    joining (selective broadcast — 2 rows each), which key-prunes
    supplier and customer down to two nations' worth before the
    fact-fact joins; the residual pair predicate (either direction,
    but not same-nation) lands after both enrichments. One shuffle
    per fact-fact join, dims all broadcast."""
    pair = ("NATION_3", "NATION_7")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    n1 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    volume = dec("l_extendedprice", 12, 2) * (
        F.lit(1).cast("decimal(4,2)") - dec("l_discount", 4, 2)
    )
    # Enrich the dims with their nation BEFORE the fact joins: the
    # 2-row broadcast prunes supplier/customer to ~2/25 of their rows
    # first, so the big lineitem/orders joins build against the
    # pre-filtered sides (Catalyst won't reorder this without CBO
    # stats, so the composition order IS the optimization).
    s_pair = s.join(F.broadcast(n1), s.s_nationkey == F.col("s_nkey"))
    c_pair = c.join(F.broadcast(n2), c.c_nationkey == F.col("c_nkey"))
    return (
        li.join(s_pair, li.l_suppkey == s_pair.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c_pair, o.o_custkey == c_pair.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dsum(volume, "volume", cents=True))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotion revenue share for one month —
    conditional aggregation over a broadcast part join. Both sums are
    exact DECIMAL partials; the percentage is computed as one fixed
    IEEE double expression tree ((promo * 100) / total) so the oracle
    reproduces it bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = load_table(spark, sf_dir, "part")
    revenue = dec("l_extendedprice", 12, 2) * (
        F.lit(1).cast("decimal(4,2)") - dec("l_discount", 4, 2)
    )
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(
        F.lit(0).cast("decimal(16,4)")
    )
    agg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            dsum(promo, "promo_revenue", cents=True),
            dsum(revenue, "total_revenue", cents=True),
        )
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (
            F.col("promo_revenue").cast("double")
            * F.lit(100.0)
            / F.col("total_revenue").cast("double")
        ).alias("promo_pct"),
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from an OR of conjunctive predicate
    branches spanning both sides of a part-lineitem join. The
    textbook scale trap: the OR references both tables, so naively it
    cannot push down and every row joins first. Fix is the manual CNF
    factoring Q19 is famous for: the part-only disjunct
    (brand x size bands) and the lineitem-only disjunct (quantity
    envelope) are derived and applied as scan-level prefilters —
    semantics unchanged because the full branch predicate still
    applies post-join — so the join sees two pre-pruned inputs and
    the broadcast side stays small."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    b1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#4")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    # Derived single-side prefilters (the CNF push-down):
    p_pre = p.filter(
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 15))
    )
    li_pre = li.filter(F.col("l_quantity").between(1, 30))
    revenue = dec("l_extendedprice", 12, 2) * (
        F.lit(1).cast("decimal(4,2)") - dec("l_discount", 4, 2)
    )
    return (
        li_pre.join(F.broadcast(p_pre), li_pre.l_partkey == p_pre.p_partkey)
        .filter(b1 | b2 | b3)
        .agg(
            dsum(revenue, "revenue", cents=True),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


def q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution — the
    canonical outer-join-then-re-aggregate query (reference closure:
    a two-stage MapReduce chain, here two Catalyst aggregates).

    The priority filter stands in for Q13's o_comment NOT LIKE (the
    fixture carries no comment column) and is applied to the orders
    side BEFORE the left outer join — equivalent to putting it in the
    join condition, and it pushes to the parquet scan. The custkey
    aggregate reuses the join's hash partitioning (no second
    exchange); the distribution aggregate shuffles a |distinct
    counts|-sized input, which is tiny at any scale."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q22_cold_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers gone cold — scalar
    aggregate subquery + anti join. The market segments stand in for
    Q22's phone country codes (no c_phone in the fixture), and "cold"
    is no order since 2000 (every fixture customer has SOME order, so
    the literal never-ordered set is empty; Q22's own semantic is
    "no orders in 7 years").

    Scale shape: the global average is ONE row computed with a
    map-side-combined aggregate and broadcast-cross-joined into the
    filter (no correlated re-scan per row); the "gone cold" test is a
    left anti join shuffled on custkey against the date-pruned orders
    scan — probe-side only, never widens. The average is an exact
    DECIMAL sum divided once in double, so DuckDB reproduces the
    threshold bit-for-bit."""
    segs = ("BUILDING", "AUTOMOBILE", "MACHINERY")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin(*segs)
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01"
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(davg(dec("c_acctbal", 12, 2), "avg_bal"))
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal").cast("double") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            dsum(dec("c_acctbal", 12, 2), "totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone held up a multi-supplier
    order (late = shipped after the order date; the fixture has no
    commit/receipt dates). The textbook form is EXISTS(another
    supplier) AND NOT EXISTS(another LATE supplier) — two correlated
    subqueries over the fact table.

    Scale rewrite: both correlated tests collapse into a two-level
    Expand-free aggregation — per-(order, supplier) partials (any
    late? how many late lines?) then per-order counts. The naive
    pair of countDistinct aggregates plans an Expand (2x every fact
    row before the shuffle); the two-level form map-side combines
    both stages instead. Qualifying orders (>=2 suppliers, exactly 1
    late) join back to the per-pair aggregate — NOT the fact table —
    on the same key, and both consumers hang off the one shared
    per-pair subtree, so nothing correlated re-executes per row. The
    DuckDB oracle intentionally keeps the textbook EXISTS/NOT-EXISTS
    form, so the hash match proves the rewrite's equivalence."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    lines = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("l_orderkey").cast("long").alias("okey"),
            F.col("l_suppkey").cast("long").alias("skey"),
            (F.col("l_shipdate") > F.col("o_orderdate")).alias("late"),
        )
    )
    per_pair = lines.groupBy("okey", "skey").agg(
        F.max("late").alias("any_late"),
        F.sum(F.when(F.col("late"), 1).otherwise(0)).cast("long").alias("n_late_lines"),
    )
    per_order = per_pair.groupBy("okey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.col("any_late").cast("int")).alias("n_late_supp"),
    )
    sole_late = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    ).select("okey")
    return (
        per_pair.filter(F.col("any_late"))
        .join(sole_late, "okey")
        .join(F.broadcast(s), F.col("skey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's PROMO trade
    volume, by order year — the widest star in the suite (lineitem x
    part x orders x customer x supplier x nation x nation x region).

    Scale shape: every dimension is broadcast; the customer side is
    REDUCED FIRST with a left-semi against the region's nations (a
    5-row broadcast) so the fact-fact joins build against pre-pruned
    inputs; the two fact shuffles (orders, customer keys) are the
    only exchanges. The share divides two exact-DECIMAL sums once in
    double — the q14 bit-stability pattern."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n_cust = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("cn_key")
    )
    n_supp = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    c_eu = c.join(F.broadcast(n_cust), c.c_nationkey == F.col("cn_key"), "left_semi")
    volume = dec("l_extendedprice", 12, 2) * (
        F.lit(1).cast("decimal(4,2)") - dec("l_discount", 4, 2)
    )
    nation_volume = F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(
        F.lit(0).cast("decimal(16,4)")
    )
    agg = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c_eu, o.o_custkey == c_eu.c_custkey, "left_semi")
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_supp), s.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            dsum(nation_volume, "nation_volume", cents=True),
            dsum(volume, "total_volume", cents=True),
        )
    )
    return agg.select(
        "o_year",
        "nation_volume",
        "total_volume",
        (F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
    ).orderBy("o_year")


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders — the
    canonical correlated AVG subquery (l_quantity < 0.2 x that part's
    average), decorrelated to one per-part aggregate joined back.

    Scale shape: the brand filter broadcasts into the fact scan
    FIRST, so both the per-part average and the probe side run over
    the brand's sliver of the fact table; the join-back input is
    |brand parts| rows (AQE broadcasts it). The threshold is an
    exact-DECIMAL sum divided once in double then scaled — the
    correlated AVG in the DuckDB oracle uses the identical
    expression tree, so the comparison is bit-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    lp = li.join(
        F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey")
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    per_part = lp.groupBy("l_partkey").agg(
        (
            (
                F.sum(dec("l_quantity", 12, 2)).cast("double")
                / F.count(F.lit(1)).cast("double")
            )
            * F.lit(0.2)
        ).alias("qty_threshold")
    )
    return (
        lp.join(per_part, "l_partkey")
        .filter(F.col("l_quantity").cast("double") < F.col("qty_threshold"))
        .agg(
            (F.sum(dec("l_extendedprice", 12, 2)).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue increase from dropping discounts in a
    band — the pure scan-predicate aggregate.

    Scale shape: the simplest and most scan-bound query in the suite;
    its entire point is pushdown. All three predicates reach the
    parquet scan (plan-gated in pytest) and the only exchange is the
    one-row partial-aggregate merge, so a 100 TB run is I/O-bound on
    the pruned scan. Revenue is an exact-DECIMAL sum surfaced as
    double; the discount band compares the raw doubles with identical
    literals on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1996-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        dsum(dec("l_extendedprice", 12, 2) * dec("l_discount", 4, 2), "revenue", cents=True),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly
    revenue — the arg-max-with-ties pattern (revenue view + scalar
    MAX subquery in the textbook form).

    Scale shape: one shuffle builds the per-supplier revenue
    aggregate; the global MAX is a one-row aggregate over that
    already-tiny result, broadcast back as an equi-join filter — no
    second scan of the fact table and no single-partition global
    window. The equality compares exact DECIMAL sums, so the
    ties-preserved semantics are deterministic cross-engine; the
    supplier dimension is broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    volume = dec("l_extendedprice", 12, 2) * (
        F.lit(1).cast("decimal(4,2)") - dec("l_discount", 4, 2)
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(volume).alias("rev_dec"))
    mx = rev.agg(F.max("rev_dec").alias("mx"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), F.col("rev_dec") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def profile_table(
    spark: SparkSession, sf_dir: str, approx: bool = False
) -> DataFrame:
    """Registry entry: one-pass-per-column table profiler — row
    count, non-null count, distinct count, min/max — over a
    representative lineitem column set (numeric, string, timestamp),
    unioned into one uniform (col, n_rows, n_nonnull, n_distinct,
    min_s, max_s) result. The ingestion-QA primitive every pipeline
    runs before trusting a new drop of data.

    ``approx=True`` swaps exact countDistinct for
    approx_count_distinct (HLL++, default rsd 5%) — at 100 TB this
    is the mode to run: exact distinct on a high-cardinality column
    shuffles every distinct value; the HLL sketch is a fixed few KB
    per column merged map-side, so the whole profile stays one
    scan-plus-scalar per column at any table size. A profiler feeds
    sanity thresholds ("distinct count dropped 40% since yesterday"),
    not accounting, so 5% error is the right default trade; exact
    stays available (and is what the registry's oracle row runs,
    since a sketch has no SQL twin).

    Scale shape: one independent single-row aggregate PER COLUMN
    (then a union of 5 one-row results) instead of one aggregate
    with 5 count_distincts — the latter plans an Expand that
    multiplies every scan row by the number of distinct-aggregate
    branches before the shuffle; per-column jobs each scan exactly
    one column (columnar pruning) and map-side-combine to one row.
    Min/max surface as strings via DECIMAL(18,2) / yyyy-MM-dd so the
    rendering is engine-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    n_distinct = F.approx_count_distinct if approx else F.countDistinct

    def col_profile(c: str, kind: str) -> DataFrame:
        v = F.col(c)
        if kind == "num":
            mn = F.min(v).cast("decimal(18,2)").cast("string")
            mx = F.max(v).cast("decimal(18,2)").cast("string")
        elif kind == "ts":
            mn = F.date_format(F.min(v), "yyyy-MM-dd")
            mx = F.date_format(F.max(v), "yyyy-MM-dd")
        else:
            mn, mx = F.min(v), F.max(v)
        return li.select(v).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(v).alias("n_nonnull"),
            n_distinct(v).alias("n_distinct"),
            mn.alias("min_s"),
            mx.alias("max_s"),
        ).select(F.lit(c).alias("col"), "*")

    parts = [
        col_profile("l_quantity", "num"),
        col_profile("l_extendedprice", "num"),
        col_profile("l_discount", "num"),
        col_profile("l_returnflag", "str"),
        col_profile("l_shipdate", "ts"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("col")


def nest_order_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested denormalization: one row per order embedding its line
    items as a DETERMINISTICALLY ordered array — the write-side shape
    for document stores, feature stores, and training-example
    assembly (an order + its lines as one JSON-able record).

    The correctness trap this entry pins down: collect_list's element
    order is whatever order the shuffle delivered — nondeterministic
    across runs, partitionings, and task retries — so any
    hash-compared, content-addressed, or diff-able nested output MUST
    impose its own order. sort_array over structs whose first field
    is the intended sort key does that entirely JVM-side. The array
    is serialized to a flat "ln:qty,..." string so the oracle compare
    is byte-exact (engines disagree on nested-value rendering, not on
    strings)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    nested = (
        li.select(
            F.col("l_orderkey").cast("long").alias("o_orderkey"),
            F.struct(
                F.col("l_linenumber").cast("int").alias("ln"),
                F.col("l_quantity").cast("long").alias("qty"),
            ).alias("item"),
        )
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("item.qty")).alias("total_qty"),
            F.sort_array(F.collect_list("item")).alias("items_arr"),
        )
    )
    items = F.array_join(
        F.transform(
            F.col("items_arr"),
            lambda x: F.concat_ws(
                ":", x["ln"].cast("string"), x["qty"].cast("string")
            ),
        ),
        ",",
    )
    return (
        nested.join(o, "o_orderkey")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.col("n_lines").cast("long").alias("n_lines"),
            F.col("total_qty").cast("long").alias("total_qty"),
            items.alias("items"),
        )
        .orderBy("o_orderkey")
    )


def copurchase_pairs(
    spark: SparkSession, sf_dir: str, minsup: int = 3, max_basket: int = 1_000
) -> DataFrame:
    """Frequent co-purchase pairs (market-basket analysis, the
    A-priori first join): parts appearing together in at least
    ``minsup`` distinct orders. The classic MapReduce association
    primitive, and the recommendation backbone ("bought together").

    Scale shape: the within-basket self-join costs sum-of-C(b,2)
    over basket sizes b — bounded here two ways. (1) Downward
    closure (A-priori): an item in fewer than ``minsup`` baskets
    cannot appear in any frequent pair, so infrequent items are
    pruned BEFORE pair generation — exact, and on long-tailed real
    catalogs it removes most of the candidate space. (2) A basket
    over ``max_basket`` items raises in-plan via guard_limit (a
    10k-item basket alone is 50M pairs) rather than melting down."""
    from mapreducego_spark.operators.util import guard_limit

    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    # (1) A-priori item prefilter: exact by downward closure
    freq_items = (
        baskets.groupBy("p")
        .agg(F.count(F.lit(1)).alias("__sup"))
        .filter(F.col("__sup") >= minsup)
        .select("p")
    )
    baskets = baskets.join(freq_items, "p")
    # Pair generation rewritten off the self-join (r17, guide §2.3/
    # §2.4): collect each basket's sorted item list ONCE (the same
    # exchange the old plan paid anyway), emit the C(b,2) ordered
    # pairs in-plan via nested array transforms (codegen, no Python),
    # and feed them straight into the partial-combined support
    # aggregate. The old shape exchanged the basket rows TWICE more
    # (both self-join sides) plus an eager checkpoint; this one
    # shuffles each basket row once and the pairs once — strictly
    # fewer bytes at any scale, identical output (the size guard now
    # reads the collected list's length — same count, same message).
    # Guard placement note (r17 ADVICE, low): the guard reads the
    # COLLECTED list's size, so a pathological basket is buffered
    # (linearly — b longs, not C(b,2) pairs) in the aggregation
    # buffer before the guard raises. A pre-aggregation count guard
    # would bound that buffering too, but costs a second full
    # exchange + aggregate of the basket rows — the exact cost the
    # r17 rewrite removed. The quadratic meltdown the guard exists
    # to stop is the PAIR explosion, which still cannot start: the
    # explode only runs on rows the guard already passed.
    lists = (
        baskets.groupBy("o")
        .agg(F.sort_array(F.collect_list("p")).alias("ps"))
        .filter(
            guard_limit(
                F.size("ps"),
                max_basket,
                F.lit(
                    f"copurchase_pairs: basket over {max_basket} items goes "
                    "quadratic; cap or sample hot baskets"
                ),
            )
        )
    )
    pairs = lists.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ps",
                    lambda x, i: F.transform(
                        F.slice("ps", i + F.lit(2), F.size("ps")),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("pr")
    )
    return (
        pairs.groupBy(
            F.col("pr.a").alias("part_a"), F.col("pr.b").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= minsup)
        .select(
            F.col("part_a").cast("long").alias("part_a"),
            F.col("part_b").cast("long").alias("part_b"),
            F.col("support").cast("long").alias("support"),
        )
        .orderBy("part_a", "part_b")
    )


def outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier profiling per group — the standard
    data-cleaning sweep (flag values outside [p25 - 1.5*IQR,
    p75 + 1.5*IQR]) run as the two-pass plan that survives scale:
    pass 1 computes exact per-group quartiles (|groups| rows), pass 2
    re-scans the fact with the fences broadcast-joined back — the
    same shape as quality_gate_per_lang, so the big table is never
    shuffled for the second pass.

    Determinism: quartiles are rounded to 6 decimals BEFORE fence
    arithmetic, so both engines compare against bit-identical
    bounds; all counts are longs."""
    ev = load_table(spark, sf_dir, "events")
    fences = (
        ev.groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.25)), 6).alias("p25"),
            F.round(F.percentile("value", F.lit(0.75)), 6).alias("p75"),
        )
        .select(
            "event_type",
            "p25",
            "p75",
            (F.col("p25") - 1.5 * (F.col("p75") - F.col("p25"))).alias("lo"),
            (F.col("p75") + 1.5 * (F.col("p75") - F.col("p25"))).alias("hi"),
        )
    )
    return (
        ev.join(F.broadcast(fences), "event_type")
        .groupBy("event_type", "p25", "p75", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")))
                .cast("long")
            ).alias("n_outliers"),
        )
        .select(
            "event_type", "p25", "p75", "lo", "hi",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_outliers").cast("long").alias("n_outliers"),
        )
        .orderBy("event_type")
    )


def corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix over lineitem's bounded numeric
    measures (quantity, discount, tax) — the feature-screening /
    ingestion-QA pass ("which measures co-move?") run as ONE
    map-side-combined aggregate: every pairwise r comes from the five
    algebraic sums (n, Sx, Sy, Sxy, Sxx, Syy), so the fact is
    scanned once and shuffled never (the aggregate collapses to a
    single row). That single-pass shape is exactly how it survives
    100 TB; a per-pair corr() call would re-scan per pair.

    Cross-engine determinism: the measures are integerized first
    (quantity is integer-valued; discount/tax become percent points
    via round(x*100)), so every sum is an exact LONG; r's numerator
    n*Sxy - Sx*Sy (~1e16 at sf1) is computed IN LONG (exact), and
    only then converted to double. LONG->double conversion and IEEE
    sqrt/divide are correctly rounded in both engines, so the final
    round(r, 6) hashes identically."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = {
        "quantity": F.round(F.col("l_quantity")).cast("long"),
        "discount_pct": F.round(F.col("l_discount") * 100).cast("long"),
        "tax_pct": F.round(F.col("l_tax") * 100).cast("long"),
    }
    names = list(cols)
    proj = li.select(*[c.alias(n) for n, c in cols.items()])
    aggs = [F.count(F.lit(1)).alias("n")]
    for n in names:
        aggs.append(F.sum(n).alias(f"s_{n}"))
        aggs.append(F.sum(F.col(n) * F.col(n)).alias(f"ss_{n}"))
    pairs = [
        (a, b) for i, a in enumerate(names) for b in names[i + 1 :]
    ]
    for a, b in pairs:
        aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"sp_{a}_{b}"))
    stats = proj.agg(*aggs)
    # one row per pair via explode of a struct array over the SINGLE
    # 1-row aggregate — a unionByName of per-pair selects would
    # re-execute the full-scan aggregate once per pair (Catalyst does
    # not de-duplicate common subtrees)
    structs = []
    for a, b in pairs:
        num = (
            F.col("n") * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        ).cast("double")
        var_a = (
            F.col("n") * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
        ).cast("double")
        var_b = (
            F.col("n") * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
        ).cast("double")
        structs.append(
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                F.col("n").cast("long").alias("n"),
                F.round(num / (F.sqrt(var_a) * F.sqrt(var_b)), 6).alias(
                    "corr"
                ),
            )
        )
    return (
        stats.select(F.explode(F.array(*structs)).alias("r"))
        .select("r.*")
        .orderBy("col_x", "col_y")
    )


def outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median / MAD) outlier profiling per group — the
    heavy-tail-safe sibling of outlier_iqr: Tukey fences move with
    extreme values, the median absolute deviation doesn't, which is
    why data-cleaning sweeps over skewed telemetry use MAD z-scores
    (|x - med| > 3 * 1.4826 * MAD, 1.4826 scaling MAD to sigma under
    normality). Three passes, all group-bounded: exact per-group
    median (|groups| rows), exact MAD over the deviation (broadcast
    the medians back, never shuffling the fact for the join), then
    a broadcast-join recount. Determinism: median and MAD are
    rounded to 6 decimals BEFORE the fence arithmetic (the
    outlier_iqr contract)."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(
            F.round(
                F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)),
                6,
            ).alias("mad")
        )
    )
    fenced = mad.select(
        "event_type",
        "med",
        "mad",
        (F.lit(3.0 * 1.4826) * F.col("mad")).alias("cut"),
    )
    return (
        ev.join(F.broadcast(fenced), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                (F.abs(F.col("value") - F.col("med")) > F.col("cut")).cast(
                    "long"
                )
            ).alias("n_outliers"),
        )
        .select(
            "event_type",
            "med",
            "mad",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_outliers").cast("long").alias("n_outliers"),
        )
        .orderBy("event_type")
    )


def validate_rules(df: DataFrame, rules: dict[str, F.Column]) -> DataFrame:
    """Rule-based data validation report: each rule is a boolean
    Column (True = row VALID); the report is one row per rule with
    its violation count, plus ``__quarantined__`` (rows failing ANY
    rule — the rows an ingestion pipeline would divert to a
    quarantine table for repair) and ``__clean__``. This is the
    expectation-suite pattern of ingestion QA (Great Expectations /
    dbt tests shape), run as ONE plan.

    Scale shape: a single scan computes every rule flag as a column
    and ONE map-side-combined aggregate sums them all — per-rule
    passes would scan the fact |rules| times. The per-rule layout is
    then an unpivot of that 1-row aggregate (constant-size), so the
    fact is read once, shuffled never.

    Three-valued-logic trap: a rule evaluating to NULL (e.g.
    ``col > 0`` on a NULL) is NOT satisfied, so it must count as a
    violation — a plain ``(~rule)`` sum would silently skip those
    rows (SUM ignores NULL)."""
    if not rules:
        raise ValueError("validate_rules: rules dict must be non-empty")
    # rule names land in a stack() selectExpr and as column aliases —
    # restrict to identifier-safe names rather than emitting broken SQL
    bad = [n for n in rules if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", n)]
    if bad:
        raise ValueError(
            f"validate_rules: rule names must be SQL identifiers: {bad}"
        )
    flags = df.select(
        *[
            F.when(r, F.lit(0)).otherwise(F.lit(1)).alias(f"__v_{name}")
            for name, r in rules.items()
        ]
    )
    names = list(rules)
    any_bad = None
    for name in names:
        c = F.col(f"__v_{name}") > 0
        any_bad = c if any_bad is None else (any_bad | c)
    agg = flags.select(
        *[F.col(f"__v_{n}") for n in names],
        any_bad.cast("long").alias("__v___quarantined__"),
        (~any_bad).cast("long").alias("__v___clean__"),
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(f"__v_{n}").alias(n)
            for n in names + ["__quarantined__", "__clean__"]
        ],
    )
    stack_args = ", ".join(
        f"'{n}', {n}" for n in names + ["__quarantined__", "__clean__"]
    )
    return agg.selectExpr(
        f"stack({len(names) + 2}, {stack_args}) AS (rule, n_violations)",
        "n_rows",
    ).select(
        "rule",
        F.col("n_violations").cast("long").alias("n_violations"),
        F.col("n_rows").cast("long").alias("n_rows"),
    )


def validate_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the validation suite over a deterministically
    dirtied lineitem (negative quantities planted at
    l_orderkey % 101 == 7, discount blowout at % 103 == 11, invalid
    return flag at % 107 == 13 — the corruption classes a feed
    actually ships: sign flips, unit confusion, domain drift). Six
    domain rules; the oracle recomputes the same planted dirt and
    counts with plain SQL."""
    li = load_table(spark, sf_dir, "lineitem")
    dirty = li.select(
        F.col("l_orderkey").cast("long").alias("k"),
        F.when(F.col("l_orderkey") % 101 == 7, F.lit(-1.0))
        .otherwise(F.col("l_quantity"))
        .alias("l_quantity"),
        F.when(F.col("l_orderkey") % 103 == 11, F.lit(0.9))
        .otherwise(F.col("l_discount"))
        .alias("l_discount"),
        F.when(F.col("l_orderkey") % 107 == 13, F.lit("Z"))
        .otherwise(F.col("l_returnflag"))
        .alias("l_returnflag"),
        "l_tax",
        "l_extendedprice",
        "l_shipdate",
    )
    rules = {
        "quantity_in_range": F.col("l_quantity").between(1.0, 50.0),
        "discount_in_range": F.col("l_discount").between(0.0, 0.1),
        "tax_in_range": F.col("l_tax").between(0.0, 0.08),
        "price_positive": F.col("l_extendedprice") > 0.0,
        "returnflag_domain": F.col("l_returnflag").isin("R", "A", "N"),
        "shipdate_present": F.col("l_shipdate").isNotNull(),
    }
    return validate_rules(dirty, rules).orderBy("rule")


def rrf_fusion(spark: SparkSession, sf_dir: str, k: int = 60, depth: int = 100,
               top_n: int = 20) -> DataFrame:
    """Reciprocal-rank fusion of two document rankings (Cormack,
    Clarke & Buettcher 2009) — the standard hybrid-retrieval merge a
    RAG stack runs over its lexical and vector ranker outputs:
    fused(d) = sum over lists of 1/(k + rank_d). Here list A ranks
    documents by BPE-ish token count and list B by distinct-term
    count (two cheap, fully deterministic engine-side rankers; in
    production these slots hold BM25 and ANN scores).

    Engine-exactness: 1/(k+rank) is NOT double-safe across engines
    at the margins, so contributions are integer-scaled —
    1e12 div (k + rank) with INTEGER division on both sides — and
    fused scores are LONG sums. Ranks tie-break on doc_id.

    Scale shape: each ranker is orderBy().limit(depth) — Spark
    executes that as TakeOrderedAndProject, a distributed per-
    partition top-k merged on the driver, NOT a global sort-shuffle
    — and only the <=depth-row lists (constant size) see a window
    for rank numbering. The fusion join touches 2*depth rows."""
    docs = load_table(spark, sf_dir, "documents")
    bpe_ish = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    feats = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(bpe_ish), 0))
        .cast("long")
        .alias("n_tok"),
        F.size(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col("text")), r"[^a-z]+"),
                    lambda t: F.length(t) > 0,
                )
            )
        )
        .cast("long")
        .alias("n_distinct"),
    )

    def ranked(order_col: str) -> DataFrame:
        top = feats.orderBy(
            F.col(order_col).desc(), F.col("doc_id").asc()
        ).limit(depth)
        w = Window.orderBy(F.col(order_col).desc(), F.col("doc_id").asc())
        return top.select(
            "doc_id", F.row_number().over(w).cast("long").alias("rank")
        )

    ra = ranked("n_tok").withColumnRenamed("rank", "rank_a")
    rb = ranked("n_distinct").withColumnRenamed("rank", "rank_b")
    fused = (
        ra.join(rb, "doc_id", "full_outer")
        .select(
            "doc_id",
            "rank_a",
            "rank_b",
            (
                F.coalesce(
                    F.expr(f"1000000000000L div ({k} + rank_a)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr(f"1000000000000L div ({k} + rank_b)"), F.lit(0)
                )
            ).cast("long").alias("rrf_score"),
        )
    )
    return fused.orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    ).limit(top_n)


def hist_equi_depth(spark: SparkSession, sf_dir: str, bins: int = 10) -> DataFrame:
    """Equal-frequency (equi-depth) histogram of event values per
    type — the optimizer-statistics / data-profiling companion to
    agg_histogram's equal-WIDTH bins: each bin holds ~1/bins of the
    rows, so boundaries track the distribution's shape (tight where
    data is dense, wide in the tails), which is what makes equi-depth
    the standard form for selectivity estimation.

    ntile() assigns bins over a per-group total order — (value,
    event_id) so ties are deterministic — then one aggregate per
    (group, bin) emits count and [lo, hi]. The window sorts within
    each event_type partition only; with one giant group the
    two-phase quantile route (approx boundaries + broadcast) is the
    fallback, and Spark's ntile itself is the exact form."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.col("event_id").cast("long").alias("event_id"),
        "value",
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.withColumn("bin", F.ntile(bins).over(w).cast("long"))
        .groupBy("event_type", "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .orderBy("event_type", "bin")
    )


def skyline_2d(
    points: DataFrame, minimize: str, maximize: str
) -> DataFrame:
    """2-D SKYLINE (Pareto frontier; Borzsonyi et al. ICDE 2001):
    the points not DOMINATED by any other — here "dominates" means
    <= on the minimized column and >= on the maximized one, with at
    least one strict. The classic "best offers" operator (cheapest
    price vs largest quantity) no single ORDER BY can answer.

    Distributed shape exploits the skyline-algebra identity
    skyline(A u B) = skyline(skyline(A) u skyline(B)): phase 1
    computes each partition's LOCAL skyline independently (for 2-D,
    one sort + a running-max sweep inside the partition — O(n log n)
    per partition, no shuffle); phase 2 runs the same sweep over the
    union of local skylines, which is tiny (local skylines of random
    partitions overlap heavily), coalesced to one task. The
    quadratic dominance anti-join exists only in the ORACLE — the
    engine never compares all pairs.

    The 2-D sweep: sort by (min-col asc, max-col desc); a point is
    in the skyline iff its max-col strictly exceeds every earlier
    point's — a running max comparison. Window form keeps it
    engine-side; phase 1's window partitions by spark_partition_id
    (arbitrary slices are fine: the identity above needs no
    co-location)."""
    from pyspark.sql import Window

    def sweep(df: DataFrame, part_col) -> DataFrame:
        w = (
            Window.partitionBy(part_col)
            .orderBy(F.col(minimize).asc(), F.col(maximize).desc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        run_max = F.max(maximize).over(w)
        return df.withColumn("__rm", run_max).filter(
            F.col("__rm").isNull() | (F.col(maximize) > F.col("__rm"))
        ).drop("__rm")

    local = sweep(
        points.withColumn("__pid", F.spark_partition_id()), "__pid"
    ).drop("__pid")
    return sweep(
        local.coalesce(1).withColumn("__one", F.lit(1)), "__one"
    ).drop("__one")


def skyline_offers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: skyline of distinct (price_cents asc,
    quantity desc) offer points from lineitem — no other offer is
    both cheaper-or-equal and larger-or-equal (one strict). Oracle:
    the literal NOT EXISTS dominance query (quadratic is fine at
    oracle scale; the engine runs the two-phase sweep)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-03-01")
        & (F.col("l_shipdate") < "1995-04-01")
    )
    pts = li.select(
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("price_cents"),
        F.col("l_quantity").cast("long").alias("quantity"),
    ).distinct()
    return skyline_2d(pts, minimize="price_cents", maximize="quantity").orderBy(
        "price_cents"
    )


def ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B conversion analysis — the experiment
    readout every product-analytics stack computes: users are
    deterministically assigned to arms (md5 of user_id, the
    sample_weighted reproducibility idiom), conversion = "made >= 14
    purchases" (~median of the fixture's ~13 purchases/user, so both
    outcomes occur at every sf — "ever purchased" is 100% here and
    a 100% pooled rate zeroes the Wald SE), and the output is
    per-arm conversion plus
    absolute lift and the pooled two-proportion z-score
    (Wald test with pooled variance).

    Exactness: numerators/denominators are exact LONG user counts;
    rate/lift/z re-enter double space through ONE fixed expression
    tree mirrored verbatim in the oracle (the trend_fit contract) —
    identical operands, identical operator order, so the doubles
    hash-match with no tolerance. Scale: two map-side-combined
    aggregates over |users| rows; nothing beyond a 2-row result ever
    leaves the executors."""
    ev = load_table(spark, sf_dir, "events")
    users = (
        ev.groupBy(F.col("user_id").cast("long").alias("user_id"))
        .agg(
            (
                F.sum((F.col("event_type") == "purchase").cast("int")) >= 14
            ).cast("int").alias("converted")
        )
        .select(
            "user_id",
            "converted",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("user_id").cast("string"),
                                       F.lit(":ab"))), 1, 8
                    ),
                    16, 10,
                ).cast("long") % 2
            ).alias("arm"),
        )
    )
    arms = users.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    a = arms.filter(F.col("arm") == 0).select(
        F.col("n_users").alias("n_a"), F.col("n_converted").alias("c_a")
    )
    b = arms.filter(F.col("arm") == 1).select(
        F.col("n_users").alias("n_b"), F.col("n_converted").alias("c_b")
    )
    j = a.crossJoin(b)  # 1x1
    p_a = F.col("c_a").cast("double") / F.col("n_a").cast("double")
    p_b = F.col("c_b").cast("double") / F.col("n_b").cast("double")
    pool = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(
        pool
        * (F.lit(1.0) - pool)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    return j.select(
        "n_a", "c_a", "n_b", "c_b",
        F.round(p_a, 6).alias("rate_a"),
        F.round(p_b, 6).alias("rate_b"),
        F.round(p_b - p_a, 6).alias("lift_abs"),
        F.round((p_b - p_a) / se, 6).alias("z_score"),
    )


def skew_report(spark: SparkSession, sf_dir: str, top_n: int = 5) -> DataFrame:
    """Join-key skew diagnostics — the planning report you run
    BEFORE a big join to decide between plain shuffle, AQE skew
    splitting, and manual salting (operators/skew.py): per candidate
    key column, the row count, distinct-key count, the heaviest
    key's share, and the suggested salt factor
    ceil(max_key_rows / avg_key_rows) — 1 means uniform, large
    values mean the biggest key alone overflows an average
    partition's share.

    All counts are exact LONGs from one map-side-combined aggregate
    per key column (the per-key count table), reduced to a 1-row
    profile each — the |keys|-row intermediates never reach the
    driver. Shares are a fixed double tree rounded at the end."""
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    profiles = []
    for name, df, col in [
        ("lineitem.l_orderkey", li, "l_orderkey"),
        ("lineitem.l_partkey", li, "l_partkey"),
        ("lineitem.l_suppkey", li, "l_suppkey"),
        ("events.user_id", ev, "user_id"),
        ("events.event_type", ev, "event_type"),
    ]:
        per_key = df.groupBy(F.col(col).cast("string").alias("k")).agg(
            F.count(F.lit(1)).alias("c")
        )
        prof = per_key.agg(
            F.sum("c").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.max("c").cast("long").alias("max_key_rows"),
        ).select(
            F.lit(name).alias("key_col"),
            "n_rows",
            "n_keys",
            "max_key_rows",
            F.round(
                F.col("max_key_rows").cast("double")
                / F.col("n_rows").cast("double"),
                6,
            ).alias("max_share"),
            F.ceil(
                F.col("max_key_rows").cast("double")
                / (
                    F.col("n_rows").cast("double")
                    / F.col("n_keys").cast("double")
                )
            ).cast("long").alias("salt_factor"),
        )
        profiles.append(prof)
    out = profiles[0]
    for p in profiles[1:]:
        out = out.unionByName(p)
    return out.orderBy("key_col")


def quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of per-group measurements onto the
    POOLED distribution (the rank-based batch-effect remover of
    bioinformatics/feature pipelines, Bolstad et al. 2003, in its
    unequal-group-size form): each value's within-group relative
    rank picks the pooled sorted value at the matching position, so
    after normalization every group has (a resampling of) the same
    marginal distribution while each row keeps its rank within its
    group.

    Engine exactness: within-group rank rn and group size n are
    exact ints from one window; the pooled index is pure integer
    arithmetic idx = ((2*rn - 1) * N) // (2*n) + 1 (the midpoint
    rank mapped into 1..N, integer division on both engines —
    DuckDB ``//``, Spark ``div``); the lookup is an equi join on
    idx against the pooled order statistics. No float enters until
    the (exact, copied) value itself.

    Scale: the per-group window is bounded per group; the pooled
    order-statistics table needs a GLOBAL rank — built with the
    distributed two-phase count+offset rank (operators.twophase,
    the pack_shards scheme: range-repartition, per-partition counts
    to driver, offset + local position), NOT a single-partition
    ORDER BY window. The join on idx is an equi shuffle."""
    from pyspark.sql import Window

    from mapreducego_spark.operators.twophase import two_phase_global_rank

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.col("event_id").cast("long").alias("event_id"),
        "value",
    )
    wg = Window.partitionBy("event_type").orderBy("value", "event_id")
    grouped = ev.select(
        "event_type",
        "event_id",
        "value",
        F.row_number().over(wg).cast("long").alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .cast("long")
        .alias("n"),
    )
    pooled = two_phase_global_rank(
        ev.select("value", "event_id"), ["value", "event_id"], rank_col="idx"
    ).select("idx", F.col("value").alias("pooled_value"))
    n_total = ev.count()  # bounded scalar (one long)
    idx = (
        F.expr(f"((2 * rn - 1) * {n_total}L) div (2 * n)") + F.lit(1)
    ).cast("long")
    return (
        grouped.withColumn("idx", idx)
        .join(pooled, "idx")
        .select(
            "event_type", "event_id", "value",
            F.col("pooled_value").alias("normalized_value"),
        )
        .orderBy("event_type", "event_id")
    )


def bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index distinct counting: per day, the distinct-user
    count computed by OR-ing fixed-width bitmaps (word = id div 64,
    bit = id mod 64) and popcounting — the roaring-bitmap/BITMAP
    column technique OLAP stores use because bitmaps MERGE (bit_or
    is associative/commutative — map-side combinable, mergeable
    across segments) where exact DISTINCT sets must shuffle raw
    values. Words hold 63 ids (bits 0..62): bit 63 of a signed
    BIGINT is the sign — DuckDB rejects 1<<63 and Spark wraps
    negative, so the portable word width is 63.
    The same output carries countDistinct so the entry
    PROVES bitmap == exact on every row.

    Scale: |days| x |user-words| intermediate (words are 64 users
    each); the per-word OR combines map-side, the popcount sum is a
    LONG. Sparse-word storage here (groupBy word) is exactly the
    roaring trick; engine-portable via identical div/mod/bit_count
    on both sides."""
    ev = load_table(spark, sf_dir, "events").select(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
        .cast("long")
        .alias("day"),
        F.col("user_id").cast("long").alias("user_id"),
    )
    words = (
        ev.select(
            "day",
            F.expr("user_id div 63").alias("word"),
            # shiftleft needs an expr: the pyspark wrapper only takes a
            # literal shift amount
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))")
            .alias("bit"),
        )
        .groupBy("day", "word")
        .agg(F.expr("bit_or(bit)").alias("bitmap"))
    )
    bm = words.groupBy("day").agg(
        F.sum(F.expr("bit_count(bitmap)")).cast("long").alias("bitmap_distinct")
    )
    exact = ev.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    return (
        bm.join(exact, "day")
        .select(
            "day", "bitmap_distinct", "exact_distinct",
            (F.col("bitmap_distinct") == F.col("exact_distinct")).alias(
                "bitmap_equals_exact"
            ),
        )
        .orderBy("day")
    )


def ri_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across every FK edge in the
    fixture star schema — the completeness half of ingestion QA
    (validate_quarantine covers domains; this covers joins): for
    each child->parent edge, how many child rows reference a parent
    key that does not exist. Healthy TPC-H data reports zeros; a
    broken incremental load shows up here before any query silently
    drops rows through an inner join.

    Each edge is one left-anti join (broadcastable parent key list
    when small, shuffle-keyed otherwise — Catalyst picks); counts
    are exact LONGs; the report is |edges| rows."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    edges = [
        ("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey"),
        ("lineitem.l_partkey->part", li, "l_partkey", p, "p_partkey"),
        ("lineitem.l_suppkey->supplier", li, "l_suppkey", s, "s_suppkey"),
        ("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey"),
        ("customer.c_nationkey->nation", c, "c_nationkey", n, "n_nationkey"),
        ("supplier.s_nationkey->nation", s, "s_nationkey", n, "n_nationkey"),
        ("nation.n_regionkey->region", n, "n_regionkey", r, "r_regionkey"),
    ]
    out = None
    for name, child, ck, parent, pk in edges:
        orphans = child.join(
            parent.select(F.col(pk).alias(ck)), ck, "left_anti"
        )
        row = orphans.agg(F.count(F.lit(1)).cast("long").alias("n_orphans")).select(
            F.lit(name).alias("fk_edge"), "n_orphans"
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("fk_edge")


def winsorize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization report: clip values at the exact
    [p01, p99] quantiles and report clip counts plus the winsorized
    sum — the tail-taming transform applied before training on
    telemetry-derived features (a handful of sensor glitches
    otherwise dominate a mean). Same two-pass shape as outlier_iqr:
    exact per-group quantiles (|groups| rows) broadcast back over one
    fact re-scan; the fact is never shuffled.

    Determinism: quantiles rounded to 6 before clipping (the
    outlier_iqr contract); the winsorized sum is rounded to cents in
    LONG before the double cast (sums of ~1e7 values need the
    DECIMAL->DOUBLE 2^53 discipline from the r5 Q1 finding)."""
    ev = load_table(spark, sf_dir, "events")
    fences = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.01)), 6).alias("p01"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
    )
    clipped = ev.join(F.broadcast(fences), "event_type").select(
        "event_type",
        "p01",
        "p99",
        F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99")).alias(
            "w"
        ),
        (F.col("value") < F.col("p01")).cast("long").alias("lo"),
        (F.col("value") > F.col("p99")).cast("long").alias("hi"),
    )
    return (
        clipped.groupBy("event_type", "p01", "p99")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("lo").alias("n_clipped_lo"),
            F.sum("hi").alias("n_clipped_hi"),
            F.round(F.sum(F.round(F.col("w") * 100).cast("long")) / 100.0, 2)
            .alias("sum_winsorized"),
        )
        .select(
            "event_type",
            "p01",
            "p99",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_clipped_lo").cast("long").alias("n_clipped_lo"),
            F.col("n_clipped_hi").cast("long").alias("n_clipped_hi"),
            "sum_winsorized",
        )
        .orderBy("event_type")
    )


def mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode with a total-order tie-break: each user's
    dominant event_type (count desc, event_type asc) — the
    categorical summary feature engineering reaches for constantly,
    and a HOLISTIC aggregate (no map-side partial over the final
    grain), so the scalable plan is count-then-rank: one combinable
    (user, event_type) count, then a row_number over the tiny
    per-user group — never a collect_list of raw events."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), F.col("event_type").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("event_type").alias("mode_event"),
            F.col("cnt").cast("long").alias("n_events"),
        )
        .orderBy("user_id")
    )


def copurchase_triples(
    spark: SparkSession, sf_dir: str, minsup: int = 2, max_basket: int = 1_000
) -> DataFrame:
    """Frequent co-purchase TRIPLES — A-priori level 3, the step that
    separates a real market-basket implementation from the pair demo.
    Downward closure does the heavy lifting twice: (L1) items in
    < minsup baskets are pruned before any join, and (L2) a triple
    {a,b,c} can only be frequent if ALL THREE of its pairs are, so
    candidate triples are generated by joining frequent pairs sharing
    their smallest item and verified against the pair set — never by
    a three-way basket self-join over the raw catalog.

    Counting then touches only candidate triples: baskets join
    candidates on the (a) leg and confirm b, c membership via two
    more semi-style joins on the SAME order — each join keyed on
    (order, part), so the shuffles are basket-sized, not C(b,3).
    Output: (part_a < part_b < part_c, support >= minsup)."""
    from mapreducego_spark.operators.util import guard_limit

    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    freq_items = (
        baskets.groupBy("p")
        .agg(F.count(F.lit(1)).alias("__sup"))
        .filter(F.col("__sup") >= minsup)
        .select("p")
    )
    baskets = baskets.join(freq_items, "p")
    sizes = baskets.groupBy("o").agg(F.count(F.lit(1)).alias("__bn"))
    baskets = (
        baskets.join(sizes, "o")
        .filter(
            guard_limit(
                F.col("__bn"),
                max_basket,
                F.lit(
                    f"copurchase_triples: basket over {max_basket} items "
                    "goes cubic; cap or sample hot baskets"
                ),
            )
        )
        .drop("__bn")
        .localCheckpoint(eager=True)
    )
    # L2 pair counting stays the self-join over the CHECKPOINTED
    # baskets (r17 note: the in-plan pair-explosion rewrite that wins
    # in copurchase_pairs was tried here and measured +0.5s in a
    # clean-band bench window — with baskets already materialized for
    # the L3 counting joins, the extra collect_list aggregation costs
    # more than the cheap checkpoint-fed self-join it replaces).
    a = baskets.select("o", F.col("p").alias("pa"))
    b = baskets.select(F.col("o").alias("o2"), F.col("p").alias("pb"))
    pairs = (
        a.join(b, a.o == b.o2)
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("sup2"))
        .filter(F.col("sup2") >= minsup)
        .select("pa", "pb")
        .localCheckpoint(eager=True)
    )
    # L2 candidate generation: join frequent pairs on the first item,
    # then require the closing pair (pb, pc) to be frequent too
    cand = (
        pairs.alias("x")
        .join(
            pairs.alias("y"),
            (F.col("x.pa") == F.col("y.pa")) & (F.col("x.pb") < F.col("y.pb")),
        )
        .select(
            F.col("x.pa").alias("ta"),
            F.col("x.pb").alias("tb"),
            F.col("y.pb").alias("tc"),
        )
        .join(
            pairs.select(F.col("pa").alias("ta2"), F.col("pb").alias("tb2")),
            (F.col("tb") == F.col("ta2")) & (F.col("tc") == F.col("tb2")),
            "left_semi",
        )
    )
    # support counting over candidates only: three keyed basket joins
    ba = baskets.select(F.col("o").alias("oa"), F.col("p").alias("ta"))
    bb = baskets.select(F.col("o").alias("ob"), F.col("p").alias("pb2"))
    bc = baskets.select(F.col("o").alias("oc"), F.col("p").alias("pc2"))
    counted = (
        cand.join(ba, "ta")
        .join(bb, (F.col("oa") == F.col("ob")) & (F.col("pb2") == F.col("tb")))
        .join(bc, (F.col("oa") == F.col("oc")) & (F.col("pc2") == F.col("tc")))
        .groupBy("ta", "tb", "tc")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= minsup)
    )
    return counted.select(
        F.col("ta").cast("long").alias("part_a"),
        F.col("tb").cast("long").alias("part_b"),
        F.col("tc").cast("long").alias("part_c"),
        F.col("support").cast("long").alias("support"),
    ).orderBy("part_a", "part_b", "part_c")
