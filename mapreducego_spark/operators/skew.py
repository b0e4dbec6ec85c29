"""Explicit skew mitigation for joins: key salting.

AQE's skew-join splitting (on in session.py) handles most skew by
splitting oversized shuffle partitions at runtime, but it only helps
sort-merge joins AFTER a skewed exchange exists. Salting removes the
hot key at the source: the small side is replicated n_salt times,
the big side scatters each hot key across n_salt subkeys, and the
join key becomes (key, salt) — the classic hand fix when one key
holds 10% of a 100 TB fact table.

Reference parity: the reference's only partitioner is fnv32a(key)%R
(reference mpWorker/worker.go:59-63,142-151) with no skew handling
at all — one hot key lands every record in one bucket file. Salting
is the capability-closure answer: refine the partition key itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dims: DataFrame,
    key: str,
    fact_scatter: Column | str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``facts`` (big, possibly skewed on ``key``) with ``dims``
    (small) on ``key``, scattering fact rows across ``n_salt``
    salted copies of the dim side.

    ``fact_scatter``: a fact-side column (or Column expr) that is
    roughly unique per row (an id); its hash mod n_salt spreads a hot
    key's rows across salts DETERMINISTICALLY (rand() would break
    retry/lineage reproducibility — a failed task would re-salt
    differently on retry).

    Cost model: dim side grows n_salt x (still broadcast-size by
    assumption); the fact side is untouched. Output equals the plain
    join exactly — which is only true for fact-preserving join types:
    a dim-preserving join (right/full) would emit every UNMATCHED dim
    key n_salt times (once per salted replica), so those types are
    rejected rather than silently wrong. Use a plain join (AQE skew
    split) when dim rows must be preserved.
    """
    # left_anti is also safe: every dim key exists under every salt,
    # so (key, salt) membership is equivalent to key membership.
    allowed = {"inner", "left", "leftouter", "leftsemi", "leftanti"}
    if how.lower().replace("_", "") not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is dim-preserving; the salted dim "
            "replicas would duplicate unmatched dim rows. Allowed: "
            "inner / left / left_semi / left_anti."
        )
    scatter = (
        F.col(fact_scatter) if isinstance(fact_scatter, str) else fact_scatter
    )
    salted_facts = facts.withColumn(
        "__salt", F.pmod(F.xxhash64(scatter), F.lit(n_salt)).cast("int")
    )
    salted_dims = dims.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = salted_facts.join(salted_dims, [key, "__salt"], how)
    return out.drop("__salt")


def join_skew_salted(spark, sf_dir: str) -> DataFrame:
    """Registry entry: the salted join oracle-checked end-to-end —
    lineitem (fact, scattered by xxhash64(orderkey, linenumber) mod 8)
    joined to the orders dim through 8 salted replicas, aggregated to
    per-priority totals. The DuckDB oracle is the PLAIN join + GROUP
    BY: the hash match proves salting changes the partitioning and
    nothing else (the exactness claim in salted_join's contract)."""
    from pyspark.sql import functions as F2

    from mapreducego_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_linenumber",
        "l_extendedprice",
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    j = salted_join(
        li,
        o,
        key="o_orderkey",
        fact_scatter=F2.xxhash64("o_orderkey", "l_linenumber"),
        n_salt=8,
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


def salted_distinct_agg(
    df: DataFrame,
    keys: list[str],
    distinct_col: str,
    partials: dict[str, tuple[Column, str]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase SALTED aggregation for holistic aggregates on hot
    grouping keys — the aggregation-side sibling of salted_join.

    Why salting matters here and NOT for plain sums: algebraic
    aggregates (count/sum/min/max) are already skew-immune — Catalyst
    inserts a map-side partial HashAggregate, so the final shuffle
    carries one row per (map task x group) no matter how hot the key.
    A HOLISTIC aggregate like exact COUNT(DISTINCT x) is different:
    every distinct x of a group must meet in one place, so a key that
    owns 10% of a 100 TB table funnels 10 TB of distinct values into
    a single reducer. The fix: shard the DISTINCT SET, not the rows —
    salt = hash(x) % n_salt, count distinct within (key, salt), SUM
    the per-salt counts. Same x always lands in the same salt, so the
    per-salt distinct sets partition the group's distinct set and the
    summed count is EXACT. (Spark's own count-distinct rewrite uses
    an Expand over the full rows; the salt pre-shard bounds every
    reducer at 1/n_salt of the hottest group's distinct set.)

    ``partials``: algebraic companions computed alongside — name ->
    (expr, op) with op in {"count", "sum", "min", "max"}; their
    phase-1 partials merge with SUM/SUM/MIN/MAX in phase 2.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n_salt)).cast("int")
    )
    phase1: list[Column] = [
        F.countDistinct(F.col(distinct_col)).alias("__nd_part")
    ]
    phase2: list[Column] = [F.sum("__nd_part").cast("long").alias("n_distinct")]
    merge_op = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    for name, (expr, op) in partials.items():
        if op not in merge_op:
            raise ValueError(f"salted_distinct_agg: unsupported op {op!r}")
        part = F.count(F.lit(1)) if op == "count" else getattr(F, op)(expr)
        phase1.append(part.alias(name))
        phase2.append(getattr(F, merge_op[op])(F.col(name)).alias(name))
    return (
        salted.groupBy(*keys, "__salt").agg(*phase1).groupBy(*keys).agg(*phase2)
    )


def agg_skew_salted(spark, sf_dir: str) -> DataFrame:
    """Registry entry: exact per-event-type distinct-user counts via
    the salted two-phase plan, oracle-checked against DuckDB's plain
    COUNT(DISTINCT) GROUP BY. events.event_type is the hot-key regime
    by construction (~5 types over the whole table): the plain plan
    co-locates every distinct user of a type on one reducer; the
    salted plan bounds each reducer at 1/16 of that. The hash match
    proves the sharded distinct count changes the partitioning and
    nothing else."""
    from mapreducego_spark.operators.util import dec
    from mapreducego_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    out = salted_distinct_agg(
        ev,
        keys=["event_type"],
        distinct_col="user_id",
        partials={
            "n_events": (F.lit(1), "count"),
            "sum_value": (dec("value", 18, 6), "sum"),
            "max_value": (F.col("value"), "max"),
        },
        n_salt=16,
    )
    return out.select(
        "event_type",
        F.col("n_distinct").alias("n_users"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("sum_value").cast("double").alias("sum_value"),
        F.col("max_value").alias("max_value"),
    ).orderBy("event_type")
