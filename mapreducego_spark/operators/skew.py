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
