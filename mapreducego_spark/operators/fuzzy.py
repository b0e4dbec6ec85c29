"""Blocked fuzzy matching (entity resolution): candidate generation
by cheap blocking keys, verification by exact edit distance.

The all-pairs formulation is O(n^2) string comparisons — dead at any
scale. The standard fix (Fellegi-Sunter-era blocking, still how
record linkage runs at scale) is: hash-partition on a BLOCKING KEY
that any true match must share (here: an exact attribute; in looser
settings a phonetic code, a length bucket, or q-gram keys), form
pairs only within blocks, then verify candidates with the real
similarity. Cost becomes sum-of-block^2 — tunable by key choice and
guarded loudly here rather than silently melting down.

Spark shape: one shuffle on the blocking key for the self-join; the
Levenshtein verify runs JVM-side (whole-stage codegen, no UDF); a
length-difference triangle bound prunes pairs BEFORE the O(len_a *
len_b) edit-distance DP runs. Skewed blocks are the failure mode —
guard_limit raises with a routing hint instead of quietly producing
a quadratic stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducego_spark.operators.util import guard_limit
from mapreducego_spark.sources.catalog import load_table

MAX_BLOCK = 10_000


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    max_dist: int = 1,
    max_block: int = MAX_BLOCK,
) -> DataFrame:
    """All (id_a < id_b) pairs sharing every ``block_cols`` value
    with Levenshtein(text_a, text_b) <= ``max_dist``.

    Verification order matters: |len(a) - len(b)| <= max_dist is a
    Levenshtein lower bound, so the length filter runs first and the
    DP only touches pairs that could possibly match. Blocks larger
    than ``max_block`` raise in-plan (guard_limit) — route such data
    through a finer key (add a length bucket or q-gram prefix)."""
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(text_col).alias("txt"),
        F.length(F.col(text_col)).alias("len"),
        *block_cols,
    )
    sizes = base.groupBy(*block_cols).agg(F.count(F.lit(1)).alias("__bn"))
    base = (
        base.join(sizes, block_cols)
        .filter(
            guard_limit(
                F.col("__bn"),
                max_block,
                F.concat(
                    F.lit("blocked_fuzzy_pairs: block over "),
                    F.lit(str(max_block)),
                    F.lit(" rows; use a finer blocking key"),
                ),
            )
        )
        .drop("__bn")
    )
    a = base.select(
        F.col("id").alias("id_a"),
        F.col("txt").alias("txt_a"),
        F.col("len").alias("len_a"),
        *block_cols,
    )
    b = base.select(
        F.col("id").alias("id_b"),
        F.col("txt").alias("txt_b"),
        F.col("len").alias("len_b"),
        *block_cols,
    )
    return (
        a.join(b, block_cols)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.abs(F.col("len_a") - F.col("len_b")) <= max_dist)
        .withColumn("dist", F.levenshtein("txt_a", "txt_b"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", F.col("dist").cast("long").alias("dist"))
    )


def fuzzy_match_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: near-identical customer names within a nation
    block (edit distance <= 1) — the classic dirty-CRM duplicate
    sweep, oracle-checked against DuckDB's levenshtein on the same
    blocked self-join."""
    cust = load_table(spark, sf_dir, "customer")
    return blocked_fuzzy_pairs(
        cust,
        id_col="c_custkey",
        text_col="c_name",
        block_cols=["c_nationkey"],
        max_dist=1,
    ).orderBy("id_a", "id_b")
