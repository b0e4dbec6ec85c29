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


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sort_key,
    window: int = 5,
    max_dist: int = 1,
) -> DataFrame:
    """Sorted-neighborhood method (Hernandez & Stolfo 1995): the
    OTHER classic candidate generator. Sort all records by a fuzzy
    key, slide a window of ``window`` positions, verify only pairs
    within the window. Complements hash blocking: blocking misses
    matches whose blocking key disagrees (a typo IN the key);
    SNM tolerates key typos as long as the sort still lands the
    records near each other, and its candidate count is exactly
    n * (window-1) — linear, no skew, no hot-block blowup.

    Spark shape: ranks come from the distributed two-phase rank
    (operators.twophase — range-repartition, per-partition counts to
    driver offsets, local position; never a single-partition global
    window, so the generator holds at fact-table scale). Pairs join
    on rank difference 1..w-1 — one equi-join per offset, unioned,
    so no range join and no skew (every rank has at most w-1
    partners)."""
    from mapreducego_spark.operators.twophase import two_phase_global_rank

    ranked = two_phase_global_rank(
        df.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(text_col).alias("txt"),
            sort_key.alias("__sk"),
        ),
        ["__sk", "id"],
    )
    a = ranked.select(
        F.col("id").alias("id_a"), F.col("txt").alias("txt_a"), "rn"
    )
    parts = []
    for off in range(1, window):
        b = ranked.select(
            F.col("id").alias("id_b"),
            F.col("txt").alias("txt_b"),
            (F.col("rn") - off).alias("rn"),
        )
        parts.append(a.join(b, "rn"))
    cands = parts[0]
    for p in parts[1:]:
        cands = cands.unionByName(p)
    return (
        cands.withColumn("dist", F.levenshtein("txt_a", "txt_b"))
        .filter(F.col("dist") <= max_dist)
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            F.col("dist").cast("long").alias("dist"),
        )
        .distinct()
        .orderBy("id_a", "id_b")
    )


def snm_match_customers(spark, sf_dir: str) -> DataFrame:
    """Registry entry: sorted-neighborhood over customer names sorted
    by name REVERSED — the canonical SNM key trick (typos cluster at
    the end of these formulaic names, so reversing sorts look-alikes
    adjacent). Window 6, edit distance <= 1, oracle = the same
    ranked self-join in SQL."""
    cust = load_table(spark, sf_dir, "customer")
    return sorted_neighborhood_pairs(
        cust,
        id_col="c_custkey",
        text_col="c_name",
        sort_key=F.reverse(F.col("c_name")),
        window=6,
        max_dist=1,
    )
