"""Round-2 relational widening: approx percentile error floor and
pivot/unpivot shape invariants."""

from __future__ import annotations

from mapreducego_spark.operators.relational import (
    agg_percentile_approx,
    agg_pivot,
    agg_unpivot,
)


def test_approx_percentile_within_relative_error(spark, sf_dir):
    rows = agg_percentile_approx(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # accuracy=1000 -> error bound ~ 1/1000 of rank; allow 5% on
        # the tiny smoke fixture
        assert abs(r.approx_p50 - r.exact_p50) <= 0.05 * abs(r.exact_p50) + 1e-9


def test_pivot_counts_total_matches_orders(spark, sf_dir):
    from mapreducego_spark.sources.catalog import load_table

    rows = agg_pivot(spark, sf_dir).collect()
    total = sum(r.n_F + r.n_O + r.n_P for r in rows)
    assert total == load_table(spark, sf_dir, "orders").count()


def test_unpivot_is_exact_double_fanout(spark, sf_dir):
    from mapreducego_spark.sources.catalog import load_table

    n_parts = (
        load_table(spark, sf_dir, "part").filter("p_partkey < 500").count()
    )
    out = agg_unpivot(spark, sf_dir)
    assert out.count() == 2 * n_parts
    assert set(out.columns) == {"p_partkey", "metric", "metric_value"}


def test_salted_join_equals_plain_join(spark, sf_dir):
    from mapreducego_spark.operators.skew import salted_join
    from mapreducego_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    # salted join keys on a shared column name; align the fact side
    li2 = li.withColumnRenamed("l_partkey", "p_partkey")
    salted = salted_join(li2, p, "p_partkey", fact_scatter="l_orderkey", n_salt=4)
    plain = li2.join(p, "p_partkey")
    assert salted.count() == plain.count()
    a = salted.groupBy("p_brand").count().collect()
    b = plain.groupBy("p_brand").count().collect()
    assert {(r.p_brand, r["count"]) for r in a} == {
        (r.p_brand, r["count"]) for r in b
    }


def test_salted_distinct_agg_equals_plain(spark):
    """The salted two-phase exact COUNT(DISTINCT) must equal the
    plain plan on a deliberately hot key: one group owning 90% of
    the rows with a large distinct set, plus users deliberately
    shared across groups (a user in two groups must count once in
    EACH — the per-group salting must not conflate groups)."""
    from pyspark.sql import functions as F2

    from mapreducego_spark.operators.skew import salted_distinct_agg

    rows = [("hot", i % 700) for i in range(9000)]
    rows += [("cold_a", i % 37) for i in range(500)]
    rows += [("cold_b", i % 11) for i in range(500)]
    df = spark.createDataFrame(rows, ["k", "user"]).withColumn(
        "v", (F2.col("user") * 3).cast("double")
    )
    salted = salted_distinct_agg(
        df,
        keys=["k"],
        distinct_col="user",
        partials={
            "n_rows": (F2.lit(1), "count"),
            "min_v": (F2.col("v"), "min"),
        },
        n_salt=8,
    )
    plain = df.groupBy("k").agg(
        F2.countDistinct("user").alias("n_distinct"),
        F2.count(F2.lit(1)).alias("n_rows"),
        F2.min("v").alias("min_v"),
    )
    got = {r.k: (r.n_distinct, r.n_rows, r.min_v) for r in salted.collect()}
    want = {r.k: (r.n_distinct, r.n_rows, r.min_v) for r in plain.collect()}
    assert got == want
    assert got["hot"][0] == 700


def test_profile_table_approx_mode(spark):
    """profile_table(approx=True) — the 100 TB default — must agree
    with exact mode on everything but n_distinct, stay within HLL++'s
    5% default rsd on n_distinct (3-sigma floor: 15%), and plan NO
    Expand (the sketch merges map-side, one scan per column)."""
    from mapreducego_spark.operators.relational import profile_table

    sf = "/root/testdata/sf0.01"
    exact = {r["col"]: r for r in profile_table(spark, sf).collect()}
    approx = {r["col"]: r for r in profile_table(spark, sf, approx=True).collect()}
    assert set(exact) == set(approx)
    for c in exact:
        e, a = exact[c], approx[c]
        assert (a["n_rows"], a["n_nonnull"], a["min_s"], a["max_s"]) == (
            e["n_rows"], e["n_nonnull"], e["min_s"], e["max_s"]
        )
        assert abs(a["n_distinct"] - e["n_distinct"]) <= 0.15 * e["n_distinct"]
    plan = (
        profile_table(spark, sf, approx=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" not in plan, plan


def test_blocked_fuzzy_pairs_semantics_and_guard(spark):
    from mapreducego_spark.operators.fuzzy import blocked_fuzzy_pairs

    rows = [
        (1, "jon smith", "a"),
        (2, "john smith", "a"),    # dist 1 from jon smith
        (3, "john smyth", "a"),    # dist 1 from john smith, 2 from jon
        (4, "jon smith", "b"),     # identical text, other block -> no pair
        (5, "completely other", "a"),
    ]
    df = spark.createDataFrame(rows, ["id", "name", "blk"])
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in blocked_fuzzy_pairs(
            df, "id", "name", ["blk"], max_dist=1
        ).collect()
    }
    assert got == {(1, 2, 1), (2, 3, 1)}

    # dist 2 admits the (1,3) pair too
    got2 = {
        (r.id_a, r.id_b)
        for r in blocked_fuzzy_pairs(
            df, "id", "name", ["blk"], max_dist=2
        ).collect()
    }
    assert (1, 3) in got2 and (1, 4) not in got2

    # oversized block fails loudly instead of going quadratic
    big = spark.createDataFrame(
        [(i, f"name {i}", "hot") for i in range(50)], ["id", "name", "blk"]
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="finer blocking key"):
        blocked_fuzzy_pairs(big, "id", "name", ["blk"], max_block=10).collect()


def test_nest_order_lines_is_deterministic_and_sorted(spark, sf_dir):
    """The nested items string must be identical across two runs with
    different shuffle widths (the collect_list nondeterminism the
    sort_array exists to kill) and internally sorted."""
    from mapreducego_spark.operators.relational import nest_order_lines

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = {r.o_orderkey: r.items for r in nest_order_lines(spark, sf_dir).collect()}
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = {r.o_orderkey: r.items for r in nest_order_lines(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b and a
    for items in list(a.values())[:50]:
        pairs = [tuple(map(int, p.split(":"))) for p in items.split(",")]
        assert pairs == sorted(pairs)


def test_copurchase_prefilter_is_exact_and_guard_trips(spark):
    """The A-priori item prefilter must not change the pair set
    (downward closure), and an oversized basket fails loudly."""
    import pytest as _pytest
    from pyspark.sql import functions as F2

    from mapreducego_spark.operators.relational import copurchase_pairs

    out = copurchase_pairs(spark, "/root/testdata/sf0.001", minsup=2)
    rows = {(r.part_a, r.part_b): r.support for r in out.collect()}
    # brute-force reference without any prefilter
    from mapreducego_spark.sources.catalog import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    op = li.select(F2.col("l_orderkey").alias("o"), F2.col("l_partkey").alias("p")).distinct()
    a = op.select("o", F2.col("p").alias("pa"))
    b = op.select(F2.col("o").alias("o2"), F2.col("p").alias("pb"))
    ref = (
        a.join(b, a.o == b.o2)
        .filter(F2.col("pa") < F2.col("pb"))
        .groupBy("pa", "pb")
        .agg(F2.count(F2.lit(1)).alias("s"))
        .filter(F2.col("s") >= 2)
    )
    want = {(r.pa, r.pb): r.s for r in ref.collect()}
    assert rows == want

    with _pytest.raises(Exception, match="quadratic"):
        copurchase_pairs(spark, "/root/testdata/sf0.001", minsup=1, max_basket=2).collect()


def test_outlier_iqr_flags_known_outliers(spark, tmp_path):
    """A synthetic group with two planted extreme values must report
    exactly those as outliers; a uniform group reports none."""
    import pandas as pd

    from mapreducego_spark.operators.relational import outlier_iqr

    rows = [("a", float(v)) for v in range(1, 101)]  # uniform 1..100
    rows += [("a", 10_000.0), ("a", -10_000.0)]      # planted outliers
    rows += [("b", 5.0)] * 50                        # constant: IQR 0
    pdf = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": 1,
            "event_type": [r[0] for r in rows],
            "value": [r[1] for r in rows],
            "props": "{}",
        }
    )
    sf = str(tmp_path)
    pdf.to_parquet(f"{sf}/events.parquet")
    got = {r.event_type: r for r in outlier_iqr(spark, sf).collect()}
    assert got["a"].n_outliers == 2
    assert got["b"].n_outliers == 0  # IQR 0 -> fences collapse to 5.0
    assert got["a"].lo < 1 and got["a"].hi > 100


def test_snm_catches_cross_block_matches(spark):
    """The complementarity claim: a near-dup pair whose BLOCKING key
    disagrees (dirty key) is invisible to hash blocking but caught by
    the sorted neighborhood, and SNM candidates are linear (<= n*(w-1)
    verifications by construction)."""
    from pyspark.sql import functions as F2

    from mapreducego_spark.operators.fuzzy import (
        blocked_fuzzy_pairs,
        sorted_neighborhood_pairs,
    )

    rows = [
        (1, "ackermann", "de"),
        (2, "ackermanm", "DE "),   # same person, typo'd block key
        (3, "becker", "de"),
        (4, "becker", "fr"),       # identical name, different block
        (5, "zimmer", "fr"),
    ]
    df = spark.createDataFrame(rows, ["id", "name", "country"])
    blocked = {
        (r.id_a, r.id_b)
        for r in blocked_fuzzy_pairs(
            df, "id", "name", ["country"], max_dist=1
        ).collect()
    }
    assert (1, 2) not in blocked  # dirty key hides it from blocking
    snm = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(
            df, "id", "name", sort_key=F2.col("name"), window=3, max_dist=1
        ).collect()
    }
    assert (1, 2) in snm
    assert (3, 4) in snm  # cross-block identical names too
