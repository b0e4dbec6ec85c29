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
