"""Plan-quality gates: the physical plans the 100 TB posture depends
on. These assert on explain() output so a regression that silently
de-optimizes a plan (lost pushdown, lost broadcast, lost partial agg)
fails CI even though results stay correct."""

from __future__ import annotations

import pyspark.sql.functions as F

from mapreducego_spark.operators.relational import (
    filter_project,
    join_broadcast,
    join_inner,
    topk,
)
from mapreducego_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_parquet(spark):
    plan = _plan(filter_project(spark, SF))
    assert "PushedFilters:" in plan
    # the shipdate/quantity predicates must appear as pushed filters
    assert "l_shipdate" in plan.split("PushedFilters:")[1][:400]


def test_column_pruning(spark):
    df = load_table(spark, SF, "lineitem").select("l_orderkey")
    plan = _plan(df)
    read_schema = plan.split("ReadSchema:")[1][:200]
    assert "l_orderkey" in read_schema
    assert "l_comment" not in read_schema and "l_extendedprice" not in read_schema


def test_dim_joins_broadcast(spark):
    plan = _plan(join_inner(spark, SF))
    assert "BroadcastHashJoin" in plan  # nation/region sides
    plan2 = _plan(join_broadcast(spark, SF))
    assert "BroadcastHashJoin" in plan2
    assert "SortMergeJoin" not in plan2  # the fact side never shuffles


def test_aggregate_is_partial(spark):
    """Catalyst must plan partial (map-side) aggregation — the
    combiner the reference never built (worker.go:153-192)."""
    from mapreducego_spark.operators.relational import agg_pricing_summary

    plan = _plan(agg_pricing_summary(spark, SF))
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_topk_avoids_global_sort(spark):
    plan = _plan(topk(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_no_cartesian_in_registry(spark):
    """No query in the registry may plan an unbounded cartesian
    product (broadcast nested loop against a bounded query set is
    acceptable; a shuffle cartesian is not)."""
    from mapreducego_spark.registry import QUERIES

    for name, fn in QUERIES.items():
        plan = _plan(fn(spark, SF))
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
