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


def _window_spec_first_args(plan_line: str) -> list[str]:
    """Full first argument of every windowspecdefinition(...) on the
    line, with balanced-paren awareness: a naive split at the first
    comma truncates function-call sort expressions (e.g.
    `coalesce(a, b) ASC` -> `coalesce(a`), mis-classifying an
    order-only window as partitioned (r8 ADVICE). The first argument
    ends at the first comma at paren depth 0."""
    out = []
    marker = "windowspecdefinition("
    start = 0
    while True:
        i = plan_line.find(marker, start)
        if i < 0:
            return out
        depth = 0
        arg_start = i + len(marker)
        for j in range(arg_start, len(plan_line)):
            ch = plan_line[j]
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:  # spec closed before any comma
                    out.append(plan_line[arg_start:j])
                    break
                depth -= 1
            elif ch == "," and depth == 0:
                out.append(plan_line[arg_start:j])
                break
        else:
            out.append(plan_line[arg_start:])
        start = arg_start


def _is_sort_expr(first_arg: str) -> bool:
    """True when the spec's first argument is itself a sort item
    (` ASC`/` DESC` outside parens) — i.e. the window has NO
    partition columns."""
    depth = 0
    for tok_start in range(len(first_arg)):
        ch = first_arg[tok_start]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and first_arg.startswith(
            (" ASC", " DESC"), tok_start
        ):
            return True
    return False


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


_REGISTRY_PLANS: dict[str, str] = {}


def _registry_plans(spark) -> dict[str, str]:
    """Build (once per test session) the executed plan of every
    registry query at SF — shared by the registry-wide plan sweeps so
    the query constructions are paid a single time. Built into a
    LOCAL dict and published only when complete: if a query raises
    mid-build, a partially-populated module cache would make the
    OTHER sweep silently pass on a prefix of the registry."""
    from mapreducego_spark.registry import QUERIES

    if len(_REGISTRY_PLANS) != len(QUERIES):
        built = {name: _plan(fn(spark, SF)) for name, fn in QUERIES.items()}
        _REGISTRY_PLANS.clear()
        _REGISTRY_PLANS.update(built)
    return _REGISTRY_PLANS


def test_no_cartesian_in_registry(spark):
    """No query in the registry may plan an unbounded cartesian
    product (broadcast nested loop against a bounded query set is
    acceptable; a shuffle cartesian is not)."""
    for name, plan in _registry_plans(spark).items():
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


# Registry entries allowed to keep an unpartitioned window because
# the windowed input is BOUNDED to a constant number of rows before
# the window ever runs — same explicit-waiver pattern as the
# 1-row-broadcast BNLJ waivers in tools/plan_audit.py. mix_sources'
# quota windows (the last constant-partition windows over an
# UNBOUNDED-ish |sources| aggregate) were replaced in r8 by a
# single-row higher-order-function apportionment, so the only
# remaining entry is rrf_fusion.
_UNPARTITIONED_WINDOW_WAIVERS: dict[str, str] = {
    "rrf_fusion": "rank numbering runs over an orderBy().limit(depth)"
    " list: TakeOrderedAndProject bounds the window input to <=100"
    " rows (constant, independent of data size) before the window"
    " executes — relational.py ranked()",
    "skyline_offers": "phase 2 of the skyline-algebra two-phase sweep"
    " merges the union of per-partition LOCAL skylines, which is"
    " deliberately coalesce(1)'d first (the merge is inherently one"
    " sequential pass over a set that local filtering has already"
    " shrunk to ~|skyline| rows) — relational.py skyline_2d; phase"
    " 1's window partitions by spark_partition_id",
}


def test_window_sweep_flags_comma_bearing_sort_keys(spark):
    """The r9 verdict's crafted counter-example: an ORDER-BY-only
    window whose sort key contains a comma (`coalesce(a, b)`) must be
    flagged — a naive split-at-first-comma parser truncates it to
    `coalesce(a` (no ` ASC` suffix) and false-greens the single-
    partition window. The partitioned twin with the SAME sort key
    must pass, proving the detector keys on partitioning, not on the
    presence of function calls."""
    from pyspark.sql import Window

    df = spark.range(100).select(
        (F.col("id") % 7).alias("k"),
        F.when(F.col("id") % 3 == 0, F.col("id")).alias("a"),
        F.col("id").alias("b"),
    )
    flagged = df.select(
        F.row_number()
        .over(Window.orderBy(F.coalesce("a", "b"), F.col("b").desc()))
        .alias("rn")
    )
    clean = df.select(
        F.row_number()
        .over(
            Window.partitionBy("k").orderBy(
                F.coalesce("a", "b"), F.col("b").desc()
            )
        )
        .alias("rn")
    )

    def sweep(plan: str) -> list[str]:
        hits = []
        for line in plan.splitlines():
            if "windowspecdefinition" not in line:
                continue
            args = _window_spec_first_args(line)
            assert args, line
            hits.extend(a for a in args if _is_sort_expr(a))
        return hits

    assert sweep(_plan(flagged)), (
        "order-only coalesce(a,b) window escaped the sweep:\n"
        + _plan(flagged)
    )
    assert not sweep(_plan(clean)), (
        "partitioned window false-flagged:\n" + _plan(clean)
    )


def test_no_unpartitioned_window_in_registry(spark):
    """Registry-wide sweep (r7 verdict item 2): every
    `windowspecdefinition` in every registry plan must name at least
    one partition column. Spark plans `OVER (ORDER BY ...)` with no
    PARTITION BY — including PARTITION BY <constant>, which Catalyst
    folds away — as a SINGLE partition: one task sorts the world,
    dead at 100 TB. Waivers (bounded-input) are an explicit dict
    with the bounding argument on record."""
    violations = []
    for name, plan in _registry_plans(spark).items():
        if name in _UNPARTITIONED_WINDOW_WAIVERS:
            continue
        for line in plan.splitlines():
            if "windowspecdefinition" not in line:
                continue
            # an ORDER-BY-only spec starts with the sort column list
            # directly: windowspecdefinition(col#1, col#2 ASC ...) is
            # partitioned; windowspecdefinition(col#2 ASC ...) is not
            args = _window_spec_first_args(line)
            if not args:
                violations.append(f"{name}: unparsable spec: {line}")
                continue
            for first_arg in args:
                if _is_sort_expr(first_arg):
                    violations.append(f"{name}: {line.strip()[:160]}")
    assert not violations, (
        f"{len(violations)} unpartitioned global window(s):\n"
        + "\n".join(violations)
    )


def test_bucketed_tables_join_without_exchange(spark):
    """Co-located join: two tables bucketed by the join key into the
    same bucket count must SortMergeJoin with NO shuffle Exchange —
    the write-time partitioning IS the join shuffle, amortized across
    every downstream join (reference analog: its fnv%R bucket files,
    worker.go:142-151, made durable)."""
    from mapreducego_spark.sources.catalog import write_bucketed

    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    write_bucketed(o, "orders_b", ["o_custkey"], 8, sort_cols=["o_custkey"])
    write_bucketed(c, "customer_b", ["c_custkey"], 8, sort_cols=["c_custkey"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("orders_b").join(
            spark.table("customer_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # sanity: result matches the plain join
        plain = o.join(c, o.o_custkey == c.c_custkey).count()
        assert j.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_sample_deterministic_is_shuffle_free(spark):
    """Hash sampling is a pure per-row filter — the plan must contain
    no Exchange at all (scan -> filter -> project)."""
    from mapreducego_spark.functions.text import sample_deterministic

    plan = _plan(sample_deterministic(load_table(spark, SF, "lineitem")))
    assert "Exchange" not in plan, plan


def test_simhash_has_single_aggregate_no_expand(spark):
    """The de-exploded simhash must not contain a Generate/Expand of
    the 64 bit positions — one groupBy(doc_id) aggregate only."""
    from mapreducego_spark.functions.dedup import simhash_docs

    plan = _plan(simhash_docs(spark, SF))
    assert "Expand" not in plan
    # exactly one aggregation pair (partial + final) on doc_id
    assert plan.count("HashAggregate") == 2, plan.count("HashAggregate")


def test_decontaminate_broadcasts_bench_grams(spark):
    """The benchmark n-gram set must reach the semi join as a
    broadcast — the corpus side is never shuffled on n-grams."""
    from mapreducego_spark.functions.text import decontaminate

    plan = _plan(decontaminate(load_table(spark, SF, "documents")))
    assert "BroadcastExchange" in plan, plan


def test_ivf_probe_side_broadcasts(spark):
    """IVF candidate generation: the exploded query-probe side is
    broadcast; the corpus is scanned once with no shuffle on cell."""
    from mapreducego_spark.functions.vector import vector_ann_ivf

    plan = _plan(vector_ann_ivf(spark, SF))
    assert "BroadcastHashJoin" in plan, plan


def test_q3_plan_shape(spark):
    """Q3: filtered customer dim broadcast, fact filters pushed to
    the scans, top-10 via TakeOrderedAndProject (no global sort)."""
    from mapreducego_spark.operators.relational import q3_shipping_priority

    plan = _plan(q3_shipping_priority(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "l_shipdate" in plan.split("PushedFilters:")[1][:300]


def test_doc_grep_is_scan_fused(spark):
    """Distributed grep is a pure per-row expression: the match
    filter sits in the scan stage and the whole query has no
    Exchange at all."""
    from mapreducego_spark.functions.text import doc_grep

    plan = _plan(doc_grep(load_table(spark, SF, "documents")))
    assert "Exchange" not in plan, plan
    assert "regexp_extract_all" in plan


def test_q4_semi_join_and_pushdown(spark):
    """Q4 shape: the EXISTS must plan as a LeftSemi join (probe-only,
    never widens rows) with the quarter filter pushed to the orders
    scan and lineitem pruned to two columns."""
    from mapreducego_spark.operators.relational import q4_order_priority

    plan = _plan(q4_order_priority(spark, SF))
    assert "LeftSemi" in plan, plan
    assert "o_orderdate" in plan.split("PushedFilters:")[1][:400]
    li_scan = [ln for ln in plan.splitlines() if "Scan parquet" in ln or "FileScan" in ln]
    li_line = next(ln for ln in li_scan if "l_orderkey" in ln)
    assert "l_extendedprice" not in li_line  # column pruning on the fact side


def test_q7_dims_prefiltered_and_broadcast(spark):
    """Q7 shape: the 2-row nation pair filter must push into BOTH
    nation scans (so supplier/customer are pruned before the fact
    joins) and the nation joins must be broadcast."""
    from mapreducego_spark.operators.relational import q7_volume_shipping

    plan = _plan(q7_volume_shipping(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    # the IN filter reaches the nation scans as a data filter
    assert plan.count("IN (NATION_3,NATION_7)") >= 2, plan


def test_q19_cnf_prefilters_push_to_both_scans(spark):
    """Q19 shape: the manual CNF factoring must leave a pushed
    brand/size disjunction on the part scan and a quantity envelope
    on the lineitem scan — neither side scans its full table."""
    from mapreducego_spark.operators.relational import q19_disjunctive_revenue

    plan = _plan(q19_disjunctive_revenue(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    part_scan = next(ln for ln in scans if "p_partkey" in ln)
    li_scan = next(ln for ln in scans if "l_partkey" in ln)
    assert "Brand#12" in part_scan, part_scan
    assert "l_quantity" in li_scan, li_scan


def test_chunk_documents_is_scan_fused(spark):
    """Chunking is a per-row fan-out: tokenize/sequence/explode/slice
    all happen in the scan stage — no Exchange anywhere."""
    from mapreducego_spark.functions.text import chunk_documents

    plan = _plan(chunk_documents(load_table(spark, SF, "documents")))
    assert "Exchange" not in plan, plan


def test_quality_gate_broadcasts_cutoffs(spark):
    """The per-language quantile gate must broadcast the tiny cutoff
    table back onto the corpus — the corpus side is never shuffled
    (no SortMergeJoin/Exchange on the documents scan)."""
    from mapreducego_spark.functions.text import quality_gate_per_lang

    plan = _plan(quality_gate_per_lang(load_table(spark, SF, "documents")))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_sql_plugin_udf_is_arrow_batched(spark):
    """The registered SQL-plugin UDF must execute as an Arrow-batched
    pandas UDF (ArrowEvalPython), never as a row-at-a-time Python UDF
    (BatchEvalPython) — the last row-UDF in the codebase was converted
    in r4 and must not regress."""
    from mapreducego_spark.operators.mapreduce import sql_wordcount_udf

    plan = _plan(sql_wordcount_udf(spark, SF))
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_q21_rewrite_is_expand_free(spark):
    """The naive countDistinct pair would plan an Expand (2x every
    fact row pre-shuffle); the two-level per-pair/per-order rewrite
    must stay Expand-free."""
    from mapreducego_spark.operators.relational import q21_waiting_supplier

    assert "Expand" not in _plan(q21_waiting_supplier(spark, SF))


def test_vector_pair_kernels_are_arrow_batched(spark):
    """The brute-force cosine paths must score through the Arrow-
    batched numpy kernel (ArrowEvalPython) with the small side in
    the UDF closure — no nested-loop join, no per-pair Catalyst
    fold, no row-at-a-time Python UDF (r4 verdict: the expression
    fold is a constant-factor scale-killer at |corpus| x |bench|)."""
    from mapreducego_spark.functions.vector import (
        decontaminate_embedding,
        vector_topk,
    )

    for fn in (vector_topk, decontaminate_embedding):
        plan = _plan(fn(spark, SF))
        assert "ArrowEvalPython" in plan, plan
        assert "BatchEvalPython" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """At 100 TB the selective-dim regime where the dim is too big to
    broadcast is exactly where runtime Bloom-filter pruning pays: the
    optimizer injects might_contain(bloom(dim keys)) into the FACT
    scan's filter, dropping most fact rows before the shuffle. The
    fixture's dims all broadcast (so the regime never arises
    naturally); this gate forces the shuffle-join regime via confs
    and asserts Spark 4's runtime filter actually lands in the scan."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF, "lineitem")
        orders = load_table(spark, SF, "orders").filter(
            "o_orderpriority = '1-URGENT'"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = _plan(j)
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan.lower() or "BloomFilter" in plan, plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_join_strategy_hints_are_honored(spark):
    """The hint surface a tuner reaches for when AQE's choice is
    wrong: MERGE forces SortMergeJoin, SHUFFLE_HASH forces
    ShuffledHashJoin, BROADCAST forces BroadcastHashJoin — each on
    the same join that would otherwise pick differently."""
    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    cond = o.o_custkey == c.c_custkey

    merged = o.join(c.hint("merge"), cond)
    assert "SortMergeJoin" in _plan(merged)

    shuffled = o.join(c.hint("shuffle_hash"), cond)
    p = _plan(shuffled)
    assert "ShuffledHashJoin" in p and "SortMergeJoin" not in p

    bcast = o.join(c.hint("broadcast"), cond)
    assert "BroadcastHashJoin" in _plan(bcast)


def test_bucket_pruning_scans_single_bucket(spark):
    """Bucketed layout must also prune READS: an equality filter on
    the bucket key selects 1 of N bucket files (the plan reports
    'selected bucket(s)'), so a point lookup on a 100 TB bucketed
    table touches 1/N of it without any index."""
    from mapreducego_spark.sources.catalog import write_bucketed

    import uuid

    o = load_table(spark, SF, "orders")
    tbl = f"orders_prune_{uuid.uuid4().hex[:8]}"
    write_bucketed(o, tbl, ["o_custkey"], 16)
    # autoBucketedScan disables bucketed reading when no operator
    # needs the distribution — which also silently forfeits bucket
    # PRUNING on plain filters; pin it on for the lookup pattern
    prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        plan = _plan(spark.table(tbl).filter(F.col("o_custkey") == 77))
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev
        )
    import re as _re

    m = _re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, plan[:2000]
    assert int(m.group(1)) == 1 and int(m.group(2)) == 16


def test_no_single_partition_global_window(spark):
    """quantile_normalize and the sorted-neighborhood generator use
    the two-phase count+offset rank — their plans must contain NO
    unpartitioned window (Spark plans `row_number() OVER (ORDER BY
    ...)` with no PARTITION BY as a single partition: one task sorts
    the world, dead at 100 TB)."""
    from mapreducego_spark.operators.fuzzy import snm_match_customers
    from mapreducego_spark.operators.relational import quantile_normalize

    for df in [quantile_normalize(spark, SF), snm_match_customers(spark, SF)]:
        plan = _plan(df)
        for line in plan.splitlines():
            if "Window" not in line or "windowspecdefinition" not in line:
                continue
            # every windowspecdefinition must name at least one
            # partition column before the frame spec — an ORDER-BY-
            # only spec starts with the sort column list directly,
            # so require a partitionBy column list prefix:
            # windowspecdefinition(col#1, col#2 ASC ... would be
            # partitioned; windowspecdefinition(col#2 ASC ... is not
            args = _window_spec_first_args(line)
            assert args, line
            for first_arg in args:
                assert not _is_sort_expr(first_arg), (
                    "unpartitioned global window found: "
                    + line.strip()[:200]
                )
