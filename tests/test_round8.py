"""Round-8 hygiene fixes: the higher-order-function rewrite of
mix_sources' quota apportionment (no window of any kind left in the
quota path), the distributed json_rescue staging with explicit
field-nulling on rescued rows, and the two_phase_global_rank
reserved-column guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"
SF_TINY = "/root/testdata/sf0.001"


def test_two_phase_rank_rejects_reserved_columns(spark):
    """The general-purpose rank helper must refuse inputs that would
    be silently clobbered: an existing rank_col or __pid column."""
    from mapreducego_spark.operators.twophase import two_phase_global_rank

    df = spark.range(5).select(
        F.col("id"), F.lit(0).alias("rn"), F.lit(1).alias("v")
    )
    with pytest.raises(ValueError, match="rn"):
        two_phase_global_rank(df, ["id"], rank_col="rn")
    df2 = spark.range(5).select(F.col("id"), F.lit(0).alias("__pid"))
    with pytest.raises(ValueError, match="__pid"):
        two_phase_global_rank(df2, ["id"])


def test_mix_sources_quota_path_is_window_free(spark):
    """r7 finding: the quota arithmetic used Window.partitionBy(
    lit(1)), which Catalyst folds to an UNPARTITIONED window (the
    'No Partition Defined' WindowExec). The r8 rewrite does the whole
    Hamilton apportionment inside one single-row struct array via
    higher-order functions, so curriculum_mix's plan must contain
    exactly ONE window — the per-source selection rank — and it must
    be partitioned."""
    import re

    from mapreducego_spark.functions.text import curriculum_mix

    plan = (
        curriculum_mix(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    specs = [
        line
        for line in plan.splitlines()
        if "windowspecdefinition" in line
    ]
    assert len(specs) == 1, plan
    m = re.search(r"windowspecdefinition\(([^,]+),", specs[0])
    assert m and " ASC" not in m.group(1) and " DESC" not in m.group(1), (
        specs[0]
    )


def test_mix_sources_quota_is_upper_bound_on_small_sources(spark):
    """Documented contract: a source smaller than its largest-
    remainder quota keeps only its n_docs rows (budget becomes an
    upper bound; seats are NOT reallocated)."""
    from mapreducego_spark.functions.text import mix_sources

    rows = [(i, "big") for i in range(1000)] + [(10_000, "tiny")]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = mix_sources(docs, alpha=0.5, budget=200).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # tiny's sqrt-share earns it several seats but it has ONE doc
    tiny = by_src["tiny"]
    assert len(tiny) == 1
    assert tiny[0]["quota"] >= 1
    # big fills its quota exactly; the total underfills the budget by
    # exactly tiny's unfillable seats
    big = by_src["big"]
    assert len(big) == big[0]["quota"]
    assert len(out) == 200 - (tiny[0]["quota"] - 1)


def test_json_rescue_staging_is_distributed_and_nulls_fields(spark):
    """The r8 rewrite stages the corrupted JSONL via column
    expressions + df.write.text (no driver collect), and nulls
    lang/source on rescued rows EXPLICITLY (version-proof against
    Spark's partial-result JSON parsing, SPARK-40646 lineage)."""
    from mapreducego_spark.sources.catalog import json_rescue, load_table

    out = json_rescue(spark, SF_TINY).collect()
    n_docs = load_table(spark, SF_TINY, "documents").count()
    assert len(out) == n_docs
    for r in out:
        assert r["rescued"] == (r["doc_id"] % 13 == 0)
        if r["rescued"]:
            assert r["lang"] is None and r["source"] is None
        else:
            assert r["lang"] is not None
