"""Round-6 operators: Pearson correlation matrix, MAD outliers,
lang x source PMI, token entropy, vocabulary coverage, per-source
quota cap, incremental SCD-2 apply, and fixed-round k-core peeling —
each checked against an independent serial (numpy / pure-Python)
reference or an algebraic law, not just its DuckDB oracle."""

from __future__ import annotations

import math
from collections import Counter

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.01"
SF_TINY = "/root/testdata/sf0.001"


def test_corr_matrix_matches_numpy_serial_reference(spark):
    import numpy as np

    from mapreducego_spark.operators.relational import corr_matrix
    from mapreducego_spark.sources.catalog import load_table

    got = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in corr_matrix(spark, SF_TINY).collect()
    }
    rows = (
        load_table(spark, SF_TINY, "lineitem")
        .select("l_quantity", "l_discount", "l_tax")
        .collect()
    )
    q = np.array([round(r[0]) for r in rows], dtype=np.float64)
    d = np.array([round(r[1] * 100) for r in rows], dtype=np.float64)
    t = np.array([round(r[2] * 100) for r in rows], dtype=np.float64)
    ref = {
        ("quantity", "discount_pct"): np.corrcoef(q, d)[0, 1],
        ("quantity", "tax_pct"): np.corrcoef(q, t)[0, 1],
        ("discount_pct", "tax_pct"): np.corrcoef(d, t)[0, 1],
    }
    assert set(got) == set(ref)
    for k in ref:
        assert abs(got[k] - ref[k]) < 1e-6, (k, got[k], ref[k])


def test_outlier_mad_matches_serial_reference(spark):
    import numpy as np

    from mapreducego_spark.operators.relational import outlier_mad
    from mapreducego_spark.sources.catalog import load_table

    got = {
        r["event_type"]: (r["med"], r["mad"], r["n_events"], r["n_outliers"])
        for r in outlier_mad(spark, SF_TINY).collect()
    }
    by_type: dict[str, list[float]] = {}
    for r in (
        load_table(spark, SF_TINY, "events")
        .select("event_type", "value")
        .collect()
    ):
        by_type.setdefault(r[0], []).append(r[1])
    for et, vals in by_type.items():
        med = round(float(np.percentile(vals, 50)), 6)
        mad = round(float(np.percentile([abs(v - med) for v in vals], 50)), 6)
        cut = 3.0 * 1.4826 * mad
        n_out = sum(1 for v in vals if abs(v - med) > cut)
        assert got[et] == (med, mad, len(vals), n_out), et


def test_mutual_information_micro_nats_match_python(spark):
    from mapreducego_spark.functions.text import mutual_information
    from mapreducego_spark.sources.catalog import load_table

    rows = mutual_information(spark, SF_TINY).collect()
    cells = Counter(
        (r[0], r[1])
        for r in load_table(spark, SF_TINY, "documents")
        .select("lang", "source")
        .collect()
    )
    n = sum(cells.values())
    n_x = Counter()
    n_y = Counter()
    for (lang, src), c in cells.items():
        n_x[lang] += c
        n_y[src] += c
    assert len(rows) == len(cells)
    for r in rows:
        c = cells[(r["lang"], r["source"])]
        pmi = math.floor(
            math.log(n * c / (n_x[r["lang"]] * n_y[r["source"]])) * 1_000_000
        )
        assert (r["n_xy"], r["pmi_micro"], r["mi_contrib_micro"]) == (
            c,
            pmi,
            c * pmi,
        )
    # MI >= 0 up to the floor quantization (each term off by < 1e-6 nat)
    total = sum(r["mi_contrib_micro"] for r in rows)
    assert total >= -len(rows)


def test_entropy_score_extremes(spark):
    """A doc of one repeated token has H=0; distinct-token docs hit
    ln(n). Checked through the same tokenizer on a serial path."""
    from mapreducego_spark.functions.text import entropy_score
    from mapreducego_spark.sources.catalog import load_table

    got = {
        r["doc_id"]: (r["n_tokens"], r["entropy_nats"])
        for r in entropy_score(spark, SF_TINY).collect()
    }
    # serial reference over the same fixture
    import re as _re

    for r in (
        load_table(spark, SF_TINY, "documents")
        .select("doc_id", "text")
        .limit(50)
        .collect()
    ):
        toks = [t for t in _re.split("[^a-z]+", r["text"].lower()) if t]
        if not toks:
            assert r["doc_id"] not in got
            continue
        counts = Counter(toks)
        n = len(toks)
        s = sum(c * math.floor(math.log(c) * 1e6) for c in counts.values())
        h = round((math.floor(math.log(n) * 1e6) - s / n) / 1e6, 6)
        assert got[r["doc_id"]] == (n, h), r["doc_id"]
        assert -1e-6 <= h <= math.log(n) + 1e-6


def test_vocab_coverage_rates_and_monotone_vocab(spark):
    from mapreducego_spark.functions.text import vocab_coverage

    small = {
        r["doc_id"]: r["n_oov"]
        for r in vocab_coverage(spark, SF_TINY, vocab_size=50).collect()
    }
    big = {
        r["doc_id"]: r["n_oov"]
        for r in vocab_coverage(spark, SF_TINY, vocab_size=500).collect()
    }
    assert set(small) == set(big)
    # a larger vocabulary can only reduce OOV counts
    assert all(big[d] <= small[d] for d in small)
    rows = vocab_coverage(spark, SF_TINY).collect()
    assert all(0.0 <= r["oov_rate"] <= 1.0 for r in rows)
    assert all(r["n_oov"] <= r["n_tokens"] for r in rows)


def test_source_cap_bounds_and_determinism(spark):
    from mapreducego_spark.functions.text import source_cap
    from mapreducego_spark.sources.catalog import load_table

    out = source_cap(spark, SF, cap=50)
    rows = out.collect()
    per_source = Counter(r["source"] for r in rows)
    assert all(c <= 50 for c in per_source.values())
    # every source with >= 50 docs is capped exactly at 50
    totals = {
        r["source"]: r["n"]
        for r in load_table(spark, SF, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for s, n in totals.items():
        assert per_source[s] == min(n, 50), s
    # deterministic: a second evaluation yields the same survivor set
    again = {(r["doc_id"], r["rk"]) for r in source_cap(spark, SF, cap=50).collect()}
    assert {(r["doc_id"], r["rk"]) for r in rows} == again


def test_scd2_apply_equals_rebuild(spark):
    """The replication law: applying snapshot v4 to the v1..v3
    history equals rebuilding from all four snapshots."""
    from mapreducego_spark.sources.catalog import (
        load_table,
        scd2_apply,
        scd2_history,
    )

    docs = load_table(spark, SF_TINY, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang", "source"
    )
    v1 = docs.filter(F.col("doc_id") % 11 != 3)
    v2 = docs.withColumn(
        "lang",
        F.when(F.col("doc_id") % 5 == 0, F.lit("xx")).otherwise(F.col("lang")),
    )
    v3 = v2.filter(F.col("doc_id") % 7 != 2).withColumn(
        "source",
        F.when(F.col("doc_id") % 3 == 0, F.lit("web2"))
        .otherwise(F.col("source")),
    )
    v4 = v2.withColumn(
        "source",
        F.when(F.col("doc_id") % 3 == 0, F.lit("web2"))
        .otherwise(F.col("source")),
    ).withColumn(
        "lang",
        F.when(F.col("doc_id") % 13 == 1, F.lit("yy")).otherwise(F.col("lang")),
    )
    hist3 = scd2_history([v1, v2, v3], key="doc_id", attrs=["lang", "source"])
    applied = scd2_apply(
        hist3, v4, key="doc_id", attrs=["lang", "source"], version=4
    )
    rebuilt = scd2_history(
        [v1, v2, v3, v4], key="doc_id", attrs=["lang", "source"]
    )
    key = lambda r: (  # noqa: E731
        r["doc_id"], r["valid_from"], r["valid_to"], r["lang"],
        r["source"], r["is_current"],
    )
    assert sorted(map(key, applied.collect())) == sorted(
        map(key, rebuilt.collect())
    )
    # a delete-then-re-insert key has TWO segments, not one merged run
    seg_counts = Counter(r["doc_id"] for r in applied.collect())
    reinserted = [d for d in seg_counts if d % 7 == 2 and d % 11 != 3]
    assert reinserted and all(seg_counts[d] >= 2 for d in reinserted)


def test_asof_tolerance_nulls_stale_matches_only(spark):
    """tolerance=0 forces every non-exact-timestamp match to null;
    a huge tolerance must reproduce the unbounded join exactly."""
    from mapreducego_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100, "2024-01-10 00:00:00"), (2, 100, "2024-03-01 00:00:00")],
        "id long, k long, t string",
    )
    right = spark.createDataFrame(
        [(100, "2024-01-01 00:00:00", 7.0)], "k2 long, rt string, v double"
    )
    def run(tol):
        return {
            r["id"]: r["v"]
            for r in asof_join(
                left, right, "k", "k2", "t", "rt", ["v"],
                tolerance_seconds=tol,
            ).collect()
        }
    # 9 days late: inside a 10-day tolerance, outside a 1-day one
    assert run(10 * 86400) == {1: 7.0, 2: None}
    assert run(86400) == {1: None, 2: None}
    assert run(None) == {1: 7.0, 2: 7.0}


def test_vector_range_agrees_with_topk_scores(spark):
    """Range search and top-k share the kernel; every top-k hit with
    cos >= radius must appear in the range result with the SAME
    rounded score, and every range hit must satisfy the radius."""
    from mapreducego_spark.functions.vector import (
        RANGE_RADIUS,
        vector_range_search,
        vector_topk,
    )

    rng = {
        (r["q_id"], r["vec_id"]): r["cos_sim"]
        for r in vector_range_search(spark, SF_TINY).collect()
    }
    assert rng and all(c >= RANGE_RADIUS for c in rng.values())
    for r in vector_topk(spark, SF_TINY).collect():
        if r["cos_sim"] >= RANGE_RADIUS:
            assert rng[(r["q_id"], r["vec_id"])] == r["cos_sim"]


def test_winsorize_conserves_rows_and_bounds_sum(spark):
    import numpy as np

    from mapreducego_spark.operators.relational import winsorize_events
    from mapreducego_spark.sources.catalog import load_table

    got = {r["event_type"]: r for r in winsorize_events(spark, SF_TINY).collect()}
    by_type: dict[str, list[float]] = {}
    for r in (
        load_table(spark, SF_TINY, "events")
        .select("event_type", "value")
        .collect()
    ):
        by_type.setdefault(r[0], []).append(r[1])
    for et, vals in by_type.items():
        g = got[et]
        p01 = round(float(np.percentile(vals, 1)), 6)
        p99 = round(float(np.percentile(vals, 99)), 6)
        assert (g["p01"], g["p99"]) == (p01, p99)
        assert g["n_events"] == len(vals)
        assert g["n_clipped_lo"] == sum(1 for v in vals if v < p01)
        assert g["n_clipped_hi"] == sum(1 for v in vals if v > p99)
        ref = round(
            sum(round(min(max(v, p01), p99) * 100) for v in vals) / 100.0, 2
        )
        assert abs(g["sum_winsorized"] - ref) < 1e-9


def test_mode_per_group_tie_break_is_total(spark):
    from mapreducego_spark.operators.relational import mode_per_group
    from mapreducego_spark.sources.catalog import load_table

    got = {
        r["user_id"]: (r["mode_event"], r["n_events"])
        for r in mode_per_group(spark, SF_TINY).collect()
    }
    counts: dict[int, Counter] = {}
    for r in (
        load_table(spark, SF_TINY, "events")
        .select("user_id", "event_type")
        .collect()
    ):
        counts.setdefault(r[0], Counter())[r[1]] += 1
    assert set(got) == set(counts)
    for u, c in counts.items():
        best = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert got[u] == (best[0], best[1]), u


def test_round6_single_scan_plan_gates(spark):
    """Single-pass claims, plan-asserted: corr_matrix reads lineitem
    once; mutual_information and entropy_score read documents once."""
    from mapreducego_spark.functions.text import entropy_score, mutual_information
    from mapreducego_spark.operators.relational import corr_matrix

    for df, n_scans in [
        (corr_matrix(spark, SF_TINY), 1),
        (mutual_information(spark, SF_TINY), 1),
        (entropy_score(spark, SF_TINY), 1),
    ]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan parquet") <= n_scans, plan[:2000]


def test_source_cap_partition_invariant(spark):
    """The md5-priority + doc_id tie-break is a total order, so the
    survivor set cannot depend on physical partitioning."""
    from mapreducego_spark.functions.text import source_cap

    base = {(r["doc_id"], r["rk"]) for r in source_cap(spark, SF).collect()}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        again = {
            (r["doc_id"], r["rk"]) for r in source_cap(spark, SF).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == again


def _serial_bpe_merge(arr, a, b):
    """Canonical greedy-left BPE merge of pair (a, b) over a symbol
    list (Sennrich et al.) — whole-symbol compares only, never the
    substring-replace shortcut that can merge across boundaries."""
    out = []
    for x in arr:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def test_bpe_train_matches_serial_reference(spark):
    """The learned merge list must equal a straightforward serial BPE
    over the same word counts (greedy-left whole-symbol merge,
    lexical ties)."""
    import re as _re

    from mapreducego_spark.functions.text import bpe_train
    from mapreducego_spark.sources.catalog import load_table

    got = [
        (r["step"], r["pair"], r["merged"], r["pair_count"])
        for r in bpe_train(spark, SF_TINY).collect()
    ]
    base = Counter()
    for r in load_table(spark, SF_TINY, "documents").select("text").collect():
        for w in _re.split("[^a-z]+", r["text"].lower()):
            if w:
                base[" ".join(w)] += 1
    ref = []
    words = Counter(base)
    for step in range(1, 4):
        pc = Counter()
        for syms, c in words.items():
            arr = syms.split(" ")
            for a, b in zip(arr, arr[1:]):
                pc[f"{a} {b}"] += c
        if not pc:
            break
        pair, cnt = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merged = pair.replace(" ", "")
        ref.append((step, pair, merged, cnt))
        pa, pb = pair.split(" ")
        nxt = Counter()
        for syms, c in words.items():
            nxt[" ".join(_serial_bpe_merge(syms.split(" "), pa, pb))] += c
        words = nxt
    assert got == ref


def test_bpe_merge_replace_is_boundary_exact(spark):
    """The double-space-representation merge must NOT fire across
    symbol boundaries: rule (h, e) applied to symbols [th, e] must
    leave the word untouched — the exact case where a single-space
    substring replace deviates from canonical BPE. Also pins
    greedy-left non-overlap on repeats and CONSECUTIVE occurrences
    (the case a boundary-wrapped single replace misses because the
    first match consumes the next match's leading space)."""
    from mapreducego_spark.functions.text import _bpe_merge_replace

    def rep(symbols):  # list -> ' a  b  c '
        return " " + "  ".join(symbols) + " "

    cases = [
        # (symbols, a, b, expected symbols)
        (["th", "e"], "h", "e", ["th", "e"]),  # cross-boundary: no merge
        (["x", "h", "e"], "h", "e", ["x", "he"]),
        (["h", "e", "h", "e"], "h", "e", ["he", "he"]),  # consecutive
        (["a", "a", "a"], "a", "a", ["aa", "a"]),  # greedy-left
        (["he", "r"], "e", "r", ["he", "r"]),  # suffix of a merged sym
        (["q"], "h", "e", ["q"]),
    ]
    df = spark.createDataFrame(
        [(i, rep(s)) for i, (s, _, _, _) in enumerate(cases)],
        "i long, syms string",
    )
    for i, (syms, a, b, want) in enumerate(cases):
        got = (
            df.filter(F.col("i") == i)
            .select(_bpe_merge_replace(F.col("syms"), a, b).alias("m"))
            .collect()[0]["m"]
        )
        assert got == rep(want), (syms, a, b, got, want)
        # the independent serial list-fold agrees
        assert _serial_bpe_merge(syms, a, b) == want


def test_dedup_eval_fp_zero_and_recall_floor(spark):
    """LSH verification makes false positives structurally impossible
    (candidates re-checked with the exact arithmetic); banding theory
    puts recall near 1 at the fixture's pair strengths."""
    from mapreducego_spark.functions.dedup import dedup_eval

    r = dedup_eval(spark, SF).collect()[0]
    assert r["fp"] == 0
    assert r["tp"] + r["fn"] == r["n_exact"]
    assert r["n_exact"] > 0
    assert r["recall"] >= 0.9


def test_kcore_reaches_fixpoint_and_degrees_are_core(spark):
    from mapreducego_spark.operators.graph import kcore_peel
    from mapreducego_spark.sources.catalog import load_table

    li = load_table(spark, SF, "lineitem")
    ps = (
        li.filter(F.col("l_quantity") == 1)
        .select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    a = ps.select("p", F.col("s").alias("src"))
    b = ps.select(F.col("p").alias("p2"), F.col("s").alias("dst"))
    edges = (
        a.join(b, a.p == b.p2)
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint()
    )
    r4 = {(r["node"], r["degree"]) for r in kcore_peel(edges, 3, 4).collect()}
    r5 = {(r["node"], r["degree"]) for r in kcore_peel(edges, 3, 5).collect()}
    # the registry's 4 rounds reach the fixpoint on the fixture, so
    # the fixed-round output IS the true 3-core there
    assert r4 == r5
    assert r4, "3-core unexpectedly empty — pick a smaller k"
    assert min(d for _, d in r4) >= 3
