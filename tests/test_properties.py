"""Property-based tests (hypothesis) for the hand-built operators —
the ones Catalyst doesn't verify for us: the as-of union-merge
construction, shingling, and deterministic hash sampling.

Examples are kept small and few (Spark createDataFrame per example is
~100ms); the point is randomized coverage of edge shapes (empty
sides, ties, all-equal keys), not volume.
"""

from __future__ import annotations

from datetime import datetime, timezone

from hypothesis import given, settings
from hypothesis import strategies as st

from mapreducego_spark.operators.asof import asof_join

# (key, time) pairs over tiny domains to force collisions and ties
_key = st.integers(min_value=0, max_value=3)
_time = st.integers(min_value=0, max_value=20)

_left_rows = st.lists(st.tuples(_key, _time), min_size=0, max_size=12)
_right_rows = st.lists(
    st.tuples(_key, _time, st.integers(min_value=0, max_value=99)),
    min_size=0,
    max_size=12,
)


def _ts(n: int) -> datetime:
    return datetime.fromtimestamp(86400 * n, tz=timezone.utc).replace(tzinfo=None)


def _brute_asof(left, right):
    """Reference semantics: latest right row with time <= left time,
    tie-broken by highest value column (the tie_break arg)."""
    out = {}
    for i, (lk, lt) in enumerate(left):
        best = None
        for rk, rt, rv in right:
            if rk == lk and rt <= lt:
                cand = (rt, rv)
                if best is None or cand > best:
                    best = cand
        out[i] = best[1] if best else None
    return out


@settings(max_examples=12, deadline=None)
@given(left=_left_rows, right=_right_rows)
def test_asof_join_matches_brute_force(spark, left, right):
    ldf = spark.createDataFrame(
        [(i, k, _ts(t)) for i, (k, t) in enumerate(left)] or [(None, None, None)],
        "lid long, k long, t timestamp",
    ).filter("lid is not null")
    rdf = spark.createDataFrame(
        [(k, _ts(t), v) for k, t, v in right] or [(None, None, None)],
        "rk long, rt timestamp, rv long",
    ).filter("rk is not null")
    got = {
        r.lid: r.rv
        for r in asof_join(
            ldf,
            rdf,
            left_on="k",
            right_on="rk",
            left_time="t",
            right_time="rt",
            right_values=["rv"],
            tie_break="rv",
        ).collect()
    }
    assert got == _brute_asof(left, right)


_tokens = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=2), min_size=0, max_size=8
)


@settings(max_examples=15, deadline=None)
@given(toks=_tokens)
def test_bigram_shingles_match_python_reference(spark, toks):
    from pyspark.sql import functions as F

    from mapreducego_spark.functions.dedup import shingles_from_tokens

    df = spark.createDataFrame([(toks,)], "toks array<string>")
    got = df.select(shingles_from_tokens(F.col("toks"), 2).alias("s")).collect()[0].s
    want = list(dict.fromkeys(f"{a} {b}" for a, b in zip(toks, toks[1:])))
    assert got == want


def test_sampling_is_stable_under_repartitioning(spark):
    """The hash sample must pick the SAME rows regardless of how the
    input is partitioned — the property rand()-based sampling lacks."""
    from mapreducego_spark.functions.text import sample_deterministic
    from mapreducego_spark.sources.catalog import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    a = {
        (r.l_orderkey, r.l_linenumber)
        for r in sample_deterministic(li).collect()
    }
    b = {
        (r.l_orderkey, r.l_linenumber)
        for r in sample_deterministic(li.repartition(7)).collect()
    }
    assert a == b and len(a) > 0
