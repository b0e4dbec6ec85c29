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


# --- round-5 post-verdict operators ------------------------------------

_snap_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),           # key
        st.sampled_from(["a", "b", "c", None]),          # payload 1
        st.integers(min_value=0, max_value=3),           # payload 2
    ),
    min_size=0,
    max_size=10,
    unique_by=lambda r: r[0],
)


@settings(max_examples=10, deadline=None)
@given(old=_snap_rows, new=_snap_rows)
def test_cdc_round_trip_law_randomized(spark, old, new):
    """apply(old, diff(old, new)) == new for arbitrary key-unique
    snapshots, including NULL payloads, pure inserts, pure deletes,
    and empty sides."""
    from mapreducego_spark.sources.catalog import cdc_apply, snapshot_diff_rows

    schema = "k long, a string, b long"
    o = spark.createDataFrame(old or [(None, None, None)], schema).filter(
        "k is not null"
    )
    n = spark.createDataFrame(new or [(None, None, None)], schema).filter(
        "k is not null"
    )
    feed = snapshot_diff_rows(o, n, ["k"])
    applied = cdc_apply(o, feed, ["k"])
    assert {tuple(r) for r in applied.collect()} == {
        tuple(r) for r in n.collect()
    }
    # minimality: unchanged keys never appear in the feed
    unchanged = {r[0] for r in old} & {r[0] for r in new}
    old_map = {r[0]: r for r in old}
    new_map = {r[0]: r for r in new}
    truly_unchanged = {k for k in unchanged if old_map[k] == new_map[k]}
    assert not ({r.k for r in feed.collect()} & truly_unchanged)


_agg_rows = st.lists(
    st.tuples(
        st.sampled_from(["hot", "hot", "hot", "cold"]),  # skewed key
        st.integers(min_value=0, max_value=15),          # user
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None)
@given(rows=_agg_rows, n_salt=st.sampled_from([1, 2, 7]))
def test_salted_distinct_agg_randomized(spark, rows, n_salt):
    from pyspark.sql import functions as F2

    from mapreducego_spark.operators.skew import salted_distinct_agg

    df = spark.createDataFrame(rows, ["k", "u"])
    got = {
        r.k: (r.n_distinct, r.n_rows)
        for r in salted_distinct_agg(
            df, ["k"], "u", {"n_rows": (F2.lit(1), "count")}, n_salt=n_salt
        ).collect()
    }
    want = {}
    for k, u in rows:
        want.setdefault(k, [set(), 0])
        want[k][0].add(u)
        want[k][1] += 1
    assert got == {k: (len(s), c) for k, (s, c) in want.items()}


_graph_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=0,
    max_size=20,
)


@settings(max_examples=10, deadline=None)
@given(edges=_graph_edges)
def test_triangle_count_matches_brute_force(spark, edges):
    from mapreducego_spark.operators.graph import triangle_count

    simple = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = {}
    for a, b in simple:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in (x for x in nodes if x > a and x in adj[a]):
            for c in (x for x in nodes if x > b and x in adj[a] and x in adj[b]):
                for n in (a, b, c):
                    want[n] = want.get(n, 0) + 1
    df = spark.createDataFrame(
        list(edges) or [(None, None)], "src long, dst long"
    ).filter("src is not null")
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert got == want


@settings(max_examples=8, deadline=None)
@given(edges=_graph_edges, source=st.integers(min_value=0, max_value=9))
def test_shortest_paths_match_brute_bfs(spark, edges, source):
    from collections import deque

    from mapreducego_spark.operators.graph import shortest_paths

    adj = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    want = {source: 0}
    q = deque([source])
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in want:
                want[v] = want[u] + 1
                q.append(v)
    df = spark.createDataFrame(
        list(edges) or [(None, None)], "src long, dst long"
    ).filter("src is not null")
    got = {r.id: r.dist for r in shortest_paths(df, source).collect()}
    assert got == want


# --- round 7: BPE merge-representation equivalence (pure Python) ---

_syms = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=3), min_size=1, max_size=8
)
_pair = st.tuples(
    st.text(alphabet="abcd", min_size=1, max_size=3),
    st.text(alphabet="abcd", min_size=1, max_size=3),
)


@settings(max_examples=300, deadline=None)
@given(syms=_syms, pair=_pair)
def test_bpe_double_space_replace_equals_list_fold(syms, pair):
    """The double-space literal replace (what the engine and oracle
    run) must equal the canonical greedy-left whole-symbol list fold
    for EVERY symbol sequence and merge pair — the law that makes
    one replace() a correct BPE merge step."""
    a, b = pair
    # canonical fold
    out = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    # double-space representation replace
    s = " " + "  ".join(syms) + " "
    replaced = s.replace(f" {a}  {b} ", f" {a}{b} ")
    assert replaced.strip().split("  ") == out, (syms, pair)


# --- round 7: PNG codec roundtrip under every filter type ---

_png_dims = st.tuples(
    st.integers(min_value=1, max_value=9), st.integers(min_value=1, max_value=7)
)


@settings(max_examples=60, deadline=None)
@given(
    dims=_png_dims,
    seed=st.integers(min_value=0, max_value=2**31),
    filters=st.lists(
        st.integers(min_value=0, max_value=4), min_size=7, max_size=7
    ),
)
def test_png_decode_inverts_every_filter_randomized(dims, seed, filters):
    """decode_png must invert arbitrary per-scanline filter choices
    on arbitrary pixel data — the spec property, not just the
    filter-0 images our writer emits."""
    import hashlib as _h
    import struct
    import zlib

    from mapreducego_spark.functions.multimodal import (
        PNG_MAGIC,
        _png_chunk,
        decode_png,
    )

    w, h = dims
    npx = w * h * 3
    px = (_h.md5(str(seed).encode()).digest() * (npx // 16 + 1))[:npx]
    stride = w * 3
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = px[y * stride : (y + 1) * stride]
        f = filters[y % len(filters)]
        out = bytearray([f])
        for x in range(stride):
            aa = line[x - 3] if x >= 3 else 0
            bb = prev[x]
            cc = prev[x - 3] if x >= 3 else 0
            if f == 0:
                v = line[x]
            elif f == 1:
                v = (line[x] - aa) & 0xFF
            elif f == 2:
                v = (line[x] - bb) & 0xFF
            elif f == 3:
                v = (line[x] - ((aa + bb) >> 1)) & 0xFF
            else:
                p = aa + bb - cc
                pa, pb, pc = abs(p - aa), abs(p - bb), abs(p - cc)
                pr = (
                    aa
                    if pa <= pb and pa <= pc
                    else (bb if pb <= pc else cc)
                )
                v = (line[x] - pr) & 0xFF
            out.append(v)
        raw.extend(out)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png(png) == (w, h, px)
