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


# ---------------------------------------------- r15: codec properties


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3_600_000),
            st.integers(min_value=1, max_value=120_000),
            st.text(
                alphabet=st.characters(
                    codec="latin-1",
                    exclude_characters="\r\n\x00",
                    exclude_categories=("Cc",),
                ),
                min_size=1,
                max_size=40,
            ).map(str.strip).filter(bool),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_subtitle_round_trip_randomized(cue_specs):
    """SRT and VTT writers/readers invert each other for arbitrary
    cue timing and Latin-1 single-line text (the wire alphabet the
    fixtures use; multi-line is covered by the unit tests)."""
    from mapreducego_spark.sources.subtitlecodec import (
        build_srt,
        build_vtt,
        parse_srt,
        parse_vtt,
    )

    cues = [(start, start + dur, text) for start, dur, text in cue_specs]
    got = parse_srt(build_srt(cues))
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in got] == cues
    got = parse_vtt(build_vtt(cues, with_ids=True, settings_every=2))
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in got] == cues


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=3, max_value=4),
    st.lists(
        st.tuples(
            st.sampled_from(["TIT2", "TPE1", "TALB", "TCON", "TRCK"]),
            st.text(min_size=0, max_size=60).map(
                lambda s: s.replace("\x00", "")
            ),
            st.sampled_from([0, 1, 3]),
        ),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=0, max_value=130),
)
def test_id3v2_round_trip_randomized(version, specs, pad):
    """build_id3v2 -> parse_id3v2_frames inverts for arbitrary frame
    lists across both versions, all encodings, and padding sizes
    that straddle the 127-byte syncsafe boundary. Latin-1-unsafe
    text downgrades to UTF-16; UTF-8 downgrades to UTF-16 on v2.3
    (the builder refuses it, which is itself the contract)."""
    from mapreducego_spark.functions.mediameta import (
        build_id3v2,
        parse_id3v2_frames,
    )

    frames = []
    for fid, text, enc in specs:
        if enc == 3 and version == 3:
            enc = 1
        if enc == 0:
            try:
                text.encode("latin-1")
            except UnicodeEncodeError:
                enc = 1
        frames.append((fid, text, enc))
    tag = build_id3v2(frames, version=version, pad=pad)
    tb, got = parse_id3v2_frames(tag)
    assert tb == len(tag)
    assert [(f["frame_id"], f["text"], f["encoding"]) for f in got] == [
        (fid, text.rstrip("\x00"), enc) for fid, text, enc in frames
    ]


@settings(max_examples=25, deadline=None)
@given(
    st.sampled_from([44100, 48000, 32000]),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=3),
    st.sampled_from(["Xing", "VBRI"]),
    st.integers(min_value=0, max_value=13),
)
def test_mp3_vbr_walk_randomized(rate, n_frames, mode, kind, phase):
    """The VBR walk recovers exact frame counts, audio bytes, and
    floor-mean bitrate for arbitrary per-frame bitrate cycles,
    rates, channel modes, and both tag kinds."""
    from mapreducego_spark.functions.mediameta import (
        _MP3_BITRATES,
        build_mp3_vbr,
        parse_mp3_meta,
    )

    kbps_fn = lambda j: _MP3_BITRATES[1 + (phase + j) % 14]  # noqa: E731
    b = build_mp3_vbr(rate, n_frames, mode, -1, False, kind=kind,
                      kbps_fn=kbps_fn, seed=phase)
    d = parse_mp3_meta(b)
    ab = sum(
        144_000 * kbps_fn(j) // rate + (1 if j % 3 == 2 else 0)
        for j in range(n_frames)
    )
    assert d["vbr"] and d["n_frames"] == n_frames
    assert d["audio_bytes"] == ab + 144_000 * 64 // rate
    assert d["bitrate_kbps"] == ab * 8 * rate // (n_frames * 1152 * 1000)
    assert d["channels"] == (1 if mode == 3 else 2)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["trun", "tfhd", "trex"]),
            st.integers(min_value=1, max_value=12),
            st.integers(min_value=1, max_value=500),
        ),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=400),
    st.booleans(),
)
def test_mp4_fragment_duration_chain_randomized(specs, trex_dur, v1):
    """Per-fragment duration accumulation matches the brute sum for
    arbitrary mixes of the three default levels."""
    from mapreducego_spark.functions.mediameta import (
        build_mp4_fragmented,
        parse_mp4_meta,
    )

    frags, want = [], 0
    for mode, samples, dur in specs:
        if mode == "trun":
            durs = [dur + s for s in range(samples)]
            frags.append({"samples": samples, "mode": mode, "dur": durs})
            want += sum(durs)
        elif mode == "tfhd":
            frags.append({"samples": samples, "mode": mode, "dur": dur})
            want += samples * dur
        else:
            frags.append({"samples": samples, "mode": mode, "dur": None})
            want += samples * trex_dur
    b = build_mp4_fragmented(
        b"isom", 1000, 320, 240, b"avc1", None, v1, frags, trex_dur
    )
    d = parse_mp4_meta(b)
    assert d["duration"] == want and d["n_fragments"] == len(frags)
