"""Baseline JPEG pixel-decode tier (r10; closes the last multimodal
stub — the r9 verdict item 4). The codec lives in
functions/jpegcodec.py; the Spark entry in functions/multimodal.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from mapreducego_spark.functions.jpegcodec import (
    decode_jpeg_baseline,
    encode_jpeg_baseline,
    ycbcr_to_rgb_int,
)


def _const_block_plane(w: int, h: int, f) -> bytes:
    return bytes(f(x // 8, y // 8) for y in range(h) for x in range(w))


def test_gray_constant_blocks_round_trip_exactly():
    """Constant 8x8 blocks survive FDCT -> quantize(1) -> Huffman ->
    decode EXACTLY (the DC-only exactness contract the oracle
    arithmetic rests on), including replicate-padded odd crops."""
    for w, h in [(8, 8), (24, 16), (19, 13), (32, 9)]:
        plane = _const_block_plane(w, h, lambda bx, by: (31 + bx * 17 + by * 47) % 256)
        got_w, got_h, rgb = decode_jpeg_baseline(
            encode_jpeg_baseline(w, h, [plane])
        )
        assert (got_w, got_h) == (w, h)
        assert rgb == bytes(v for p in plane for v in (p, p, p))


def test_color_constant_blocks_match_integer_transform():
    """3-component 4:4:4 path: decoded RGB equals the fixed-point
    BT.601 transform of the exact fixture Y/Cb/Cr constants."""
    w, h = 19, 13
    Y = _const_block_plane(w, h, lambda bx, by: (31 + bx * 17 + by * 47) % 256)
    Cb = _const_block_plane(w, h, lambda bx, by: 128 + (5 + bx * 3 + by * 7) % 100)
    Cr = _const_block_plane(w, h, lambda bx, by: 128 + (11 + bx * 13 + by * 5) % 100)
    got_w, got_h, rgb = decode_jpeg_baseline(
        encode_jpeg_baseline(w, h, [Y, Cb, Cr])
    )
    assert (got_w, got_h) == (w, h)
    exp = bytearray()
    for i in range(w * h):
        exp += bytes(ycbcr_to_rgb_int(Y[i], Cb[i], Cr[i]))
    assert rgb == bytes(exp)


def test_arbitrary_content_exercises_ac_path_tightly():
    """Random pixels produce dense AC coefficients (ZRL + EOB + every
    size category in practice); at quantization step 1 the full
    FDCT -> Huffman -> IDCT loop must reproduce the input within the
    DCT's intrinsic rounding (|err| <= 3 is the classic q=1 bound;
    observed 1)."""
    rng = np.random.RandomState(7)
    w, h = 24, 24
    px = rng.randint(0, 256, size=w * h, dtype=np.uint8).tobytes()
    _, _, rgb = decode_jpeg_baseline(encode_jpeg_baseline(w, h, [px]))
    orig = np.frombuffer(px, np.uint8).astype(int)
    got = np.frombuffer(rgb, np.uint8)[::3].astype(int)
    assert int(np.abs(orig - got).max()) <= 3


def test_decoder_rejects_unsupported_and_broken_streams():
    w, h = 8, 8
    plane = bytes([100] * 64)
    jpg = encode_jpeg_baseline(w, h, [plane])

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_baseline(b"\x89PNG")
    # progressive SOF2: flip the SOF0 marker byte
    sof0 = jpg.find(b"\xff\xc0")
    prog = jpg[:sof0 + 1] + b"\xc2" + jpg[sof0 + 2 :]
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg_baseline(prog)
    # 2x2 subsampling declared in SOF: sampling byte follows comp id
    sub = bytearray(jpg)
    # marker(2) + len(2) + precision(1) + dims(4) + ncomp(1) + id(1)
    sub[sof0 + 11] = 0x22
    with pytest.raises(NotImplementedError, match="subsampling"):
        decode_jpeg_baseline(bytes(sub))
    # truncated scan
    with pytest.raises(ValueError):
        decode_jpeg_baseline(jpg[: len(jpg) - (len(jpg) - jpg.find(b"\xff\xda")) // 2] + b"\xff\xd9")


def test_decoder_handles_foreign_huffman_tables():
    """The decoder rebuilds tables from DHT, not from assumptions
    about this repo's encoder: a file re-encoded with a DIFFERENT
    (per-symbol-length permuted) AC value order must still decode —
    proving canonical-Huffman generality."""
    from mapreducego_spark.functions import jpegcodec as jc

    w, h = 16, 8
    plane = _const_block_plane(w, h, lambda bx, by: (7 + bx * 50) % 256)
    orig_vals = jc.AC_VALS
    try:
        # permute the 9-bit symbols (all share one code length, so
        # any order is an equally valid canonical table)
        jc.AC_VALS = [orig_vals[0]] + list(reversed(orig_vals[1:]))
        jpg = encode_jpeg_baseline(w, h, [plane])
    finally:
        jc.AC_VALS = orig_vals
    got_w, got_h, rgb = decode_jpeg_baseline(jpg)
    assert (got_w, got_h) == (w, h)
    assert rgb == bytes(v for p in plane for v in (p, p, p))


def test_fixture_file_decode_matches_oracle_arithmetic():
    """One staged fixture end-to-end: decode the real file bytes and
    reproduce px_sum + feature hash with the same closed-form
    arithmetic the DuckDB oracle uses."""
    from mapreducego_spark.functions.multimodal import (
        _jpeg_px_fixture_planes,
        encode_jpeg_pixels_fixture,
    )

    i = 37
    jpg = encode_jpeg_pixels_fixture(i)
    w, h, rgb = decode_jpeg_baseline(jpg)
    planes, (fw, fh) = _jpeg_px_fixture_planes(i)
    assert (w, h) == (fw, fh)
    # closed form: per-block constants -> integer transform
    exp_sum = 0
    hex_parts = []
    for y in range(h):
        for x in range(w):
            bx, by = x // 8, y // 8
            yv = planes["y"](bx, by)
            cb = planes["cb"](bx, by)
            cr = planes["cr"](bx, by)
            r, g, b = ycbcr_to_rgb_int(yv, cb, cr)
            exp_sum += r + g + b
            hex_parts.append(f"{r:02x}{g:02x}{b:02x}")
    assert sum(rgb) == exp_sum
    assert hashlib.md5(rgb.hex().encode()).hexdigest() == hashlib.md5(
        "".join(hex_parts).encode()
    ).hexdigest()


def test_mine_image_text_pairs_composition_law(spark):
    """The manifest must equal the independent recomposition: serial
    decode of each staged file + caption token stats from the raw
    parquet + the same gate."""
    import re

    import pyarrow.parquet as pq

    from mapreducego_spark.functions.multimodal import (
        mine_image_text_pairs,
        stage_jpeg_pixels,
    )

    sf = "/root/testdata/sf0.01"
    path = stage_jpeg_pixels(sf, 240)
    want = {}
    for i in range(240):
        with open(f"{path}/media_{i:05d}.jpg", "rb") as fh:
            w, h, rgb = decode_jpeg_baseline(fh.read())
        want[i] = (w, h, sum(rgb))
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    caps = {
        int(d): (
            len([x for x in re.split(r"[^a-z]+", s.lower()) if x]),
            len(s),
        )
        for d, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
        if int(d) < 240
    }
    rows = mine_image_text_pairs(spark, sf).collect()
    assert len(rows) == 240
    n_ok = 0
    for r in rows:
        w, h, px = want[r["media_id"]]
        n_tok, n_chars = caps[r["media_id"]]
        assert (r["width"], r["height"], r["px_sum"]) == (w, h, px)
        assert (r["n_tokens"], r["caption_chars"]) == (n_tok, n_chars)
        assert r["pair_ok"] == (n_tok >= 5 and w * h >= 256)
        n_ok += bool(r["pair_ok"])
    # the gate is non-degenerate: both outcomes occur
    assert 0 < n_ok < 240


# ---------------------------------------------------------- r11: 4:2:0


def test_420_constant_fixture_round_trips_exactly():
    """4:2:0 contract: luma constant per 8x8 (varying within each
    MCU — gates the interleave order), chroma constant per 16x16
    macroblock (box decimation and replication upsample both exact),
    decoded RGB equals the closed-form integer transform."""
    from mapreducego_spark.functions.multimodal import (
        _jpeg_px_fixture_planes_420,
        encode_jpeg_pixels_fixture_420,
    )

    for i in (0, 7, 41):
        spec, (w, h) = _jpeg_px_fixture_planes_420(i)
        got_w, got_h, rgb = decode_jpeg_baseline(
            encode_jpeg_pixels_fixture_420(i)
        )
        assert (got_w, got_h) == (w, h)
        exp = bytearray()
        for y in range(h):
            for x in range(w):
                exp += bytes(
                    ycbcr_to_rgb_int(
                        spec["y"](x // 8, y // 8),
                        spec["cb"](x // 16, y // 16),
                        spec["cr"](x // 16, y // 16),
                    )
                )
        assert rgb == bytes(exp)


def test_420_random_luma_exercises_interleaved_ac_path():
    """Random luma with neutral chroma (Cb=Cr=128 -> the fixed-point
    transform is the identity) through the 4:2:0 MCU-interleaved
    encoder: every decoded channel must reproduce the luma within
    the q=1 DCT rounding bound (|err| <= 3) — dense AC coefficients
    inside 2x2-luma MCUs, so a wrong interleave walk fails loudly."""
    rng = np.random.RandomState(11)
    w, h = 40, 24
    y = rng.randint(0, 256, size=w * h, dtype=np.uint8).tobytes()
    neutral = bytes([128]) * (w * h)
    got_w, got_h, rgb = decode_jpeg_baseline(
        encode_jpeg_baseline(w, h, [y, neutral, neutral], subsampling="420")
    )
    assert (got_w, got_h) == (w, h)
    orig = np.frombuffer(y, np.uint8).astype(int)
    got = np.frombuffer(rgb, np.uint8).reshape(-1, 3).astype(int)
    assert int(np.abs(got - orig[:, None]).max()) <= 3


def test_vectorized_color_transform_bit_equals_scalar():
    """ycbcr_to_rgb_planes is the numpy twin of ycbcr_to_rgb_int:
    identical >>16 fixed-point arithmetic (arithmetic shift == floor
    division in both), swept over a dense 3-D grid including the
    clamp regions."""
    from itertools import product

    from mapreducego_spark.functions.jpegcodec import ycbcr_to_rgb_planes

    grid = np.array(
        list(product(range(0, 256, 15), range(0, 256, 13), range(0, 256, 11)))
    )
    vec = ycbcr_to_rgb_planes(grid[:, 0], grid[:, 1], grid[:, 2])
    for i in range(len(grid)):
        assert tuple(int(v) for v in vec[i]) == ycbcr_to_rgb_int(
            int(grid[i, 0]), int(grid[i, 1]), int(grid[i, 2])
        )


def test_sos_component_selector_is_honored():
    """r10 ADVICE: the SOS component-selector byte must be read, not
    assumed to follow SOF order. Reorder the SOS selectors of a
    1-MCU 4:4:4 file to (3,2,1): the first entropy block (encoding
    Y) must now land in component 3's plane, i.e. decode as
    ycbcr(cr0, cb0, y0) — a decoder ignoring selectors would return
    ycbcr(y0, cb0, cr0)."""
    w = h = 8
    y0, cb0, cr0 = 90, 140, 170
    jpg = bytearray(
        encode_jpeg_baseline(
            w, h, [bytes([y0]) * 64, bytes([cb0]) * 64, bytes([cr0]) * 64]
        )
    )
    sos = jpg.find(b"\xff\xda")
    # SOS payload: len(2) ns(1) then (cid, tables) pairs
    base = sos + 5
    for si, cid in enumerate((3, 2, 1)):
        jpg[base + 2 * si] = cid
    _, _, rgb = decode_jpeg_baseline(bytes(jpg))
    assert rgb[:3] == bytes(ycbcr_to_rgb_int(cr0, cb0, y0))
    # and an undeclared selector fails loudly
    jpg[base] = 9
    with pytest.raises(ValueError, match="undeclared component"):
        decode_jpeg_baseline(bytes(jpg))


def test_invalid_ac_run_size_symbol_raises_loudly():
    """r10 ADVICE: an AC symbol with size 0 that is neither EOB nor
    ZRL (invalid per F.1.2.2.1 but encodable in a foreign DHT) must
    raise the documented structural ValueError, not a negative-shift
    error inside EXTEND. The encoded scan's 1-bit EOB code is
    re-declared as symbol 0x10 by editing the DHT in the file; the
    decoder rebuilds tables from DHT, so the first EOB hit trips the
    guard."""
    jpg = bytearray(encode_jpeg_baseline(8, 8, [bytes([50]) * 64]))
    dht = jpg.find(b"\xff\xc4")
    # DHT payload: len(2), then DC table (class/id + 16 bits + 12
    # vals), then AC class/id + 16 bits, then AC_VALS[0] == 0x00
    ac_val0 = dht + 4 + (1 + 16 + 12) + (1 + 16)
    assert jpg[ac_val0] == 0x00
    jpg[ac_val0] = 0x10
    with pytest.raises(ValueError, match="invalid AC run/size"):
        decode_jpeg_baseline(bytes(jpg))


def test_mine_image_text_pairs_semantic_composition_law(spark):
    """The semantic manifest must equal the independent
    recomposition from raw bytes: serial decode of each staged file,
    the 64-bucket signature folded per-pixel in plain Python, the
    caption embedding micro-quantized straight from parquet, exact
    integer dot/norms, and the tau = 1/10 gate evaluated with
    unbounded Python ints (no decimal/HUGEINT machinery — proving
    the engines' fixed-width arithmetic matches the mathematical
    value)."""
    import math

    import pyarrow.parquet as pq

    from mapreducego_spark.functions.multimodal import (
        mine_image_text_pairs_semantic,
        stage_jpeg_pixels,
    )

    sf = "/root/testdata/sf0.01"
    path = stage_jpeg_pixels(sf, 240)
    t = pq.read_table(f"{sf}/embeddings.parquet")
    micro = {
        int(v): [math.floor(float(x) * 1_000_000) for x in e]
        for v, e in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist())
        if int(v) < 240
    }
    rows = mine_image_text_pairs_semantic(spark, sf).collect()
    assert len(rows) == 240
    n_sem = 0
    for r in rows:
        i = r["media_id"]
        with open(f"{path}/media_{i:05d}.jpg", "rb") as fh:
            w, h, rgb = decode_jpeg_baseline(fh.read())
        sig = [0] * 64
        for y in range(h):
            for x in range(w):
                p = 3 * (y * w + x)
                sig[((x // 8) + 8 * (y // 8)) % 64] += (
                    rgb[p] + 2 * rgb[p + 1] + 3 * rgb[p + 2]
                )
        m = micro[i]
        dot = sum(a * b for a, b in zip(sig, m))
        n2a = sum(a * a for a in sig)
        n2b = sum(b * b for b in m)
        assert r["dot_micro"] == dot
        assert r["img_n2"] == n2a
        assert r["txt_n2"] == n2b
        sem = dot > 0 and (10 * dot) ** 2 >= n2a * n2b
        assert r["sem_ok"] == sem
        n_sem += bool(sem)
    # non-degenerate split (measured 52/240 on the fixture)
    assert 0 < n_sem < 240


# ------------------------------------------------- r11: restart markers


def test_restart_intervals_round_trip_all_shapes():
    """DRI/RSTn (E.2.4): random gray at several intervals (mod-8
    marker wraparound included at interval 1), and the 4:2:0
    constant fixture with restarts decodes EXACTLY — proving the
    byte-align + DC-reset bookkeeping in both codec directions."""
    rng = np.random.RandomState(5)
    w, h = 40, 33
    y = rng.randint(0, 256, size=w * h, dtype=np.uint8).tobytes()
    orig = np.frombuffer(y, np.uint8).astype(int)
    for ri in (1, 2, 7):
        got_w, got_h, rgb = decode_jpeg_baseline(
            encode_jpeg_baseline(w, h, [y], restart_interval=ri)
        )
        assert (got_w, got_h) == (w, h)
        err = np.abs(np.frombuffer(rgb, np.uint8)[::3].astype(int) - orig)
        assert int(err.max()) <= 3, ri

    def plane(f, per):
        return bytes(
            f(x // per, yy // per) for yy in range(h) for x in range(w)
        )

    Y = plane(lambda bx, by: (31 + bx * 17 + by * 47) % 256, 8)
    Cb = plane(lambda mx, my: 128 + (5 + mx * 3 + my * 7) % 100, 16)
    Cr = plane(lambda mx, my: 128 + (11 + mx * 13 + my * 5) % 100, 16)
    _, _, rgb = decode_jpeg_baseline(
        encode_jpeg_baseline(
            w, h, [Y, Cb, Cr], subsampling="420", restart_interval=2
        )
    )
    exp = bytearray()
    for yy in range(h):
        for x in range(w):
            exp += bytes(
                ycbcr_to_rgb_int(Y[yy * w + x], Cb[yy * w + x], Cr[yy * w + x])
            )
    assert rgb == bytes(exp)


def test_out_of_sequence_restart_marker_fails_loudly():
    rng = np.random.RandomState(5)
    w, h = 40, 33
    y = rng.randint(0, 256, size=w * h, dtype=np.uint8).tobytes()
    jpg = bytearray(encode_jpeg_baseline(w, h, [y], restart_interval=1))
    i = jpg.find(b"\xff\xd0")
    jpg[i + 1] = 0xD5  # RST5 where RST0 belongs
    with pytest.raises(ValueError, match="expected RST"):
        decode_jpeg_baseline(bytes(jpg))


# ------------------------------------------------ progressive (SOF2), r12


def test_progressive_decodes_byte_identical_to_baseline():
    """A progressive file carries the same quantized coefficients as
    a baseline file of the same image, so across subsampling modes,
    restart intervals, successive-approximation depths, and spectral
    splits the two decodes must be BYTE-IDENTICAL — the strongest
    possible gate on the whole Annex G scan machinery (random pixels
    make the AC bands dense, so every first-pass symbol family and
    refinement correction bit is genuinely exercised)."""
    from mapreducego_spark.functions.jpegcodec import (
        decode_jpeg,
        decode_jpeg_progressive,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(3)
    for w, h, sub, ri, ncomp in [
        (24, 24, "444", 0, 3),
        (17, 13, "444", 0, 1),
        (40, 24, "420", 0, 3),
        (33, 29, "420", 3, 3),
        (30, 11, "422", 2, 3),
        (16, 16, "444", 1, 3),
    ]:
        planes = [
            rng.randint(0, 256, w * h, dtype=np.uint8).tobytes()
            for _ in range(ncomp)
        ]
        base = decode_jpeg_baseline(
            encode_jpeg_baseline(
                w, h, planes, subsampling=sub, restart_interval=ri
            )
        )
        for dc_al, ac_al, splits in [(1, 1, (6,)), (0, 0, (6,)), (2, 2, (2, 33))]:
            jpg = encode_jpeg_progressive(
                w, h, planes, subsampling=sub, restart_interval=ri,
                dc_al=dc_al, ac_al=ac_al, spectral_splits=splits,
            )
            assert decode_jpeg_progressive(jpg) == base, (
                w, h, sub, ri, dc_al, ac_al, splits,
            )
            # the dispatcher routes SOF2 here, SOF0 to baseline
            assert decode_jpeg(jpg) == base


def test_progressive_sparse_content_exercises_eob_and_zrl_refinement():
    """Mostly-flat images with isolated spikes produce long EOBn runs
    (multi-block, with deferred correction bits) and ZRL-in-
    refinement skips — the paths dense random content can't reach.
    Decode must still be byte-equal to baseline."""
    from mapreducego_spark.functions.jpegcodec import (
        decode_jpeg_progressive,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(9)
    # constant blocks: every AC band is an EOB run spanning blocks
    w, h = 64, 48
    a = np.zeros((h, w), np.uint8)
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            a[by : by + 8, bx : bx + 8] = rng.randint(0, 256)
    px = a.tobytes()
    base = decode_jpeg_baseline(encode_jpeg_baseline(w, h, [px]))
    assert decode_jpeg_progressive(
        encode_jpeg_progressive(w, h, [px], dc_al=2, ac_al=2)
    ) == base
    # isolated spikes: sparse ACs, deep approximation, three bands
    for trial in range(4):
        w, h = 56, 40
        a = np.full((h, w), 100, np.uint8)
        for _ in range(12):
            a[rng.randint(h), rng.randint(w)] = rng.randint(0, 256)
        px = a.tobytes()
        base = decode_jpeg_baseline(encode_jpeg_baseline(w, h, [px]))
        for dc_al, ac_al, splits in [(1, 1, (6,)), (2, 3, (2, 10, 33))]:
            got = decode_jpeg_progressive(
                encode_jpeg_progressive(
                    w, h, [px], dc_al=dc_al, ac_al=ac_al,
                    spectral_splits=splits,
                )
            )
            assert got == base, (trial, dc_al, ac_al, splits)


def test_progressive_fixture_files_match_closed_form():
    """The staged registry fixtures decode to the exact closed-form
    RGB the DuckDB oracle reconstructs (spot-check a gray, a color,
    and a restart-segmented index)."""
    from mapreducego_spark.functions.jpegcodec import decode_jpeg
    from mapreducego_spark.functions.multimodal import (
        _jpeg_px_fixture_planes_prog,
        encode_jpeg_pixels_fixture_prog,
    )

    for i in (0, 7, 11):  # gray, color, color+restart (11 % 3 == 2)
        spec, (w, h), ri = _jpeg_px_fixture_planes_prog(i)
        assert (i % 3 == 2) == (ri > 0)
        got_w, got_h, rgb = decode_jpeg(encode_jpeg_pixels_fixture_prog(i))
        assert (got_w, got_h) == (w, h)
        exp = bytearray()
        for y in range(h):
            for x in range(w):
                yv = spec["y"](x // 8, y // 8)
                exp += bytes(
                    ycbcr_to_rgb_int(
                        yv, spec["cb"](x // 8, y // 8), spec["cr"](x // 8, y // 8)
                    )
                )
        assert rgb == bytes(exp), i


def test_progressive_rejects_broken_and_foreign_streams():
    from mapreducego_spark.functions.jpegcodec import (
        decode_jpeg,
        decode_jpeg_progressive,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(1)
    w, h = 16, 16
    px = rng.randint(0, 256, w * h, dtype=np.uint8).tobytes()
    jpg = encode_jpeg_progressive(w, h, [px])
    # a baseline frame is the wrong decoder
    with pytest.raises(NotImplementedError, match="SOF2"):
        decode_jpeg_progressive(encode_jpeg_baseline(w, h, [px]))
    # truncating the last scan's entropy data starves the bit reader
    with pytest.raises(ValueError):
        decode_jpeg_progressive(jpg[: len(jpg) - 40])
    # dispatcher refuses frame types neither decoder supports
    lossless = jpg.replace(b"\xff\xc2", b"\xff\xc3", 1)
    with pytest.raises(NotImplementedError, match="0xFFC3"):
        decode_jpeg(lossless)


def test_422_odd_dims_constant_fixture_decodes_exactly():
    """4:2:2 (2x1 luma) at odd, non-MCU-aligned dims: per-block luma
    + per-16x8-region chroma decode to the exact closed form —
    staging the partial-edge-MCU and odd-width chroma-pad geometry
    (r11 verdict missing #4)."""
    from mapreducego_spark.functions.multimodal import (
        _jpeg_px_fixture_planes_422,
        encode_jpeg_pixels_fixture_422,
    )

    for i in (2, 3, 9):
        spec, (w, h) = _jpeg_px_fixture_planes_422(i)
        assert w % 16 and (w % 2 or h % 2), "fixture should be unaligned"
        got_w, got_h, rgb = decode_jpeg_baseline(
            encode_jpeg_pixels_fixture_422(i)
        )
        assert (got_w, got_h) == (w, h)
        exp = bytearray()
        for y in range(h):
            for x in range(w):
                exp += bytes(
                    ycbcr_to_rgb_int(
                        spec["y"](x // 8, y // 8),
                        spec["cb"](x // 16, y // 8),
                        spec["cr"](x // 16, y // 8),
                    )
                )
        assert rgb == bytes(exp), i


def test_422_random_luma_round_trips_within_dct_bound():
    """Random luma + neutral chroma through the 2x1 interleaved
    encoder at an odd size: |err| <= 3 (the q=1 DCT bound) on every
    channel, so the horizontal interleave walk is pinned on dense
    AC content too."""
    rng = np.random.RandomState(13)
    w, h = 41, 19
    y = rng.randint(0, 256, size=w * h, dtype=np.uint8).tobytes()
    neutral = bytes([128]) * (w * h)
    got_w, got_h, rgb = decode_jpeg_baseline(
        encode_jpeg_baseline(w, h, [y, neutral, neutral], subsampling="422")
    )
    assert (got_w, got_h) == (w, h)
    orig = np.frombuffer(y, np.uint8).astype(int)
    got = np.frombuffer(rgb, np.uint8).reshape(-1, 3).astype(int)
    assert int(np.abs(got - orig[:, None]).max()) <= 3


def test_grayscale_with_chroma_subsampling_fails_loudly():
    """The r11 ADVICE fix: requesting 4:2:0 on a single plane must
    raise, not silently coerce to 4:4:4."""
    with pytest.raises(ValueError, match="grayscale"):
        encode_jpeg_baseline(8, 8, [bytes(64)], subsampling="420")


# ------------------------------------- r13 second batch: SOF1 frames


def test_sof1_extended_sequential_decodes_identically():
    """Extended sequential (SOF1) at 8-bit is the same entropy
    coding as baseline — the decoder must accept the marker and
    produce the byte-identical raster; 12-bit precision stays
    refused."""
    import pytest

    from mapreducego_spark.functions.jpegcodec import (
        decode_jpeg,
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    w, h = 19, 13
    planes = [
        bytes(((x // 8) * 31 + (y // 8) * 47 + c * 17) % 256
              for y in range(h) for x in range(w))
        for c in range(3)
    ]
    b0 = encode_jpeg_baseline(w, h, planes)
    b1 = encode_jpeg_baseline(w, h, planes, sof1=True)
    assert b0[b0.find(b"\xff\xc0") + 1] == 0xC0
    assert b1[b1.find(b"\xff\xc1") + 1] == 0xC1
    assert decode_jpeg(b1) == decode_jpeg_baseline(b0)
    # 12-bit SOF1 refuses loudly (find the marker, then the segment
    # payload starts after the 2-byte length; byte 0 is precision)
    k = b1.find(b"\xff\xc1")
    bad = bytearray(b1)
    bad[k + 4] = 12
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_jpeg(bytes(bad))
