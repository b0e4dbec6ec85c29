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
