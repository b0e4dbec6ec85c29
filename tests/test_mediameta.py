"""MP3/MP4 metadata routing tier: header-walk correctness and the
loud scope boundaries (no guessed durations, no silent skips)."""

from __future__ import annotations

import struct

import pytest

from mapreducego_spark.functions.mediameta import (
    build_mp3,
    build_mp4,
    parse_mp3_meta,
    parse_mp4_meta,
)


def test_mp3_walk_counts_frames_padding_and_tags():
    m = build_mp3(160, 32000, 47, 3, 0, False, seed=1)
    d = parse_mp3_meta(m)
    base = 144_000 * 160 // 32000
    assert d["tag_bytes"] == 10  # empty-but-present ID3v2 (pad 0)
    assert d["channels"] == 1  # mode 3 = mono
    assert d["n_frames"] == 47
    assert d["audio_bytes"] == 47 * base + 47 // 3
    assert d["duration_ms"] == 47 * 1152 * 1000 // 32000
    # no tag at all
    m2 = build_mp3(64, 48000, 5, 0, -1, True)
    d2 = parse_mp3_meta(m2)
    assert d2["tag_bytes"] == 0 and d2["has_id3v1"] and d2["channels"] == 2


def test_mp3_refusals_are_loud():
    m = build_mp3(128, 44100, 6, 0, 20, False, seed=2)
    tag = 30  # 10 + 20 pad
    hdr = bytearray(m)
    # MPEG-2 version bits (byte1: clear bit 3)
    hdr[tag + 1] &= ~0x08
    with pytest.raises(NotImplementedError, match="MPEG-2"):
        parse_mp3_meta(bytes(hdr))
    # Layer II (layer bits 10)
    hdr = bytearray(m)
    hdr[tag + 1] = (hdr[tag + 1] & ~0x06) | 0x04
    with pytest.raises(NotImplementedError, match="Layer I/II"):
        parse_mp3_meta(bytes(hdr))
    # free-format bitrate (index 0)
    hdr = bytearray(m)
    hdr[tag + 2] &= 0x0F
    with pytest.raises(NotImplementedError, match="free-format"):
        parse_mp3_meta(bytes(hdr))
    # invalid bitrate index 15
    hdr = bytearray(m)
    hdr[tag + 2] |= 0xF0
    with pytest.raises(ValueError, match="invalid bitrate"):
        parse_mp3_meta(bytes(hdr))
    # bitrate drift WITHOUT a Xing/VBRI header: change the SECOND
    # frame's bitrate nibble — still refuses (tagged VBR is the only
    # accepted VBR shape)
    first_size = 144_000 * 128 // 44100
    hdr = bytearray(m)
    hdr[tag + first_size + 2] = (hdr[tag + first_size + 2] & 0x0F) | 0xA0
    with pytest.raises(NotImplementedError, match="without a"):
        parse_mp3_meta(bytes(hdr))
    # truncated final frame / stray trailing bytes / lost sync
    with pytest.raises(ValueError, match="truncated final"):
        parse_mp3_meta(m[:-10])
    with pytest.raises(ValueError, match="stray bytes"):
        parse_mp3_meta(m + b"xx")
    with pytest.raises(ValueError, match="lost frame sync"):
        parse_mp3_meta(m + b"junkjunkjunk")
    # ID3v2 size running past EOF
    bad = m[:6] + b"\x7f\x7f\x7f\x7f" + m[10:]  # syncsafe size field
    with pytest.raises(ValueError, match="runs past end"):
        parse_mp3_meta(bad)
    with pytest.raises(ValueError, match="no MP3 frames"):
        parse_mp3_meta(build_mp3(128, 44100, 0, 0, 5, False))


def test_mp4_box_walk_and_size_encodings():
    for largesize, to_eof in ((False, False), (True, False), (False, True)):
        v = build_mp4(
            b"mp42", 1000, 12345, 640, 352, b"avc1", b"mp4a",
            v1_times=True, mdat_size=64,
            mdat_largesize=largesize, mdat_to_eof=to_eof,
        )
        d = parse_mp4_meta(v)
        assert d["brand"] == "mp42" and d["duration"] == 12345
        assert (d["width"], d["height"]) == (640, 352)
        assert d["duration_ms"] == 12345 * 1000 // 1000
        assert d["n_tracks"] == 2 and d["audio_codec"] == "mp4a"


def test_mp4_refusals_are_loud():
    v = build_mp4(b"isom", 600, 3000, 320, 240, b"avc1", b"mp4a",
                  False, 50)
    with pytest.raises(ValueError, match="no leading ftyp"):
        parse_mp4_meta(b"\x00\x00\x00\x08free" + v[24:])
    # a moof on a file whose moov has no mvex is corrupt, not a
    # fragmented file (fMP4 is SUPPORTED since r15 — the refusal is
    # for the broken shape)
    with pytest.raises(ValueError, match="without an mvex"):
        parse_mp4_meta(v + struct.pack(">I", 8) + b"moof")
    # compressed moov: smuggle a cmov box into moov (grow sizes)
    k = v.index(b"moov")
    moov_size = struct.unpack(">I", v[k - 4 : k])[0]
    patched = (
        v[: k - 4]
        + struct.pack(">I", moov_size + 8)
        + b"moov"
        + v[k + 4 : k - 4 + moov_size]
        + struct.pack(">I", 8) + b"cmov"
        + v[k - 4 + moov_size :]
    )
    with pytest.raises(NotImplementedError, match="cmov"):
        parse_mp4_meta(patched)
    # a truncated box and stray trailing bytes
    with pytest.raises(ValueError, match="runs past"):
        parse_mp4_meta(v[:-10])
    with pytest.raises(ValueError, match="stray bytes"):
        parse_mp4_meta(v + b"xy")
    # fractional 16.16 dimensions refuse
    g = v.index(b"tkhd")
    geo = g + 4 + 4 + 4 + 4 + 4 + 4 + 4 + 8 + 2 + 2 + 2 + 2 + 36
    bad = bytearray(v)
    bad[geo + 2 : geo + 4] = b"\x80\x00"  # width .5
    with pytest.raises(ValueError, match="fractional"):
        parse_mp4_meta(bytes(bad))
    # video track is required
    with pytest.raises(ValueError, match="no video track"):
        parse_mp4_meta(
            build_mp4(b"isom", 600, 100, 0, 0, b"avc1", None, False, 8)
            .replace(b"vide", b"soun")
        )


def test_mp3_mp4_meta_entries_match_closed_form(spark, sf_dir):
    from mapreducego_spark.functions.multimodal import (
        _mp3_fixture_params,
        _mp4_fixture_params,
        multimodal_mp3_meta,
        multimodal_mp4_meta,
    )

    rows = {r["media_id"]: r
            for r in multimodal_mp3_meta(spark, sf_dir).collect()}
    assert len(rows) == 240
    for i in (0, 5, 13, 47, 239):
        p = _mp3_fixture_params(i)
        r = rows[i]
        assert r["vbr"] == p["vbr"]
        if not p["vbr"]:
            assert r["bitrate_kbps"] == p["kbps"]
        assert r["sample_rate"] == p["rate"]
        assert r["n_frames"] == p["n_frames"]
        assert r["tag_bytes"] == (0 if p["id3v2_pad"] < 0
                                  else 10 + p["id3v2_pad"])
        assert r["has_id3v1"] == p["id3v1"]
    # a VBR file's mean bitrate matches the per-frame closed form
    from mapreducego_spark.functions.multimodal import _MP3_KBPS_CYCLE

    i = 13  # 13 % 5 == 3 -> VBR (Xing); 18 % 10 == 8 would be VBRI
    p = _mp3_fixture_params(i)
    ab = sum(
        144000 * _MP3_KBPS_CYCLE[(i + 2 * j) % 14] // p["rate"]
        + (1 if j % 3 == 2 else 0)
        for j in range(p["n_frames"])
    )
    assert rows[i]["bitrate_kbps"] == (
        ab * 8 * p["rate"] // (p["n_frames"] * 1152 * 1000)
    )
    assert rows[i]["audio_bytes"] == ab + 144000 * 64 // p["rate"]
    vrows = {r["media_id"]: r
             for r in multimodal_mp4_meta(spark, sf_dir).collect()}
    for i in (0, 7, 11, 13, 55, 239):
        p = _mp4_fixture_params(i)
        r = vrows[i]
        assert r["brand"] == p["brand"]
        assert r["fragmented"] == p["fragmented"]
        assert r["n_fragments"] == len(p["fragments"])
        if p["fragmented"]:
            want = 0
            for f, spec in enumerate(p["fragments"]):
                if spec["mode"] == "trun":
                    want += sum(spec["dur"])
                elif spec["mode"] == "tfhd":
                    want += spec["samples"] * spec["dur"]
                else:
                    want += spec["samples"] * p["trex_default"]
            assert r["duration"] == want
        else:
            assert r["duration"] == p["duration"]
        assert (r["width"], r["height"]) == (p["width"], p["height"])
        assert r["video_codec"] == p["vcodec"]
        assert r["audio_codec"] == p["acodec"]
        assert r["n_tracks"] == (1 if p["acodec"] is None else 2)


def test_mp3_vbr_xing_and_vbri_round_trip():
    """Tagged VBR (r14 verdict #5): Xing and VBRI headers at their
    spec offsets, per-frame bitrate drift allowed, declared
    frame/byte counts VERIFIED, floor-mean bitrate reported."""
    from mapreducego_spark.functions.mediameta import (
        _MP3_BITRATES,
        build_mp3_vbr,
    )

    for kind in ("Xing", "VBRI"):
        for mode in (0, 3):  # stereo and mono side-info offsets
            b = build_mp3_vbr(44100, 25, mode, 80, True, kind=kind, seed=9)
            d = parse_mp3_meta(b)
            assert d["vbr"] and d["n_frames"] == 25
            assert d["channels"] == (1 if mode == 3 else 2)
            ab = sum(
                144000 * _MP3_BITRATES[1 + j % 14] // 44100
                + (1 if j % 3 == 2 else 0)
                for j in range(25)
            )
            assert d["audio_bytes"] == ab + 144000 * 64 // 44100
            assert d["bitrate_kbps"] == ab * 8 * 44100 // (25 * 1152 * 1000)
            assert d["duration_ms"] == 25 * 1152 * 1000 // 44100
    # declared-count tamper refuses
    b = bytearray(build_mp3_vbr(48000, 12, 0, -1, False, kind="Xing"))
    at = b.index(b"Xing") + 8
    b[at : at + 4] = (13).to_bytes(4, "big")
    with pytest.raises(ValueError, match="declares 13 frames"):
        parse_mp3_meta(bytes(b))
    # declared-bytes tamper refuses
    b = bytearray(build_mp3_vbr(48000, 12, 0, -1, False, kind="VBRI"))
    at = b.index(b"VBRI") + 10
    b[at : at + 4] = (1).to_bytes(4, "big")
    with pytest.raises(ValueError, match="audio bytes"):
        parse_mp3_meta(bytes(b))
    # sample-rate drift inside a tagged-VBR stream still refuses
    from mapreducego_spark.functions.mediameta import _MP3_RATES

    b = bytearray(build_mp3_vbr(44100, 9, 0, -1, False, kind="Xing"))
    tag_size = 144_000 * 64 // 44100
    first = tag_size  # first audio frame header
    b[first + 2] = (b[first + 2] & ~0x0C) | (_MP3_RATES.index(32000) << 2)
    with pytest.raises(ValueError, match="sample-rate drift"):
        parse_mp3_meta(bytes(b))
    # Xing without a frame count refuses (flags bit 0 clear)
    b = bytearray(build_mp3_vbr(44100, 9, 0, -1, False, kind="Xing"))
    at = b.index(b"Xing") + 4
    b[at : at + 4] = (6).to_bytes(4, "big")  # bytes|TOC, no frames
    with pytest.raises(ValueError, match="without a frame count"):
        parse_mp3_meta(bytes(b))
    # a matched tag magic whose declared fields overrun the frame
    # raises instead of silently falling through to the CBR walk
    # (r15 ADVICE; unreachable through valid MPEG-1 frame sizes, so
    # exercised at the function level with a crafted tiny frame)
    from mapreducego_spark.functions.mediameta import _mp3_vbr_tag

    mono = bytes(21) + b"Xing" + bytes(16)
    with pytest.raises(ValueError, match="Xing tag truncated"):
        _mp3_vbr_tag(mono, 0, 3, 30)
    assert _mp3_vbr_tag(bytes(41), 0, 3, 30) is None  # no magic: CBR
    vbri = bytes(36) + b"VBRI" + bytes(20)
    with pytest.raises(ValueError, match="VBRI tag truncated"):
        _mp3_vbr_tag(vbri, 0, 0, 50)


def test_mp4_fragmented_walk_duration_chain():
    """fMP4 (r14 verdict #6): the three duration-default levels
    (trun per-sample, tfhd default, trex default), mfhd sequence
    verification, and per-track accumulation."""
    from mapreducego_spark.functions.mediameta import build_mp4_fragmented

    frags = [
        {"samples": 3, "mode": "trun", "dur": [11, 13, 17]},
        {"samples": 4, "mode": "tfhd", "dur": 23},
        {"samples": 5, "mode": "trex", "dur": None},
        {"samples": 2, "mode": "trun", "dur": [100, 1]},
    ]
    b = build_mp4_fragmented(
        b"mp42", 1000, 640, 360, b"hev1", b"Opus", True, frags,
        trex_default_duration=29, seed=4,
    )
    d = parse_mp4_meta(b)
    want = (11 + 13 + 17) + 4 * 23 + 5 * 29 + (100 + 1)
    assert d["fragmented"] and d["n_fragments"] == 4
    assert d["duration"] == want
    assert d["duration_ms"] == want * 1000 // 1000
    assert d["brand"] == "mp42" and d["video_codec"] == "hev1"
    assert (d["width"], d["height"]) == (640, 360)
    # plain files report fragmented=False / 0 fragments
    v = build_mp4(b"isom", 600, 3000, 320, 240, b"avc1", None, False, 8)
    dp = parse_mp4_meta(v)
    assert not dp["fragmented"] and dp["n_fragments"] == 0
    # a sequence gap refuses
    k = b.index(b"mfhd", b.index(b"moof"))
    bad = bytearray(b)
    bad[k + 8 : k + 12] = struct.pack(">I", 7)
    with pytest.raises(ValueError, match="sequence gap"):
        parse_mp4_meta(bytes(bad))
    # a traf referencing an unknown track refuses
    k = b.index(b"tfhd")
    bad = bytearray(b)
    bad[k + 8 : k + 12] = struct.pack(">I", 99)
    with pytest.raises(ValueError, match="unknown track"):
        parse_mp4_meta(bytes(bad))


def test_id3v2_text_frames_both_versions_and_encodings():
    """ID3v2.3 (plain frame sizes) and v2.4 (syncsafe) text frames,
    all three encodings, a leading binary PRIV frame size-skipped,
    zero-byte padding terminating the walk."""
    from mapreducego_spark.functions.mediameta import (
        build_id3v2,
        parse_id3v2_frames,
    )

    frames = [("TIT2", "Tïtle — utf16", 1), ("TPE1", "Artist", 0)]
    for version in (3, 4):
        fs = frames + ([("TCON", "Genre", 3)] if version == 4 else [])
        raw = [("PRIV", b"owner\x00\xff\xfe\x00binary")]
        tag = build_id3v2(fs, version=version, pad=17, raw_frames=raw)
        tb, got = parse_id3v2_frames(tag)
        assert tb == len(tag)
        assert [(f["frame_id"], f["text"], f["encoding"]) for f in got] == [
            (fid, text, enc) for fid, text, enc in fs
        ]
    # a frame size large enough to cross the v2.3/v2.4 grammar line:
    # 200 bytes of text — v2.4 syncsafe (0,0,1,72) vs v2.3 plain
    # (0,0,0,200) differ on the wire; parsing one AS the other must
    # not round-trip
    big = build_id3v2([("TIT2", "x" * 200, 0)], version=4)
    flipped = bytearray(big)
    flipped[3] = 3  # claim v2.3 over syncsafe-sized frames
    import pytest

    with pytest.raises((ValueError, NotImplementedError)):
        parse_id3v2_frames(bytes(flipped))


def test_id3v2_refusals_are_loud():
    import pytest

    from mapreducego_spark.functions.mediameta import (
        build_id3v2,
        parse_id3v2_frames,
    )

    tag = build_id3v2([("TIT2", "t", 0)], version=3)
    with pytest.raises(ValueError, match="no ID3v2 tag"):
        parse_id3v2_frames(b"RIFF" + tag[4:])
    with pytest.raises(NotImplementedError, match="ID3v2.2"):
        parse_id3v2_frames(tag[:3] + b"\x02" + tag[4:])
    # unsynchronisation flag
    bad = bytearray(tag)
    bad[5] |= 0x80
    with pytest.raises(NotImplementedError, match="unsynchronisation"):
        parse_id3v2_frames(bytes(bad))
    # compressed-frame flag (v2.3: frame format flags byte, bit 7)
    bad = bytearray(tag)
    at = bad.index(b"TIT2") + 9
    bad[at] |= 0x80
    with pytest.raises(NotImplementedError, match="compressed/encrypted"):
        parse_id3v2_frames(bytes(bad))
    # frame running past the tag
    bad = bytearray(tag)
    at = bad.index(b"TIT2") + 4
    bad[at : at + 4] = (10_000).to_bytes(4, "big")
    with pytest.raises(ValueError, match="runs past the tag"):
        parse_id3v2_frames(bytes(bad))
    # UTF-8 inside a v2.3 tag is a version violation
    with pytest.raises(ValueError, match="v2.4-only"):
        build_id3v2([("TIT2", "t", 3)], version=3)
    hand = bytearray(build_id3v2([("TIT2", "ab", 0)], version=3))
    hand[hand.index(b"TIT2") + 10] = 3  # encoding byte -> UTF-8
    with pytest.raises(ValueError, match="inside an ID3v2.3"):
        parse_id3v2_frames(bytes(hand))


def test_mp3_tags_entry_matches_closed_form(spark, sf_dir):
    from mapreducego_spark.functions.multimodal import (
        _ID3_FRAME_SPECS,
        _mp3_tag_fixture_params,
        multimodal_mp3_tags,
    )

    rows = multimodal_mp3_tags(spark, sf_dir).collect()
    assert len(rows) == 240 * 4
    by_key = {(r["media_id"], r["frame_idx"]): r for r in rows}
    for i in (0, 1, 4, 13, 100, 239):
        p = _mp3_tag_fixture_params(i)
        for j, (fid, text_fn) in enumerate(_ID3_FRAME_SPECS):
            r = by_key[(i, j)]
            assert r["tag_version"] == p["version"]
            assert r["frame_id"] == fid
            assert r["text"] == text_fn(i)
            assert r["encoding"] == p["frames"][j][2]
