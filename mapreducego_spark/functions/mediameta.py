"""MP3 / MP4 metadata routing pass — headers only, no sample decode.

The dominant real-world audio (MPEG-1 Layer III + ID3) and video
(ISO BMFF / MP4) containers get the cheap FIRST pass a 100 TB media
pipeline runs before anything touches samples: parse the framing,
emit duration/bitrate/dims/codec, and route files into
transcode/filter queues. Full codecs stay out of scope on purpose —
the loud-refusal posture decode_image/wavcodec already take — but
the header walk is pure stdlib and closed-form-stageable, mirroring
multimodal_audio_meta.

MP3 scope (loud): ID3v2.3/2.4 tag skip (syncsafe size, optional
footer), constant-bitrate MPEG-1 Layer III frame walk (frame size =
144000*kbps/rate + padding), optional trailing ID3v1 tag. MPEG-2 /
2.5, Layers I/II, free-format bitrate, and VBR (any header drift
between frames) refuse — a guessed duration is worse than a routed
refusal.

MP4 scope (loud): top-level box walk (32-bit sizes, 64-bit
``largesize``, and the size-0 to-end-of-file form), ftyp brand,
moov{mvhd, trak{tkhd, mdia{hdlr, minf/stbl/stsd}}} descent with
version 0 AND 1 mvhd/tkhd (64-bit times), first sample-entry fourcc
per track. Compressed moov (cmov), fragmented files (moof), and
handlers other than vide/soun refuse.

Public formats only: MPEG-1 audio framing per ISO/IEC 11172-3, ID3
per id3.org, ISO BMFF boxes per ISO/IEC 14496-12. Reference analog:
the opaque-bytes input contract at /root/reference/mpMaster/
master.go:77-89.
"""

from __future__ import annotations

import struct

# MPEG-1 Layer III tables (ISO/IEC 11172-3)
_MP3_BITRATES = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
_MP3_RATES = (44100, 48000, 32000)
_MP3_SAMPLES_PER_FRAME = 1152


def _syncsafe(n: int) -> bytes:
    if not 0 <= n < (1 << 28):
        raise ValueError(f"syncsafe size {n} out of range")
    return bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )


def _unsyncsafe(b: bytes) -> int:
    if any(x & 0x80 for x in b):
        raise ValueError("non-syncsafe byte in ID3v2 size")
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


# ------------------------------------------------------------ MP3


def build_mp3(
    bitrate_kbps: int,
    sample_rate: int,
    n_frames: int,
    mode: int,
    id3v2_pad: int,
    id3v1: bool,
    seed: int = 0,
) -> bytes:
    """A CBR MPEG-1 Layer III file: optional ID3v2.3 tag, n_frames
    frames (padding bit set on every third frame, j % 3 == 2),
    deterministic filler payloads, optional ID3v1 trailer."""
    bidx = _MP3_BITRATES.index(bitrate_kbps)
    ridx = _MP3_RATES.index(sample_rate)
    out = bytearray()
    if id3v2_pad >= 0:
        out += b"ID3" + b"\x03\x00\x00" + _syncsafe(id3v2_pad)
        out += bytes((seed + k) % 251 for k in range(id3v2_pad))
    for j in range(n_frames):
        padding = 1 if j % 3 == 2 else 0
        hdr = bytes(
            [
                0xFF,
                0xFB,  # sync | MPEG-1 | Layer III | no CRC
                (bidx << 4) | (ridx << 2) | (padding << 1),
                (mode & 3) << 6,
            ]
        )
        size = 144_000 * bitrate_kbps // sample_rate + padding
        body = bytes((seed + j + k) % 251 for k in range(size - 4))
        out += hdr + body
    if id3v1:
        out += b"TAG" + bytes((seed + k) % 97 for k in range(125))
    return bytes(out)


def parse_mp3_meta(payload: bytes) -> dict:
    """Header walk: ID3v2 skip, CBR frame count with every frame
    header re-verified (drift = VBR = refusal), ID3v1 trailer.
    Returns tag_bytes / bitrate_kbps / sample_rate / channels /
    n_frames / audio_bytes / has_id3v1 / duration_ms (integer
    floor-division, n_frames * 1152 * 1000 // rate)."""
    pos = 0
    tag_bytes = 0
    if payload[:3] == b"ID3":
        if len(payload) < 10:
            raise ValueError("truncated ID3v2 header")
        flags = payload[5]
        size = _unsyncsafe(payload[6:10])
        tag_bytes = 10 + size + (10 if flags & 0x10 else 0)
        if len(payload) < tag_bytes:
            raise ValueError("ID3v2 size runs past end of file")
        pos = tag_bytes
    end = len(payload)
    has_id3v1 = end - pos >= 128 and payload[end - 128 : end - 125] == b"TAG"
    if has_id3v1:
        end -= 128
    first = None
    n_frames = 0
    audio_bytes = 0
    while pos < end:
        if end - pos < 4:
            raise ValueError(f"{end - pos} stray bytes after last frame")
        b0, b1, b2, b3 = payload[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"lost frame sync at byte {pos}")
        version = (b1 >> 3) & 3
        layer = (b1 >> 1) & 3
        if version != 3:
            raise NotImplementedError(
                "MPEG-2/2.5 audio (MPEG-1 only)"
            )
        if layer != 1:
            raise NotImplementedError("Layer I/II (Layer III only)")
        bidx = (b2 >> 4) & 0xF
        ridx = (b2 >> 2) & 3
        if bidx == 0:
            raise NotImplementedError("free-format bitrate")
        if bidx == 15 or ridx == 3:
            raise ValueError("invalid bitrate/sample-rate index")
        padding = (b2 >> 1) & 1
        mode = (b3 >> 6) & 3
        key = (bidx, ridx, mode)
        if first is None:
            first = key
        elif key != first:
            raise NotImplementedError(
                "VBR / mid-stream header change (CBR only)"
            )
        size = 144_000 * _MP3_BITRATES[bidx] // _MP3_RATES[ridx] + padding
        if pos + size > end:
            raise ValueError("truncated final MP3 frame")
        pos += size
        n_frames += 1
        audio_bytes += size
    if first is None:
        raise ValueError("no MP3 frames in file")
    bidx, ridx, mode = first
    rate = _MP3_RATES[ridx]
    return {
        "tag_bytes": tag_bytes,
        "bitrate_kbps": _MP3_BITRATES[bidx],
        "sample_rate": rate,
        "channels": 1 if mode == 3 else 2,
        "n_frames": n_frames,
        "audio_bytes": audio_bytes,
        "has_id3v1": has_id3v1,
        "duration_ms": n_frames * _MP3_SAMPLES_PER_FRAME * 1000 // rate,
    }


# ------------------------------------------------------------ MP4


def _box(btype: bytes, payload: bytes, largesize: bool = False,
         to_eof: bool = False) -> bytes:
    if to_eof:
        return struct.pack(">I", 0) + btype + payload
    if largesize:
        return (
            struct.pack(">I", 1)
            + btype
            + struct.pack(">Q", 16 + len(payload))
            + payload
        )
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(version: int, payload: bytes) -> bytes:
    return bytes([version, 0, 0, 0]) + payload


def build_mp4(
    brand: bytes,
    timescale: int,
    duration: int,
    width: int,
    height: int,
    video_codec: bytes,
    audio_codec: bytes | None,
    v1_times: bool,
    mdat_size: int,
    mdat_largesize: bool = False,
    mdat_to_eof: bool = False,
    seed: int = 0,
) -> bytes:
    """ftyp + moov{mvhd, video trak, optional audio trak} + mdat."""
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand + b"isom")
    t = struct.pack(">Q" if v1_times else ">I", 0)  # creation/mod
    dur = struct.pack(">Q" if v1_times else ">I", duration)
    mvhd = _box(
        b"mvhd",
        _full(1 if v1_times else 0,
              t + t + struct.pack(">I", timescale) + dur
              + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
              + b"\x00" * 10 + b"\x00" * 36 + b"\x00" * 24
              + struct.pack(">I", 3)),
    )

    def trak(track_id: int, handler: bytes, fourcc: bytes,
             w: int, h: int) -> bytes:
        tkhd = _box(
            b"tkhd",
            _full(1 if v1_times else 0,
                  t + t + struct.pack(">I", track_id) + b"\x00" * 4 + dur
                  + b"\x00" * 8 + b"\x00" * 2 + b"\x00" * 2 + b"\x00" * 2
                  + b"\x00" * 2 + b"\x00" * 36
                  + struct.pack(">I", w << 16)
                  + struct.pack(">I", h << 16)),
        )
        mdhd = _box(
            b"mdhd",
            _full(1 if v1_times else 0,
                  t + t + struct.pack(">I", timescale) + dur
                  + struct.pack(">H", 0x55C4) + b"\x00" * 2),
        )
        hdlr = _box(
            b"hdlr",
            _full(0, b"\x00" * 4 + handler + b"\x00" * 12 + b"h\x00"),
        )
        entry = _box(fourcc, b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 8)
        stsd = _box(b"stsd", _full(0, struct.pack(">I", 1) + entry))
        stbl = _box(b"stbl", stsd)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        return _box(b"trak", tkhd + mdia)

    traks = trak(1, b"vide", video_codec, width, height)
    if audio_codec is not None:
        traks += trak(2, b"soun", audio_codec, 0, 0)
    moov = _box(b"moov", mvhd + traks)
    mdat = _box(
        b"mdat",
        bytes((seed + k) % 251 for k in range(mdat_size)),
        largesize=mdat_largesize,
        to_eof=mdat_to_eof,
    )
    return ftyp + moov + mdat


def _walk_boxes(buf: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end); verifies framing."""
    pos = start
    while pos < end:
        if end - pos < 8:
            raise ValueError(f"{end - pos} stray bytes after last box")
        (size,) = struct.unpack(">I", buf[pos : pos + 4])
        btype = buf[pos + 4 : pos + 8]
        head = 8
        if size == 1:
            if end - pos < 16:
                raise ValueError("truncated largesize box header")
            (size,) = struct.unpack(">Q", buf[pos + 8 : pos + 16])
            head = 16
        elif size == 0:
            size = end - pos  # to end of enclosing scope (last box)
        if size < head:
            raise ValueError(f"box {btype!r} size {size} too small")
        if pos + size > end:
            raise ValueError(f"box {btype!r} runs past its container")
        yield btype, pos + head, pos + size
        pos += size


def _find(buf, start, end, wanted: bytes):
    for btype, s, e in _walk_boxes(buf, start, end):
        if btype == wanted:
            return s, e
    raise ValueError(f"required box {wanted!r} not found")


def parse_mp4_meta(payload: bytes) -> dict:
    """Top-level walk + moov descent. Returns brand / timescale /
    duration / duration_ms / n_tracks / width / height /
    video_codec / audio_codec (None when no audio track)."""
    top = list(_walk_boxes(payload, 0, len(payload)))
    if not top or top[0][0] != b"ftyp":
        raise ValueError("not an ISO BMFF file (no leading ftyp)")
    if any(t == b"moof" for t, _, _ in top):
        raise NotImplementedError("fragmented MP4 (moof)")
    brand = payload[top[0][1] : top[0][1] + 4].decode("latin-1")
    moovs = [(s, e) for t, s, e in top if t == b"moov"]
    if len(moovs) != 1:
        raise ValueError(f"{len(moovs)} moov boxes (need exactly 1)")
    ms, me = moovs[0]
    if any(t == b"cmov" for t, _, _ in _walk_boxes(payload, ms, me)):
        raise NotImplementedError("compressed moov (cmov)")

    def full_version(s: int) -> int:
        v = payload[s]
        if v > 1:
            raise ValueError(f"fullbox version {v}")
        return v

    hs, he = _find(payload, ms, me, b"mvhd")
    v = full_version(hs)
    if v:
        timescale, = struct.unpack(">I", payload[hs + 20 : hs + 24])
        duration, = struct.unpack(">Q", payload[hs + 24 : hs + 32])
    else:
        timescale, duration = struct.unpack(
            ">II", payload[hs + 12 : hs + 20]
        )
    n_tracks = 0
    width = height = 0
    video_codec = audio_codec = None
    for btype, s, e in _walk_boxes(payload, ms, me):
        if btype != b"trak":
            continue
        n_tracks += 1
        ts, te = _find(payload, s, e, b"tkhd")
        tv = full_version(ts)
        geo_at = ts + (84 if tv else 72) + 8  # matrix end + 8? see below
        # tkhd layout after version/flags: times (8/16) + id (4) +
        # rsvd (4) + duration (4/8) + rsvd(8)+layer(2)+alt(2)+
        # vol(2)+rsvd(2)+matrix(36) -> width/height as 16.16
        base = ts + 4 + (8 + 8 + 4 + 4 + 8 if tv else 4 + 4 + 4 + 4 + 4)
        geo_at = base + 8 + 2 + 2 + 2 + 2 + 36
        w_fx, h_fx = struct.unpack(">II", payload[geo_at : geo_at + 8])
        if (w_fx & 0xFFFF) or (h_fx & 0xFFFF):
            raise ValueError("fractional track dimensions")
        ds, de = _find(payload, s, e, b"mdia")
        hls, hle = _find(payload, ds, de, b"hdlr")
        handler = payload[hls + 8 : hls + 12]
        mfs, mfe = _find(payload, ds, de, b"minf")
        sts, ste = _find(payload, mfs, mfe, b"stbl")
        sds, sde = _find(payload, sts, ste, b"stsd")
        n_entries, = struct.unpack(">I", payload[sds + 4 : sds + 8])
        if n_entries < 1:
            raise ValueError("empty stsd")
        fourcc = payload[sds + 12 : sds + 16].decode("latin-1")
        if handler == b"vide":
            width, height = w_fx >> 16, h_fx >> 16
            video_codec = fourcc
        elif handler == b"soun":
            audio_codec = fourcc
        else:
            raise NotImplementedError(
                f"track handler {handler!r} (vide/soun only)"
            )
    if video_codec is None:
        raise ValueError("no video track")
    return {
        "brand": brand,
        "timescale": timescale,
        "duration": duration,
        "duration_ms": duration * 1000 // timescale,
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
        "video_codec": video_codec,
        "audio_codec": audio_codec,
    }
