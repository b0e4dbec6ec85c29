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
footer), MPEG-1 Layer III frame walk (frame size = 144000*kbps/rate
+ padding), optional trailing ID3v1 tag. CBR files walk with every
header re-verified; VBR files (r15; r14 verdict #5) are accepted
when the FIRST frame carries a Xing or VBRI header — the walk then
allows per-frame bitrate drift, verifies the declared frame and
byte counts against the actual stream, and reports the floor-mean
bitrate — while VBR WITHOUT such a header still refuses (bitrate
drift with no frame count is a guess, and a guessed duration is
worse than a routed refusal). Sample-rate or channel-mode drift
always refuses. MPEG-2 / 2.5, Layers I/II, and free-format bitrate
refuse. Fixture convention (pinned by round-trip): the Xing/VBRI
``frames``/``bytes`` fields count the AUDIO frames after the tag
frame and their bytes; ``audio_bytes`` in the output counts every
frame walked including the tag frame.

MP4 scope (loud): top-level box walk (32-bit sizes, 64-bit
``largesize``, and the size-0 to-end-of-file form), ftyp brand,
moov{mvhd, trak{tkhd, mdia{mdhd, hdlr, minf/stbl/stsd}}} descent
with version 0 AND 1 mvhd/tkhd/mdhd (64-bit times), first
sample-entry fourcc per track. FRAGMENTED files (moof — DASH
segments, in-progress recordings; r15, r14 verdict #6) walk for
real: mvex/trex defaults per track, per-fragment mfhd sequence
numbers verified contiguous, traf{tfhd, trun} with sample durations
resolved through the spec's three-level default chain
(trun per-sample -> tfhd default -> trex default), total duration
accumulated per track in its media timescale. Compressed moov
(cmov), a moof without mvex, and handlers other than vide/soun
refuse.

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


# ----------------------------------------------------- ID3v2 frames


_ID3_ENCODINGS = {0: "latin-1", 1: "utf-16", 3: "utf-8"}


def build_id3v2(frames: list[tuple[str, str, int]], version: int = 3,
                pad: int = 0,
                raw_frames: list[tuple[str, bytes]] | None = None) -> bytes:
    """An ID3v2.3 or v2.4 tag with TEXT frames: (frame_id, text,
    encoding) with encoding 0 = Latin-1, 1 = UTF-16 (BOM), 3 = UTF-8
    (v2.4 only). v2.3 frame sizes are plain big-endian; v2.4 are
    syncsafe — the wire difference the reader must route on.
    ``raw_frames`` (e.g. a PRIV blob) are emitted FIRST so the
    reader's size-skip path sits in front of every text frame."""
    if version not in (3, 4):
        raise ValueError(f"ID3v2.{version} not writable (3/4 only)")
    body = bytearray()
    for fid, payload in raw_frames or []:
        size = (
            _syncsafe(len(payload)) if version == 4
            else struct.pack(">I", len(payload))
        )
        body += fid.encode("ascii") + size + b"\x00\x00" + payload
    for fid, text, enc in frames:
        if len(fid) != 4 or not fid.startswith("T"):
            raise ValueError(f"not a text frame id {fid!r}")
        if enc == 3 and version == 3:
            raise ValueError("UTF-8 text encoding is v2.4-only")
        payload = bytes([enc]) + text.encode(_ID3_ENCODINGS[enc])
        size = (
            _syncsafe(len(payload)) if version == 4
            else struct.pack(">I", len(payload))
        )
        body += fid.encode("ascii") + size + b"\x00\x00" + payload
    body += bytes(pad)  # ID3 padding is zero bytes by spec (§3.0)
    return (
        b"ID3" + bytes([version, 0, 0]) + _syncsafe(len(body)) + bytes(body)
    )


def parse_id3v2_frames(payload: bytes) -> tuple[int, list[dict]]:
    """Walk an ID3v2.3/2.4 tag's TEXT frames. Returns (tag_bytes,
    frames) with frames = [{frame_id, encoding, text}]. Non-text
    frames are skipped by their declared size (their payloads are
    opaque binary — APIC art, etc. — and skipping by size is the
    spec's own forward-compat rule); compression/encryption frame
    flags, unsynchronisation, and unknown text encodings refuse —
    those change the BYTES and a size-skip would mis-frame
    everything after."""
    if payload[:3] != b"ID3":
        raise ValueError("no ID3v2 tag")
    version, revision, flags = payload[3], payload[4], payload[5]
    if version not in (3, 4):
        raise NotImplementedError(f"ID3v2.{version} (2.3/2.4 only)")
    if flags & 0x80:
        raise NotImplementedError("ID3v2 unsynchronisation")
    size = _unsyncsafe(payload[6:10])
    tag_bytes = 10 + size + (10 if flags & 0x10 else 0)
    if len(payload) < tag_bytes:
        raise ValueError("ID3v2 size runs past end of file")
    pos, end = 10, 10 + size
    if flags & 0x40:  # extended header, size-prefixed
        ext = (
            _unsyncsafe(payload[10:14]) if version == 4
            else struct.unpack(">I", payload[10:14])[0] + 4
        )
        pos += ext
    frames = []
    while pos + 10 <= end:
        fid = payload[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        if not all(0x30 <= c <= 0x5A for c in fid):
            raise ValueError(f"malformed frame id {fid!r} at byte {pos}")
        fsize = (
            _unsyncsafe(payload[pos + 4 : pos + 8]) if version == 4
            else struct.unpack(">I", payload[pos + 4 : pos + 8])[0]
        )
        fflags = struct.unpack(">H", payload[pos + 8 : pos + 10])[0]
        if pos + 10 + fsize > end:
            raise ValueError(f"frame {fid!r} runs past the tag")
        if fflags & (0x00C0 if version == 3 else 0x000C):
            raise NotImplementedError(
                f"compressed/encrypted frame {fid!r}"
            )
        data = payload[pos + 10 : pos + 10 + fsize]
        pos += 10 + fsize
        if not fid.startswith(b"T"):
            continue  # non-text frame: size-skip is the spec rule
        if not data:
            raise ValueError(f"empty text frame {fid!r}")
        enc = data[0]
        if enc not in _ID3_ENCODINGS:
            raise NotImplementedError(f"text encoding {enc} in {fid!r}")
        if enc == 3 and version == 3:
            raise ValueError("UTF-8 text encoding inside an ID3v2.3 tag")
        text = data[1:].decode(_ID3_ENCODINGS[enc])
        frames.append(
            {
                "frame_id": fid.decode("ascii"),
                "encoding": enc,
                "text": text.rstrip("\x00"),
            }
        )
    return tag_bytes, frames


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


def _mp3_frame_header(payload: bytes, pos: int, end: int) -> tuple:
    """Validate one MPEG-1 Layer III frame header. Returns
    (bidx, ridx, mode, size). Shared by the CBR and VBR walks."""
    if end - pos < 4:
        raise ValueError(f"{end - pos} stray bytes after last frame")
    b0, b1, b2, b3 = payload[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        raise ValueError(f"lost frame sync at byte {pos}")
    version = (b1 >> 3) & 3
    layer = (b1 >> 1) & 3
    if version != 3:
        raise NotImplementedError("MPEG-2/2.5 audio (MPEG-1 only)")
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
    size = 144_000 * _MP3_BITRATES[bidx] // _MP3_RATES[ridx] + padding
    if pos + size > end:
        raise ValueError("truncated final MP3 frame")
    return bidx, ridx, mode, size


def _mp3_vbr_tag(payload: bytes, pos: int, mode: int, size: int):
    """Xing / VBRI detection in the FIRST frame (the only place the
    spec puts them): Xing sits after the side info (17 bytes mono,
    32 otherwise); VBRI always at header + 36. Returns
    (kind, declared_frames, declared_bytes) or None. The declared
    fields count the audio frames AFTER this tag frame and their
    bytes (fixture convention, pinned by round-trip)."""
    side = 17 if mode == 3 else 32
    at = pos + 4 + side
    if payload[at : at + 4] == b"Xing":
        # a matched magic whose declared fields overrun the first
        # frame is corruption — falling through to the CBR walk
        # would mis-route it silently (r15 ADVICE)
        if at + 12 > pos + size:
            raise ValueError("Xing tag truncated by its own frame")
        flags = int.from_bytes(payload[at + 4 : at + 8], "big")
        if not flags & 0x1:
            raise ValueError("Xing header without a frame count")
        p = at + 8
        frames = int.from_bytes(payload[p : p + 4], "big")
        p += 4
        nbytes = None
        if flags & 0x2:
            if p + 4 > pos + size:
                raise ValueError("Xing tag truncated by its own frame")
            nbytes = int.from_bytes(payload[p : p + 4], "big")
        return ("Xing", frames, nbytes)
    at = pos + 36
    if payload[at : at + 4] == b"VBRI":
        # version(2) delay(2) quality(2) bytes(4) frames(4)
        if at + 18 > pos + size:
            raise ValueError("VBRI tag truncated by its own frame")
        nbytes = int.from_bytes(payload[at + 10 : at + 14], "big")
        frames = int.from_bytes(payload[at + 14 : at + 18], "big")
        return ("VBRI", frames, nbytes)
    return None


def _mp3_frame(bidx: int, ridx: int, mode: int, padding: int,
               body_fn) -> bytes:
    hdr = bytes(
        [0xFF, 0xFB, (bidx << 4) | (ridx << 2) | (padding << 1),
         (mode & 3) << 6]
    )
    size = 144_000 * _MP3_BITRATES[bidx] // _MP3_RATES[ridx] + padding
    return hdr + body_fn(size - 4)


def build_mp3_vbr(
    sample_rate: int,
    n_frames: int,
    mode: int,
    id3v2_pad: int,
    id3v1: bool,
    kind: str = "Xing",
    kbps_fn=None,
    seed: int = 0,
) -> bytes:
    """A VBR MPEG-1 Layer III file: optional ID3v2.3 tag, a FIRST
    frame carrying a Xing (flags frames|bytes|TOC) or VBRI header at
    its spec offset, then n_frames audio frames whose bitrate cycles
    via ``kbps_fn(j)`` (padding bit on every third frame, like the
    CBR builder), optional ID3v1 trailer. The tag frame itself is
    64 kbps. The frames/bytes fields count the AUDIO frames and
    their bytes — the reader verifies both against the stream."""
    if kbps_fn is None:
        kbps_fn = lambda j: _MP3_BITRATES[1 + j % 14]  # noqa: E731
    ridx = _MP3_RATES.index(sample_rate)
    out = bytearray()
    if id3v2_pad >= 0:
        out += b"ID3" + b"\x03\x00\x00" + _syncsafe(id3v2_pad)
        out += bytes((seed + k) % 251 for k in range(id3v2_pad))
    frames = []
    audio_bytes = 0
    for j in range(n_frames):
        padding = 1 if j % 3 == 2 else 0
        bidx = _MP3_BITRATES.index(kbps_fn(j))
        f = _mp3_frame(
            bidx, ridx, mode, padding,
            lambda sz, j=j: bytes((seed + j + k) % 251 for k in range(sz)),
        )
        frames.append(f)
        audio_bytes += len(f)
    # tag frame: 64 kbps, no padding, Xing/VBRI payload at its offset
    side = 17 if mode == 3 else 32
    tag_size = 144_000 * 64 // sample_rate

    def tag_body(sz: int) -> bytes:
        body = bytearray(bytes((seed + k) % 251 for k in range(sz)))
        if kind == "Xing":
            at = side  # relative to body start (header already cut)
            blob = (
                b"Xing"
                + (0x7).to_bytes(4, "big")
                + n_frames.to_bytes(4, "big")
                + audio_bytes.to_bytes(4, "big")
                + bytes(100)  # TOC (flag set; content unused here)
            )
        elif kind == "VBRI":
            at = 32
            blob = (
                b"VBRI"
                + (1).to_bytes(2, "big")
                + (0).to_bytes(2, "big")
                + (0).to_bytes(2, "big")
                + audio_bytes.to_bytes(4, "big")
                + n_frames.to_bytes(4, "big")
                + (0).to_bytes(2, "big")   # table entry count
                + (1).to_bytes(2, "big")   # scale
                + (2).to_bytes(2, "big")   # entry bytes
                + (1).to_bytes(2, "big")   # frames per entry
            )
        else:
            raise ValueError(f"unknown VBR tag kind {kind!r}")
        if at + len(blob) > sz:
            raise ValueError("tag frame too small for VBR header")
        body[at : at + len(blob)] = blob
        return bytes(body)

    assert tag_size >= 4
    out += _mp3_frame(_MP3_BITRATES.index(64), ridx, mode, 0, tag_body)
    out += b"".join(frames)
    if id3v1:
        out += b"TAG" + bytes((seed + k) % 97 for k in range(125))
    return bytes(out)


def parse_mp3_meta(payload: bytes) -> dict:
    """Header walk: ID3v2 skip, frame walk with every frame header
    re-verified, ID3v1 trailer. CBR files refuse on ANY header
    drift; a first-frame Xing/VBRI header switches to the VBR walk
    (bitrate free to drift, rate/mode pinned, declared frame and
    byte counts VERIFIED against the stream); bitrate drift without
    such a header still refuses. Returns tag_bytes / bitrate_kbps
    (nominal for CBR, floor-mean over the audio frames for VBR) /
    sample_rate / channels / n_frames (audio frames, excluding the
    VBR tag frame) / audio_bytes (every frame walked, including the
    tag frame) / vbr / has_id3v1 / duration_ms (integer
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
    if pos >= end:
        raise ValueError("no MP3 frames in file")
    bidx0, ridx0, mode0, size0 = _mp3_frame_header(payload, pos, end)
    vbr = _mp3_vbr_tag(payload, pos, mode0, size0)
    n_frames = 0
    audio_bytes = 0
    if vbr is not None:
        kind, declared_frames, declared_bytes = vbr
        audio_bytes = size0  # the tag frame is still a walked frame
        pos += size0
        vbr_audio_bytes = 0
        while pos < end:
            bidx, ridx, mode, size = _mp3_frame_header(payload, pos, end)
            if ridx != ridx0:
                raise ValueError("sample-rate drift between frames")
            if mode != mode0:
                raise ValueError("channel-mode drift between frames")
            pos += size
            n_frames += 1
            vbr_audio_bytes += size
        if n_frames != declared_frames:
            raise ValueError(
                f"{kind} header declares {declared_frames} frames,"
                f" stream has {n_frames}"
            )
        if declared_bytes is not None and vbr_audio_bytes != declared_bytes:
            raise ValueError(
                f"{kind} header declares {declared_bytes} audio bytes,"
                f" stream has {vbr_audio_bytes}"
            )
        if n_frames == 0:
            raise ValueError("VBR tag frame with no audio frames")
        audio_bytes += vbr_audio_bytes
        rate = _MP3_RATES[ridx0]
        kbps = (
            vbr_audio_bytes * 8 * rate
            // (n_frames * _MP3_SAMPLES_PER_FRAME * 1000)
        )
    else:
        first = (bidx0, ridx0, mode0)
        while pos < end:
            bidx, ridx, mode, size = _mp3_frame_header(payload, pos, end)
            if (bidx, ridx, mode) != first:
                raise NotImplementedError(
                    "VBR / mid-stream header change without a"
                    " Xing/VBRI header (CBR or tagged VBR only)"
                )
            pos += size
            n_frames += 1
            audio_bytes += size
        rate = _MP3_RATES[ridx0]
        kbps = _MP3_BITRATES[bidx0]
    return {
        "tag_bytes": tag_bytes,
        "bitrate_kbps": kbps,
        "sample_rate": rate,
        "channels": 1 if mode0 == 3 else 2,
        "n_frames": n_frames,
        "audio_bytes": audio_bytes,
        "vbr": vbr is not None,
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


def _full(version: int, payload: bytes, flags: int = 0) -> bytes:
    return bytes(
        [version, (flags >> 16) & 0xFF, (flags >> 8) & 0xFF, flags & 0xFF]
    ) + payload


def _mvhd(timescale: int, duration: int, v1_times: bool) -> bytes:
    t = struct.pack(">Q" if v1_times else ">I", 0)  # creation/mod
    dur = struct.pack(">Q" if v1_times else ">I", duration)
    return _box(
        b"mvhd",
        _full(1 if v1_times else 0,
              t + t + struct.pack(">I", timescale) + dur
              + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
              + b"\x00" * 10 + b"\x00" * 36 + b"\x00" * 24
              + struct.pack(">I", 3)),
    )


def _trak(track_id: int, handler: bytes, fourcc: bytes, w: int, h: int,
          timescale: int, duration: int, v1_times: bool) -> bytes:
    t = struct.pack(">Q" if v1_times else ">I", 0)
    dur = struct.pack(">Q" if v1_times else ">I", duration)
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
    mvhd = _mvhd(timescale, duration, v1_times)
    traks = _trak(1, b"vide", video_codec, width, height,
                  timescale, duration, v1_times)
    if audio_codec is not None:
        traks += _trak(2, b"soun", audio_codec, 0, 0,
                       timescale, duration, v1_times)
    moov = _box(b"moov", mvhd + traks)
    mdat = _box(
        b"mdat",
        bytes((seed + k) % 251 for k in range(mdat_size)),
        largesize=mdat_largesize,
        to_eof=mdat_to_eof,
    )
    return ftyp + moov + mdat


def build_mp4_fragmented(
    brand: bytes,
    timescale: int,
    width: int,
    height: int,
    video_codec: bytes,
    audio_codec: bytes | None,
    v1_times: bool,
    fragments: list[dict],
    trex_default_duration: int,
    seed: int = 0,
) -> bytes:
    """An fMP4: ftyp + moov{mvhd(dur 0), traks(dur 0), mvex{trex per
    track}} + per fragment moof{mfhd(seq), traf{tfhd, trun}} + mdat.
    Each fragment dict is {"samples": n, "mode": m, "dur": d} with
    mode selecting which level of the duration-default chain the
    wire exercises: "trun" = per-sample durations (d is a list of n),
    "tfhd" = tfhd default_sample_duration d, "trex" = neither box
    carries a duration and the trex default applies. All fragments
    belong to the video track (track 1)."""
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand + b"isom")
    traks = _trak(1, b"vide", video_codec, width, height,
                  timescale, 0, v1_times)
    trex = _box(
        b"trex",
        _full(0, struct.pack(">IIIII", 1, 1, trex_default_duration, 0, 0)),
    )
    if audio_codec is not None:
        traks += _trak(2, b"soun", audio_codec, 0, 0,
                       timescale, 0, v1_times)
        trex += _box(
            b"trex", _full(0, struct.pack(">IIIII", 2, 1, 0, 0, 0))
        )
    moov = _box(
        b"moov", _mvhd(timescale, 0, v1_times) + traks + _box(b"mvex", trex)
    )
    out = bytearray(ftyp + moov)
    for f, spec in enumerate(fragments):
        n = spec["samples"]
        mode = spec["mode"]
        mfhd = _box(b"mfhd", _full(0, struct.pack(">I", f + 1)))
        tf_flags = 0x020000  # default-base-is-moof
        tf_payload = struct.pack(">I", 1)  # track_id
        tr_flags = 0x000001  # data-offset present
        tr_payload = struct.pack(">I", n)
        if mode == "trun":
            durs = spec["dur"]
            if len(durs) != n:
                raise ValueError("per-sample duration list length != n")
            tr_flags |= 0x000100
        elif mode == "tfhd":
            tf_flags |= 0x000008
            tf_payload += struct.pack(">I", spec["dur"])
        elif mode != "trex":
            raise ValueError(f"unknown fragment mode {mode!r}")
        tfhd = _box(b"tfhd", _full(0, tf_payload, flags=tf_flags))
        tr_payload += struct.pack(">i", 0)  # data offset, patched unused
        if mode == "trun":
            for d in spec["dur"]:
                tr_payload += struct.pack(">I", d)
        trun = _box(b"trun", _full(0, tr_payload, flags=tr_flags))
        moof = _box(b"moof", mfhd + _box(b"traf", tfhd + trun))
        mdat = _box(
            b"mdat", bytes((seed + f + k) % 251 for k in range(24 + f % 9))
        )
        out += moof + mdat
    return bytes(out)


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


def _parse_tfhd(payload: bytes, s: int, e: int) -> tuple[int, int | None]:
    """tfhd -> (track_id, default_sample_duration or None). Unknown
    flag bits refuse — their payload length is unknown, and a
    guessed skip mis-frames every later field."""
    flags = int.from_bytes(payload[s + 1 : s + 4], "big")
    if flags & ~0x02003B:
        raise NotImplementedError(f"tfhd flags {flags:#x}")
    p = s + 4
    track_id, = struct.unpack(">I", payload[p : p + 4])
    p += 4
    if flags & 0x1:
        p += 8  # base-data-offset
    if flags & 0x2:
        p += 4  # sample-description-index
    dsd = None
    if flags & 0x8:
        dsd, = struct.unpack(">I", payload[p : p + 4])
        p += 4
    if p > e:
        raise ValueError("tfhd fields run past the box")
    return track_id, dsd


def _parse_trun(payload: bytes, s: int, e: int) -> tuple[int, list | None]:
    """trun -> (sample_count, per-sample durations or None)."""
    version = payload[s]
    flags = int.from_bytes(payload[s + 1 : s + 4], "big")
    if version > 1 or flags & ~0x000F05:
        raise NotImplementedError(f"trun version {version}/flags {flags:#x}")
    p = s + 4
    count, = struct.unpack(">I", payload[p : p + 4])
    p += 4
    if flags & 0x1:
        p += 4  # data-offset
    if flags & 0x4:
        p += 4  # first-sample-flags
    per = (
        (4 if flags & 0x100 else 0)
        + (4 if flags & 0x200 else 0)
        + (4 if flags & 0x400 else 0)
        + (4 if flags & 0x800 else 0)
    )
    if p + per * count > e:
        raise ValueError("trun sample table runs past the box")
    durs = None
    if flags & 0x100:
        durs = []
        q = p
        for _ in range(count):
            durs.append(struct.unpack(">I", payload[q : q + 4])[0])
            q += per
    return count, durs


def parse_mp4_meta(payload: bytes) -> dict:
    """Top-level walk + moov descent; fragmented files (moof) walk
    their traf/trun tables for real. Returns brand / timescale /
    duration / duration_ms / n_tracks / width / height /
    video_codec / audio_codec (None when no audio track) /
    fragmented / n_fragments (0 for plain files). For fragmented
    files the duration is the accumulated sample-duration total of
    the longest track in its MEDIA timescale (the mvhd duration of
    an fMP4 is legitimately 0)."""
    top = list(_walk_boxes(payload, 0, len(payload)))
    if not top or top[0][0] != b"ftyp":
        raise ValueError("not an ISO BMFF file (no leading ftyp)")
    brand = payload[top[0][1] : top[0][1] + 4].decode("latin-1")
    moovs = [(s, e) for t, s, e in top if t == b"moov"]
    if len(moovs) != 1:
        raise ValueError(f"{len(moovs)} moov boxes (need exactly 1)")
    ms, me = moovs[0]
    if any(t == b"cmov" for t, _, _ in _walk_boxes(payload, ms, me)):
        raise NotImplementedError("compressed moov (cmov)")
    moofs = [(s, e) for t, s, e in top if t == b"moof"]

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
    track_timescale: dict[int, int] = {}
    for btype, s, e in _walk_boxes(payload, ms, me):
        if btype != b"trak":
            continue
        n_tracks += 1
        ts, te = _find(payload, s, e, b"tkhd")
        tv = full_version(ts)
        base = ts + 4 + (8 + 8 + 4 + 4 + 8 if tv else 4 + 4 + 4 + 4 + 4)
        # tkhd layout after version/flags: times (8/16) + id (4) +
        # rsvd (4) + duration (4/8) + rsvd(8)+layer(2)+alt(2)+
        # vol(2)+rsvd(2)+matrix(36) -> width/height as 16.16
        id_at = ts + 4 + (16 if tv else 8)
        track_id, = struct.unpack(">I", payload[id_at : id_at + 4])
        geo_at = base + 8 + 2 + 2 + 2 + 2 + 36
        w_fx, h_fx = struct.unpack(">II", payload[geo_at : geo_at + 8])
        if (w_fx & 0xFFFF) or (h_fx & 0xFFFF):
            raise ValueError("fractional track dimensions")
        ds, de = _find(payload, s, e, b"mdia")
        mhs, mhe = _find(payload, ds, de, b"mdhd")
        mv = full_version(mhs)
        if mv:
            media_ts, = struct.unpack(">I", payload[mhs + 20 : mhs + 24])
        else:
            media_ts, = struct.unpack(">I", payload[mhs + 12 : mhs + 16])
        track_timescale[track_id] = media_ts
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
    if moofs:
        # fragmented walk: trex defaults, contiguous mfhd sequence
        # numbers, three-level sample-duration default chain
        try:
            xs, xe = _find(payload, ms, me, b"mvex")
        except ValueError:
            raise ValueError(
                "fragmented file (moof) without an mvex box"
            ) from None
        trex_default: dict[int, int] = {}
        for bt, s, e in _walk_boxes(payload, xs, xe):
            if bt == b"trex":
                tid, _sdi, ddur = struct.unpack(
                    ">III", payload[s + 4 : s + 16]
                )
                trex_default[tid] = ddur
        track_units: dict[int, int] = {}
        for k, (fs, fe) in enumerate(moofs):
            mfs_, mfe_ = _find(payload, fs, fe, b"mfhd")
            seq, = struct.unpack(">I", payload[mfs_ + 4 : mfs_ + 8])
            if seq != k + 1:
                raise ValueError(
                    f"fragment sequence gap: moof {k} has mfhd"
                    f" sequence {seq}"
                )
            for bt, s, e in _walk_boxes(payload, fs, fe):
                if bt != b"traf":
                    continue
                ths, the = _find(payload, s, e, b"tfhd")
                track_id, dsd = _parse_tfhd(payload, ths, the)
                if track_id not in track_timescale:
                    raise ValueError(
                        f"traf references unknown track {track_id}"
                    )
                for bt2, s2, e2 in _walk_boxes(payload, s, e):
                    if bt2 != b"trun":
                        continue
                    count, durs = _parse_trun(payload, s2, e2)
                    if durs is not None:
                        add = sum(durs)
                    elif dsd is not None:
                        add = count * dsd
                    elif track_id in trex_default:
                        add = count * trex_default[track_id]
                    else:
                        raise ValueError(
                            f"no sample duration for track {track_id}"
                            " at any default level (trun/tfhd/trex)"
                        )
                    track_units[track_id] = (
                        track_units.get(track_id, 0) + add
                    )
        if not track_units:
            raise ValueError("fragmented file with no traf sample runs")
        longest = max(track_units, key=lambda t: track_units[t])
        duration = track_units[longest]
        dur_ts = track_timescale[longest]
    else:
        dur_ts = timescale
    return {
        "brand": brand,
        "timescale": timescale,
        "duration": duration,
        "duration_ms": duration * 1000 // dur_ts,
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
        "video_codec": video_codec,
        "audio_codec": audio_codec,
        "fragmented": bool(moofs),
        "n_fragments": len(moofs),
    }
