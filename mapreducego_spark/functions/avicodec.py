"""RIFF/AVI MJPEG container codec, pure stdlib (r13; r12 verdict
missing #3 — video as the third training-data modality).

Images (jpegcodec.py, the PNG decoder) and audio (wavcodec.py) have
real codecs; this closes the triad with the container format that
needs ZERO new entropy-coding surface: AVI is the same RIFF chunk
grammar wavcodec walks (little-endian fourcc + u32 size, word-
aligned odd chunks), and an MJPEG video stream's frames are each a
complete baseline JPEG the EXISTING decode_jpeg entropy-decodes.
Layout implemented from the public AVI 1.0 / OpenDML structure:

    RIFF('AVI '
        LIST('hdrl'
            'avih' <MainAVIHeader: 14 u32>
            LIST('strl' 'strh' <AVISTREAMHEADER> 'strf' <BITMAPINFOHEADER>))
        LIST('movi' '00dc' <JPEG> '00dc' <JPEG> ...))

Scope (loud): one 'vids' stream with handler/compression 'MJPG';
frames in '##dc'/'##db' chunks of the movi list. A second stream,
a non-video stream, or a non-MJPG handler raises
NotImplementedError (this codec cannot decode other payloads and
never pretends to); structurally broken containers — bad magic,
truncated chunks, missing hdrl/avih/strl/movi, a frame count that
contradicts avih — raise ValueError.

Reference parity note: the reference repo (MapReduceGo) has no media
tier; this belongs to the 100 TB training-data north star (frame
extraction + per-frame features run right after crawl ingest).
"""

from __future__ import annotations

import struct


def _chunk(cid: bytes, data: bytes) -> bytes:
    out = cid + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        out += b"\x00"  # RIFF word alignment pad
    return out


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def encode_avi_mjpeg(
    width: int,
    height: int,
    us_per_frame: int,
    frames: list[bytes],
) -> bytes:
    """Encode complete JPEG blobs as a minimal spec-shaped MJPEG AVI
    (one 'vids' stream, frames as '00dc' chunks). Fixture/test
    plumbing for the decode tier — the parser below must walk it
    exactly like real capture output."""
    if not frames:
        raise ValueError("AVI needs at least one frame")
    avih = struct.pack(
        "<14I",
        us_per_frame,          # dwMicroSecPerFrame
        0,                     # dwMaxBytesPerSec
        0,                     # dwPaddingGranularity
        0x10,                  # dwFlags: AVIF_HASINDEX off, interleaved-ish
        len(frames),           # dwTotalFrames
        0,                     # dwInitialFrames
        1,                     # dwStreams
        0,                     # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,            # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,                 # dwFlags
            0, 0,              # wPriority, wLanguage
            0,                 # dwInitialFrames
            us_per_frame,      # dwScale
            1_000_000,         # dwRate: fps = rate/scale
            0,                 # dwStart
            len(frames),       # dwLength (frames)
            0,                 # dwSuggestedBufferSize
            0,                 # dwQuality
            0,                 # dwSampleSize
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,                    # biSize
        width,
        height,
        1,                     # biPlanes
        24,                    # biBitCount
        b"MJPG",               # biCompression fourcc
        width * height * 3,    # biSizeImage (nominal)
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, size) over one chunk sequence,
    skipping word-alignment pads; loud on overruns."""
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = pos + 8
        if body + size > end:
            raise ValueError(
                f"AVI chunk {cid!r} declares {size} bytes past its parent"
            )
        yield cid, body, size
        pos = body + size + (size % 2)


def parse_avi(payload: bytes) -> tuple[dict, list[bytes]]:
    """Parse an MJPEG AVI into (meta, frames).

    ``meta``: us_per_frame, n_frames, width, height, handler
    ('MJPG'), duration_us (exact integer). ``frames``: the raw JPEG
    bytes of each '##dc'/'##db' chunk in movi order — feed them to
    jpegcodec.decode_jpeg."""
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError("not a RIFF file")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    if payload[8:12] != b"AVI ":
        raise ValueError("RIFF file is not AVI")
    if riff_size + 8 > len(payload):
        raise ValueError("RIFF size exceeds payload (truncated file)")
    end = 8 + riff_size
    avih = None
    handler = None
    n_video_streams = 0
    frames: list[bytes] = []
    saw_movi = False
    for cid, body, size in _walk_chunks(payload, 12, end):
        if cid != b"LIST":
            continue  # top-level JUNK etc.: skip by size
        fourcc = payload[body : body + 4]
        if fourcc == b"hdrl":
            for c2, b2, s2 in _walk_chunks(payload, body + 4, body + size):
                if c2 == b"avih":
                    if s2 < 56:
                        raise ValueError("avih shorter than MainAVIHeader")
                    avih = struct.unpack("<14I", payload[b2 : b2 + 56])
                elif c2 == b"LIST" and payload[b2 : b2 + 4] == b"strl":
                    for c3, b3, s3 in _walk_chunks(
                        payload, b2 + 4, b2 + s2
                    ):
                        if c3 != b"strh":
                            continue
                        fcc_type = payload[b3 : b3 + 4]
                        fcc_handler = payload[b3 + 4 : b3 + 8]
                        if fcc_type != b"vids":
                            raise NotImplementedError(
                                f"non-video AVI stream {fcc_type!r}"
                            )
                        if fcc_handler != b"MJPG":
                            raise NotImplementedError(
                                f"AVI video handler {fcc_handler!r}"
                                " (MJPG only)"
                            )
                        n_video_streams += 1
                        handler = "MJPG"
        elif fourcc == b"movi":
            saw_movi = True
            for c2, b2, s2 in _walk_chunks(payload, body + 4, body + size):
                # '##dc' compressed / '##db' uncompressed video frame
                if c2[2:4] in (b"dc", b"db"):
                    frames.append(payload[b2 : b2 + s2])
    if avih is None:
        raise ValueError("AVI missing hdrl/avih header")
    if n_video_streams != 1:
        raise ValueError(
            f"AVI declares {n_video_streams} video streams (need exactly 1)"
        )
    if not saw_movi:
        raise ValueError("AVI missing movi list")
    if avih[4] != len(frames):
        raise ValueError(
            f"avih dwTotalFrames {avih[4]} != movi frame count {len(frames)}"
        )
    return (
        {
            "us_per_frame": avih[0],
            "n_frames": len(frames),
            "width": avih[8],
            "height": avih[9],
            "handler": handler,
            "duration_us": avih[0] * len(frames),
        },
        frames,
    )
