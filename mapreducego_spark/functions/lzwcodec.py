"""TIFF/PDF-flavored LZW, pure stdlib (r17; r16 verdict #3/#5).

TIFF 6.0 §13 and ISO 32000-1 §7.4.4.2 (LZWDecode) describe the SAME
public algorithm — the one real scanned-document TIFFs and pre-1.2
PDF content streams carry — and it differs from the GIF variant
(functions/gifcodec.py) in three wire-visible ways:

- codes are packed MSB-first (GIF packs LSB-first);
- the alphabet is fixed at 8-bit bytes: 256 = ClearCode, 257 = EOD
  (TIFF calls it EOI), first table entry 258, widths 9..12;
- the "early change" off-by-one: the DECODER widens its code width
  when the next free entry reaches 2^width - 1 (511/1023/2047),
  one entry before the encoder's 2^width — the historical behavior
  both specs standardize (PDF's /EarlyChange 1 default; an
  /EarlyChange 0 stream refuses loudly at the call sites).

The encoder emits ClearCode first (both specs require strips and
streams to begin with it), resets the table in-band when the next
free entry reaches 4094 (TIFF §13: staying inside 12 bits under
early change), and ends with EOD. The decoder handles CLEAR at any
point, the KwKwK self-reference, refuses codes past the table, a
missing EOD (truncated stream), and — when ``expect`` is given
(TIFF strips, whose inflated size is geometry-determined) — any
output-length mismatch.

Shared by functions/tiffcodec.py (Compression 5) and
sources/pdfcodec.py (/LZWDecode). Reference analog: opaque media
bytes at /root/reference/mpMaster/master.go:77-89.
"""

from __future__ import annotations

_CLEAR = 256
_EOD = 257
_FIRST = 258
_RESET_AT = 4094  # TIFF 6.0 §13: emit ClearCode when free entry hits


def lzw_encode(data: bytes) -> bytes:
    """MSB-first early-change LZW over raw bytes."""
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    def fresh():
        return {bytes([c]): c for c in range(256)}, _FIRST, 9

    table, nxt, width = fresh()
    emit(_CLEAR, width)
    cur = b""
    n_since_clear = 0
    for b in data:
        cand = cur + bytes([b])
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        n_since_clear += 1
        table[cand] = nxt
        nxt += 1
        # encoder widens at 2^width; the decoder's matching rule is
        # 2^width - 1 because its table additions lag one code behind
        if nxt == (1 << width) and width < 12:
            width += 1
        if nxt == _RESET_AT:
            emit(_CLEAR, width)
            table, nxt, width = fresh()
            n_since_clear = 0
        cur = bytes([b])
    if cur:
        emit(table[cur], width)
        n_since_clear += 1
    # the decoder appends ONE more entry after the final data code
    # (its additions lag the encoder's by one) and widens if that
    # entry lands on 2^width - 1 — so EOD must go out at the width
    # the decoder will be reading with. Only applies when the final
    # code is not the first after a CLEAR (no append then). The GIF
    # encoder makes the same endgame correction at its own widen
    # boundary (gifcodec.py, the r14 disposal-fixture find).
    if n_since_clear >= 2:
        if nxt == (1 << width) - 1 and width < 12:
            width += 1
    emit(_EOD, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, expect: int | None = None) -> bytes:
    """Inverse of lzw_encode; refuses truncated streams (no EOD),
    codes past the table, and — with ``expect`` — any output-length
    mismatch. Trailing pad bits after EOD are ignored (TIFF strips
    byte-align)."""
    out = bytearray()
    pos = 0  # bit cursor
    total_bits = len(data) * 8

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > total_bits:
            raise ValueError("LZW stream truncated mid-code (no EOD)")
        byte, bit = divmod(pos, 8)
        span = data[byte : byte + (bit + width + 7) // 8]
        val = int.from_bytes(span, "big")
        pos += width
        shift = len(span) * 8 - bit - width
        return (val >> shift) & ((1 << width) - 1)

    def fresh():
        return [bytes([c]) for c in range(256)] + [b"", b""], 9

    table, width = fresh()
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == _CLEAR:
            table, width = fresh()
            prev = None
            continue
        if code == _EOD:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(
                f"LZW code {code} past table size {len(table)}"
            )
        out += entry
        if expect is not None and len(out) > expect:
            raise ValueError(
                f"LZW stream inflates past its {expect}-byte extent"
            )
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            # early change: the decoder widens ONE entry before the
            # encoder (TIFF 6.0 §13 / PDF EarlyChange 1)
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
        prev = entry
    if expect is not None and len(out) != expect:
        raise ValueError(
            f"LZW stream inflated to {len(out)} bytes, expected {expect}"
        )
    return bytes(out)
