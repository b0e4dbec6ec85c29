"""Minimal-but-real PDF writer/reader for the crawl-ingest tier.

PDF is the single highest-volume document format in real LLM training
corpora, and its text lives behind three layers this module walks for
real: the object/xref file grammar (ISO 32000-1 §7), FlateDecode
content streams (zlib is stdlib), and the text-showing operator
subset of the content-stream language (BT/ET, Tj/TJ/', Td/TD/T*).
The writer emits the same grammar so fixtures staged from the
documents table can be rebuilt closed-form by a DuckDB oracle — the
same staging pattern as the WARC tier (warccodec.py).

Scope (loud, not silent): FlateDecode and raw streams only — LZW,
DCT, CCITT, predictors (/DecodeParms) raise NotImplementedError;
encrypted PDFs (/Encrypt in the trailer) refuse; PDF 1.5+ xref
STREAMS and incremental updates (/Prev) refuse; the content
interpreter accepts the text operators plus no-op graphics state and
raises on anything else, so a construct the extractor would silently
mis-read never passes. Strings decode as Latin-1, which agrees with
WinAnsiEncoding on every byte the fixtures (and the declared font)
serve. Offsets in the xref table are VERIFIED against the actual
object positions — a drifted table is corruption, not a suggestion.

Reference analog: whole-file ingest at /root/reference/mpMaster/
master.go:77-89 hands opaque bytes to user code; this module is that
contract with a real document grammar on top.
"""

from __future__ import annotations

import re
import zlib

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"

# ------------------------------------------------------------ writer


def _esc_literal(s: str) -> str:
    """Escape a text string for a PDF literal string ``(...)``."""
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _render_line(j: int, line: str) -> str:
    """One shown line of a content stream, cycling the three string
    syntaxes so the reader's literal-escape, kerned-array, and
    hex-string paths all stay exercised by every fixture:
    j%3==0 -> literal Tj with the first char octal-escaped,
    j%3==1 -> TJ array split mid-line with a kerning number,
    j%3==2 -> hex string Tj."""
    style = j % 3
    if style == 0:
        return "(\\%03o%s) Tj" % (ord(line[0]), _esc_literal(line[1:]))
    if style == 1:
        cut = max(1, len(line) // 2)
        return "[(%s) -18 (%s)] TJ" % (
            _esc_literal(line[:cut]),
            _esc_literal(line[cut:]),
        )
    return "<%s> Tj" % line.encode("latin-1").hex()


def render_page_content(lines: list[str], footer: str) -> bytes:
    """Content stream for one page: the body lines cycled through the
    three string syntaxes with ``T*`` line advances, then the footer
    shown through the ``'`` (next-line-and-show) operator with its
    parens/backslash served as escape sequences and its ``#`` as an
    octal code."""
    ops = ["BT", "/F1 11 Tf", "14 TL", "72 720 Td"]
    for j, line in enumerate(lines):
        if j:
            ops.append("T*")
        ops.append(_render_line(j, line))
    foot = footer.replace("\\", "\\\\")
    foot = foot.replace("(", r"\(").replace(")", r"\)").replace("#", r"\043")
    ops.append("(%s) '" % foot)
    ops.append("ET")
    return "\n".join(ops).encode("latin-1")


def build_pdf(page_contents: list[bytes], compress: list[bool]) -> bytes:
    """Assemble a complete single-revision PDF 1.4: catalog, flat
    page tree, one Type1 font, one content stream per page.
    Compressed streams carry their /Length as an INDIRECT reference
    (the shape real writers emit, since the length is unknown until
    the stream is written) resolved through an extra integer object;
    raw streams carry it inline. The xref table and trailer are
    exact — the reader verifies every offset."""
    if len(page_contents) != len(compress) or not page_contents:
        raise ValueError("pages/compress mismatch or empty PDF")
    objs: list[bytes] = []  # objs[k] = body of object k+1

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    n_pages = len(page_contents)
    add(b"")  # 1: catalog, patched below
    add(b"")  # 2: pages, patched below
    add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /Encoding /WinAnsiEncoding >>"
    )
    kids = []
    for p, (content, comp) in enumerate(zip(page_contents, compress)):
        data = zlib.compress(content, 6) if comp else content
        if comp:
            length_num = len(objs) + 3  # page, stream, then length obj
            stream_dict = (
                b"<< /Length %d 0 R /Filter /FlateDecode >>" % length_num
            )
        else:
            stream_dict = b"<< /Length %d >>" % len(data)
        page_num = add(b"")  # patched after the content obj exists
        content_num = add(
            stream_dict + b"\nstream\n" + data + b"\nendstream"
        )
        if comp:
            add(b"%d" % len(data))
        objs[page_num - 1] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Resources << /Font << /F1 3 0 R >> >>"
            b" /Contents %d 0 R >>" % content_num
        )
        kids.append(b"%d 0 R" % page_num)
    objs[0] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[1] = b"<< /Type /Pages /Kids [%s] /Count %d >>" % (
        b" ".join(kids),
        n_pages,
    )

    out = bytearray(b"%PDF-1.4\n%\xc2\xb5\xc2\xb6\n")
    offsets = []
    for k, body in enumerate(objs):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % (k + 1) + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


# ------------------------------------------------------------ reader


class _Parser:
    """Recursive-descent parser over the PDF object grammar."""

    def __init__(self, buf: bytes, i: int = 0):
        self.buf = buf
        self.i = i

    def _ws(self) -> None:
        buf, n = self.buf, len(self.buf)
        while self.i < n:
            c = buf[self.i : self.i + 1]
            if c in (b"\x00", b"\t", b"\n", b"\x0c", b"\r", b" "):
                self.i += 1
            elif c == b"%":
                nl = buf.find(b"\n", self.i)
                self.i = n if nl < 0 else nl + 1
            else:
                return

    def _expect(self, tok: bytes) -> None:
        self._ws()
        if not self.buf.startswith(tok, self.i):
            raise ValueError(
                f"expected {tok!r} at byte {self.i}, found"
                f" {self.buf[self.i:self.i + 16]!r}"
            )
        self.i += len(tok)

    def _name(self) -> str:
        # past the leading '/'
        start = self.i
        buf, n = self.buf, len(self.buf)
        while self.i < n and buf[self.i] not in _WS and buf[self.i] not in _DELIM:
            self.i += 1
        raw = buf[start : self.i]
        if b"#" in raw:  # #xx hex escapes in names
            raw = re.sub(
                rb"#([0-9A-Fa-f]{2})",
                lambda m: bytes([int(m.group(1), 16)]),
                raw,
            )
        return raw.decode("latin-1")

    def _literal_string(self) -> bytes:
        buf, n = self.buf, len(self.buf)
        out = bytearray()
        depth = 1
        while True:
            if self.i >= n:
                raise ValueError("unterminated literal string")
            c = buf[self.i]
            self.i += 1
            if c == 0x5C:  # backslash
                if self.i >= n:
                    raise ValueError("dangling string escape")
                e = buf[self.i]
                self.i += 1
                table = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}
                if e in table:
                    out.append(table[e])
                elif e in (0x28, 0x29, 0x5C):
                    out.append(e)
                elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                    oct_s = chr(e)
                    while (
                        len(oct_s) < 3
                        and self.i < n
                        and 0x30 <= buf[self.i] <= 0x37
                    ):
                        oct_s += chr(buf[self.i])
                        self.i += 1
                    out.append(int(oct_s, 8) & 0xFF)
                elif e in (0x0A, 0x0D):  # line continuation
                    if e == 0x0D and self.i < n and buf[self.i] == 0x0A:
                        self.i += 1
                else:  # spec: stray backslash is dropped
                    out.append(e)
            elif c == 0x28:
                depth += 1
                out.append(c)
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)

    def _hex_string(self) -> bytes:
        end = self.buf.find(b">", self.i)
        if end < 0:
            raise ValueError("unterminated hex string")
        hx = re.sub(rb"[\x00\t\n\x0c\r ]", b"", self.buf[self.i : end])
        self.i = end + 1
        if not re.fullmatch(rb"[0-9A-Fa-f]*", hx):
            raise ValueError("non-hex byte in hex string")
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii"))

    def value(self):
        self._ws()
        buf = self.buf
        if self.i >= len(buf):
            raise ValueError("unexpected end of PDF data")
        if buf.startswith(b"<<", self.i):
            self.i += 2
            d = {}
            while True:
                self._ws()
                if buf.startswith(b">>", self.i):
                    self.i += 2
                    return d
                if buf[self.i : self.i + 1] != b"/":
                    raise ValueError(
                        f"dictionary key must be a name at byte {self.i}"
                    )
                self.i += 1
                key = self._name()
                d[key] = self.value()
        c = buf[self.i : self.i + 1]
        if c == b"<":
            self.i += 1
            return self._hex_string()
        if c == b"[":
            self.i += 1
            arr = []
            while True:
                self._ws()
                if buf.startswith(b"]", self.i):
                    self.i += 1
                    return arr
                arr.append(self.value())
        if c == b"/":
            self.i += 1
            return ("name", self._name())
        if c == b"(":
            self.i += 1
            return self._literal_string()
        m = re.compile(rb"[+-]?(\d+\.\d*|\.\d+|\d+)").match(buf, self.i)
        if m:
            self.i = m.end()
            tok = m.group(0)
            if b"." not in tok and not tok.startswith((b"+", b"-")):
                # possible indirect reference: <int> <int> R
                save = self.i
                m2 = re.compile(rb"[\x00\t\n\x0c\r ]+(\d+)[\x00\t\n\x0c\r ]+R(?![A-Za-z0-9])").match(
                    buf, self.i
                )
                if m2:
                    self.i = m2.end()
                    return ("ref", int(tok))
                self.i = save
            return float(tok) if b"." in tok else int(tok)
        for kw, v in ((b"true", True), (b"false", False), (b"null", None)):
            if buf.startswith(kw, self.i):
                self.i += len(kw)
                return v
        raise ValueError(
            f"unparseable PDF token at byte {self.i}:"
            f" {buf[self.i:self.i + 16]!r}"
        )


def _parse_xref(buf: bytes):
    """startxref -> classic xref table -> trailer dict. Returns
    (offsets: {num: offset}, trailer). Xref STREAMS (a digit where
    the 'xref' keyword belongs) and incremental updates (/Prev)
    refuse loudly."""
    tail = buf[-256:]
    m = re.search(rb"startxref[\x00\t\n\x0c\r ]+(\d+)", tail)
    if m is None or b"%%EOF" not in tail[m.end() :]:
        raise ValueError("missing startxref/%%EOF trailer")
    at = int(m.group(1))
    p = _Parser(buf, at)
    p._ws()
    if re.compile(rb"\d").match(buf, p.i):
        raise NotImplementedError(
            "PDF 1.5 cross-reference stream (classic xref tables only)"
        )
    p._expect(b"xref")
    offsets: dict[int, int] = {}
    while True:
        p._ws()
        if buf.startswith(b"trailer", p.i):
            p.i += len(b"trailer")
            break
        m = re.compile(rb"(\d+)[\x00\t\n\x0c\r ]+(\d+)").match(buf, p.i)
        if m is None:
            raise ValueError(f"malformed xref subsection at byte {p.i}")
        start, count = int(m.group(1)), int(m.group(2))
        p.i = m.end()
        p._ws()
        for k in range(count):
            ent = buf[p.i : p.i + 20]
            em = re.fullmatch(rb"(\d{10}) (\d{5}) ([nf])[\r ]?[\n\r]", ent)
            if em is None:
                raise ValueError(f"malformed xref entry {ent!r}")
            if em.group(3) == b"n":
                offsets[start + k] = int(em.group(1))
            p.i += 20
    trailer = p.value()
    if not isinstance(trailer, dict):
        raise ValueError("trailer is not a dictionary")
    if "Encrypt" in trailer:
        raise NotImplementedError(
            "encrypted PDF (standard security handler out of scope)"
        )
    if "Prev" in trailer:
        raise NotImplementedError(
            "incrementally updated PDF (single-revision files only)"
        )
    size = trailer.get("Size")
    want = max(offsets) + 1 if offsets else 1
    if size != want:
        raise ValueError(f"trailer /Size {size} != xref extent {want}")
    return offsets, trailer


def _load_object(buf: bytes, offsets: dict[int, int], num: int, cache: dict):
    """Object by number, offset VERIFIED, streams framed by /Length
    (possibly an indirect integer). Returns (value, stream_bytes)."""
    if num in cache:
        return cache[num]
    if num not in offsets:
        raise ValueError(f"object {num} not in xref table")
    p = _Parser(buf, offsets[num])
    m = re.compile(rb"(\d+)[\x00\t\n\x0c\r ]+(\d+)[\x00\t\n\x0c\r ]+obj").match(
        buf, p.i
    )
    if m is None or int(m.group(1)) != num:
        raise ValueError(
            f"xref offset for object {num} does not point at it"
        )
    p.i = m.end()
    val = p.value()
    stream = None
    p._ws()
    if buf.startswith(b"stream", p.i):
        p.i += len(b"stream")
        if buf.startswith(b"\r\n", p.i):
            p.i += 2
        elif buf.startswith(b"\n", p.i):
            p.i += 1
        else:
            raise ValueError("stream keyword not followed by EOL")
        length = val.get("Length") if isinstance(val, dict) else None
        if isinstance(length, tuple) and length[0] == "ref":
            length, _ = _load_object(buf, offsets, length[1], cache)
        if not isinstance(length, int):
            raise ValueError("stream without an integer /Length")
        stream = buf[p.i : p.i + length]
        if len(stream) != length:
            raise ValueError("stream data truncated")
        p.i += length
        p._expect(b"endstream")
    p._expect(b"endobj")
    cache[num] = (val, stream)
    return cache[num]


def _decode_stream(d: dict, raw: bytes) -> bytes:
    if "DecodeParms" in d or "DP" in d:
        raise NotImplementedError("stream predictors (/DecodeParms)")
    filt = d.get("Filter")
    if filt is None:
        return raw
    filters = filt if isinstance(filt, list) else [filt]
    data = raw
    for f in filters:
        if f == ("name", "FlateDecode"):
            try:
                data = zlib.decompress(data)
            except zlib.error as e:
                raise ValueError(f"corrupt FlateDecode stream: {e}") from e
        else:
            raise NotImplementedError(
                f"stream filter {f!r} (FlateDecode only)"
            )
    return data


# text-showing + harmless graphics-state operators; anything else in
# a content stream is outside the extractor's declared competence
_SHOW_OPS = {"Tj", "TJ", "'"}
_NEWLINE_OPS = {"Td", "TD", "T*", "Tm"}
_NOOP_OPS = {
    "BT", "ET", "Tf", "TL", "Tc", "Tw", "Tz", "Ts", "Tr",
    "q", "Q", "cm", "w", "re", "f", "S", "n", "g", "rg", "G", "RG", "gs",
}
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def extract_content_text(content: bytes) -> str:
    """Walk a content stream's operator sequence and rebuild the
    shown text: Tj/TJ/' append (TJ kerning numbers are positioning,
    not text), Td/TD/T*/Tm start a new line, ' is T*-then-show.
    Unknown operators raise — a silent skip is how extractors eat
    text."""
    p = _Parser(content)
    lines: list[str] = []
    cur: list[str] = []
    operands: list = []

    def newline() -> None:
        if cur:
            lines.append("".join(cur))
            cur.clear()

    while True:
        p._ws()
        if p.i >= len(content):
            break
        c = content[p.i : p.i + 1]
        if c in b"</[(+-.0123456789" or c == b"<":
            operands.append(p.value())
            continue
        m = _OP_RE.match(content, p.i)
        if m is None:
            raise ValueError(
                f"unparseable content token at byte {p.i}:"
                f" {content[p.i:p.i + 12]!r}"
            )
        op = m.group(0).decode("latin-1")
        p.i = m.end()
        if op in ("true", "false", "null"):
            operands.append(op == "true")
            continue
        if op in _SHOW_OPS:
            if op == "'":
                newline()
            arg = operands[-1] if operands else None
            if op == "TJ":
                if not isinstance(arg, list):
                    raise ValueError("TJ operand must be an array")
                for e in arg:
                    if isinstance(e, bytes):
                        cur.append(e.decode("latin-1"))
                    elif not isinstance(e, (int, float)):
                        raise ValueError(f"bad TJ element {e!r}")
            else:
                if not isinstance(arg, bytes):
                    raise ValueError(f"{op} operand must be a string")
                cur.append(arg.decode("latin-1"))
        elif op in _NEWLINE_OPS:
            newline()
        elif op not in _NOOP_OPS:
            raise ValueError(f"unsupported content operator {op!r}")
        operands.clear()
    newline()
    return "\n".join(lines)


def parse_pdf(payload: bytes) -> dict:
    """Full-file parse: header, xref, trailer, page tree walk,
    per-page content decode + text extraction. Returns
    {"version", "n_objects", "pages": [{"text", "compressed"}]}."""
    m = re.match(rb"%PDF-(\d\.\d)", payload)
    if m is None:
        raise ValueError("not a PDF file")
    version = m.group(1).decode("ascii")
    offsets, trailer = _parse_xref(payload)
    cache: dict = {}

    def deref(v):
        if isinstance(v, tuple) and v[0] == "ref":
            return _load_object(payload, offsets, v[1], cache)[0]
        return v

    root = deref(trailer.get("Root"))
    if not isinstance(root, dict) or root.get("Type") != ("name", "Catalog"):
        raise ValueError("trailer /Root is not a /Catalog")
    page_refs: list[int] = []

    def walk(node_ref) -> None:
        node = deref(node_ref)
        t = node.get("Type")
        if t == ("name", "Pages"):
            for kid in node.get("Kids", []):
                walk(kid)
        elif t == ("name", "Page"):
            page_refs.append(node_ref[1])
        else:
            raise ValueError(f"unexpected page-tree node type {t!r}")

    pages_node = deref(root.get("Pages"))
    declared = pages_node.get("Count")
    walk(root.get("Pages"))
    if declared != len(page_refs):
        raise ValueError(
            f"/Count {declared} != {len(page_refs)} pages found"
        )
    pages = []
    for ref_num in page_refs:
        page, _ = _load_object(payload, offsets, ref_num, cache)
        contents = page.get("Contents")
        refs = contents if isinstance(contents, list) else [contents]
        parts, compressed = [], False
        for r in refs:
            if not (isinstance(r, tuple) and r[0] == "ref"):
                raise ValueError("/Contents must be stream reference(s)")
            d, raw = _load_object(payload, offsets, r[1], cache)
            if raw is None:
                raise ValueError("/Contents object carries no stream")
            compressed = compressed or "Filter" in d
            parts.append(_decode_stream(d, raw))
        text = extract_content_text(b"\n".join(parts))
        pages.append({"text": text, "compressed": compressed})
    return {
        "version": version,
        "n_objects": len(offsets),
        "pages": pages,
    }
