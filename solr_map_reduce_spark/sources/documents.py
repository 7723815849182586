"""Builtin binary-document text extraction (SURVEY §2 B11 solrCell subset).

The reference's solrCell command parses PDF/Word/Excel/PowerPoint/RTF/…
through Tika (solrCellDocumentTypes.conf:178-230; corpus
morphlines-core/src/test/resources/test-documents/).  Tika is not in this
container, so these are from-scratch extractors for the PUBLIC formats,
written against their public specifications:

- PDF (ISO 32000 subset): FlateDecode content streams, text-showing
  operators (Tj/TJ/'/"), literal/hex string decoding, Info-dict metadata
  (Title/Author, incl. UTF-16BE values).  Limitations: CID/Type0 composite
  fonts decode without their CMap (garbage for CJK), encrypted PDFs and
  cross-reference streams are not handled — text objects in plain or
  Flate-compressed streams cover the reference corpus and the common case.
- OOXML (ECMA-376 zip+XML): DOCX paragraphs (``w:t`` runs), XLSX shared
  strings + inline strings, PPTX slide text (``a:t`` runs), core-properties
  title/creator.
- RTF (Word RTF spec subset): group-aware control-word stripping —
  ``\\par``/``\\line`` → newline, ``\\'hh`` cp1252 escapes, ``\\uN`` unicode
  escapes, destination groups (fonttbl/colortbl/pict/…) skipped.

All extractors are ``bytes -> DocumentContent`` pure functions; the Spark
side (``binary.extract_content``) calls them inside an Arrow-batched pandas
UDF — per-row, no shuffle, embarrassingly parallel at any scale.
"""

from __future__ import annotations

import io
import re
import struct
import zipfile
import zlib
from dataclasses import dataclass, field


@dataclass
class DocumentContent:
    text: str | None
    mime: str
    title: str | None = None
    metadata: dict[str, str] = field(default_factory=dict)


# ---------------------------------------------------------------------------
# PDF
# ---------------------------------------------------------------------------

_PDF_STREAM = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.S)
# one pass over a content stream, in order: literal-string shows, array
# shows, hex shows, and block/line breaks
_PDF_TEXT_OP = re.compile(
    rb"""(?P<lit>\((?:\\.|[^\\()])*\))\s*(?:Tj|'|")   # (string) Tj / ' / "
       | (?P<arr>\[(?:\\.|[^\]\\])*\])\s*TJ           # [(s) kern (s)] TJ
       | (?P<hex><[0-9A-Fa-f\s]*>)\s*(?:Tj|'|")      # <hex> Tj
       | (?P<brk>ET|T\*|TD|Td)                        # text-block / line ops
    """,
    re.X,
)
_PDF_LIT_IN_ARR = re.compile(rb"\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>")
_PDF_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _pdf_unescape(raw: bytes) -> bytes:
    """Decode a PDF literal string body (between the parens)."""
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1 : i + 2]
        if nxt and nxt in b"01234567":  # octal escape \[0-7]{1,3} — \8 \9 are NOT octal
            j = i + 1
            while j < len(raw) and j < i + 4 and raw[j : j + 1] in b"01234567":
                j += 1
            out.append(int(raw[i + 1 : j], 8) & 0xFF)
            i = j
        elif nxt in _PDF_ESCAPES:
            out += _PDF_ESCAPES[nxt]
            i += 2
        elif nxt in (b"\n", b"\r"):  # line continuation
            i += 2
        else:
            out += nxt
            i += 2
    return bytes(out)


def _pdf_string_to_text(b: bytes) -> str:
    if b.startswith(b"\xfe\xff"):
        return b[2:].decode("utf-16-be", "replace")
    return b.decode("latin-1", "replace")


def _pdf_hex_to_text(h: bytes) -> str:
    digits = re.sub(rb"\s", b"", h.strip(b"<>"))
    if len(digits) % 2:
        digits += b"0"
    return _pdf_string_to_text(bytes.fromhex(digits.decode("ascii")))


def _pdf_stream_text(stream: bytes) -> str:
    parts: list[str] = []
    for m in _PDF_TEXT_OP.finditer(stream):
        if m.group("lit") is not None:
            parts.append(_pdf_string_to_text(_pdf_unescape(m.group("lit")[1:-1])))
        elif m.group("arr") is not None:
            for s in _PDF_LIT_IN_ARR.findall(m.group("arr")):
                if s.startswith(b"("):
                    parts.append(_pdf_string_to_text(_pdf_unescape(s[1:-1])))
                else:
                    parts.append(_pdf_hex_to_text(s))
        elif m.group("hex") is not None:
            parts.append(_pdf_hex_to_text(m.group("hex")))
        else:  # text-block end / explicit line move
            if parts and not parts[-1].endswith("\n"):
                parts.append("\n")
    return "".join(parts)


_PDF_INFO_VAL = rb"(?:\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>)"


def _pdf_info(data: bytes) -> dict[str, str]:
    out: dict[str, str] = {}
    for key in (b"Title", b"Author", b"Creator", b"Producer", b"Subject"):
        m = re.search(rb"/" + key + rb"\s*(" + _PDF_INFO_VAL + rb")", data)
        if not m:
            continue
        v = m.group(1)
        text = (
            _pdf_string_to_text(_pdf_unescape(v[1:-1]))
            if v.startswith(b"(")
            else _pdf_hex_to_text(v)
        )
        if text:
            out[key.decode().lower()] = text
    return out


def pdf_extract(data: bytes) -> DocumentContent:
    """Text + Info metadata from a PDF (see module docstring for scope)."""
    texts: list[str] = []
    for m in _PDF_STREAM.finditer(data):
        dict_part = m.group(1)
        start = m.end()
        end = data.find(b"endstream", start)
        if end < 0:
            continue
        stream = data[start:end].rstrip(b"\r\n")
        if b"FlateDecode" in dict_part:
            try:
                # decompressobj tolerates trailing bytes (Length ambiguity)
                stream = zlib.decompressobj().decompress(stream)
            except zlib.error:
                continue
        if b"BT" in stream or b"Tj" in stream or b"TJ" in stream:
            t = _pdf_stream_text(stream)
            if t.strip():
                texts.append(t)
    meta = _pdf_info(data)
    return DocumentContent(
        text="\n".join(texts) if texts else None,
        mime="application/pdf",
        title=meta.get("title"),
        metadata=meta,
    )


# ---------------------------------------------------------------------------
# OOXML (docx / xlsx / pptx)
# ---------------------------------------------------------------------------

def _xml_unescape(s: str) -> str:
    from xml.sax.saxutils import unescape

    return unescape(s, {"&quot;": '"', "&apos;": "'"})


def _ooxml_core_props(zf: zipfile.ZipFile) -> dict[str, str]:
    out: dict[str, str] = {}
    try:
        core = zf.read("docProps/core.xml").decode("utf-8", "replace")
    except KeyError:
        return out
    for tag, key in (
        ("dc:title", "title"),
        ("dc:creator", "author"),
        ("dc:subject", "subject"),
    ):
        m = re.search(rf"<{tag}[^>]*>([^<]*)</{tag}>", core)
        if m and m.group(1):
            out[key] = _xml_unescape(m.group(1))
    return out


def _runs(xml: str, tag: str) -> list[str]:
    return [
        _xml_unescape(t)
        for t in re.findall(rf"<{tag}(?:\s[^>]*)?>([^<]*)</{tag}>", xml)
    ]


def docx_extract(data: bytes) -> DocumentContent:
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        xml = zf.read("word/document.xml").decode("utf-8", "replace")
        meta = _ooxml_core_props(zf)
    # explicit tab/line-break runs become whitespace BEFORE run extraction
    # (Tika parity): without this, "cell1<w:tab/>cell2" merges into
    # "cell1cell2" — adjacent words silently concatenate
    xml = re.sub(r"<w:tab(?:\s[^>]*)?/>", "<w:t>\t</w:t>", xml)
    xml = re.sub(r"<w:(?:br|cr)(?:\s[^>]*)?/>", "<w:t>\n</w:t>", xml)
    # paragraph boundaries -> newlines; runs within a paragraph concatenate
    paras = [
        "".join(_runs(p, "w:t")) for p in re.split(r"</w:p>", xml)
    ]
    text = "\n".join(p for p in paras if p)
    return DocumentContent(
        text=text or None,
        mime="application/vnd.openxmlformats-officedocument"
        ".wordprocessingml.document",
        title=meta.get("title"),
        metadata=meta,
    )


def xlsx_extract(data: bytes) -> DocumentContent:
    parts: list[str] = []
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        names = set(zf.namelist())
        if "xl/sharedStrings.xml" in names:
            parts += _runs(
                zf.read("xl/sharedStrings.xml").decode("utf-8", "replace"), "t"
            )
        for n in sorted(names):
            if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n):
                # inline strings (t inside is) — shared strings cover the rest
                sheet = zf.read(n).decode("utf-8", "replace")
                for m in re.finditer(r"<is>(.*?)</is>", sheet, re.S):
                    parts += _runs(m.group(1), "t")
        meta = _ooxml_core_props(zf)
    return DocumentContent(
        text="\n".join(p for p in parts if p) or None,
        mime="application/vnd.openxmlformats-officedocument"
        ".spreadsheetml.sheet",
        title=meta.get("title"),
        metadata=meta,
    )


def pptx_extract(data: bytes) -> DocumentContent:
    parts: list[str] = []
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        slides = sorted(
            n for n in zf.namelist()
            if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)
        )
        for n in slides:
            xml = zf.read(n).decode("utf-8", "replace")
            parts += [t for t in _runs(xml, "a:t") if t]
        meta = _ooxml_core_props(zf)
    return DocumentContent(
        text="\n".join(parts) or None,
        mime="application/vnd.openxmlformats-officedocument"
        ".presentationml.presentation",
        title=meta.get("title"),
        metadata=meta,
    )


_IWORK_ROOTS = {
    "sl:document": "application/vnd.apple.pages",
    "ls:document": "application/vnd.apple.numbers",
    "key:presentation": "application/vnd.apple.keynote",
}


def iwork_extract(data: bytes) -> DocumentContent | None:
    """Apple iWork '09: zip container with the document serialized as
    ``index.xml`` (optionally gzipped), typed by its root element
    (sl:document = Pages, ls:document = Numbers, key:presentation =
    Keynote — the Tika iWork parser gates on the same markers, so a
    generic archive that merely contains an index.xml falls through).
    Text lives in ``sf:p`` paragraphs; inline formatting tags are stripped
    per paragraph (corpus fixture
    mlt/resources/test-documents/testPages.pages)."""
    import gzip as _gzip

    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        names = set(zf.namelist())
        entry = "index.xml.gz" if "index.xml.gz" in names else "index.xml"
        raw = zf.read(entry)
    if raw[:2] == b"\x1f\x8b":
        raw = _gzip.decompress(raw)
    xml = raw.decode("utf-8", "replace")
    root = re.search(r"<\s*([a-z]+:[a-zA-Z-]+)[\s>]", xml)
    mime = _IWORK_ROOTS.get(root.group(1)) if root else None
    if mime is None:
        return None  # not an iWork document — plain zip fall-through
    paras = []
    for m in re.finditer(r"<sf:p(?:\s[^>]*)?>(.*?)</sf:p>", xml, re.S):
        t = _xml_unescape(re.sub(r"<[^>]+>", "", m.group(1))).strip()
        if t:
            paras.append(t)
    return DocumentContent(text="\n".join(paras) or None, mime=mime)


_OOXML_KINDS = (
    ("word/document.xml", docx_extract),
    ("xl/workbook.xml", xlsx_extract),
    ("ppt/presentation.xml", pptx_extract),
)


def ooxml_extract(data: bytes) -> DocumentContent | None:
    """Dispatch a zip payload to the OOXML extractor matching its layout;
    None for plain (non-OOXML) archives."""
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            names = set(zf.namelist())
    except zipfile.BadZipFile:
        return None
    for marker, fn in _OOXML_KINDS:
        if marker in names:
            return fn(data)
    if "index.xml" in names or "index.xml.gz" in names:
        return iwork_extract(data)
    return None


# ---------------------------------------------------------------------------
# RTF
# ---------------------------------------------------------------------------

# destination groups whose content is data, not document text
_RTF_SKIP = {
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "themedata", "colorschememapping", "latentstyles",
    "datastore", "generator", "xmlnstbl", "listtable", "listoverridetable",
    "rsidtbl", "mmathPr", "wgrffmtfilter", "panose",
}
_RTF_CW = re.compile(r"\\([a-zA-Z]+)(-?\d+)? ?|\\'([0-9a-fA-F]{2})|\\([^a-zA-Z])")


def rtf_extract(data: bytes) -> DocumentContent:
    s = data.decode("latin-1", "replace")
    out: list[str] = []
    skip_depth: int | None = None
    depth = 0
    i = 0
    uc_skip = 1  # \ucN: bytes to skip after a \uN escape
    n = len(s)
    while i < n:
        c = s[i]
        if c == "{":
            depth += 1
            i += 1
            continue
        if c == "}":
            depth -= 1
            if skip_depth is not None and depth < skip_depth:
                skip_depth = None
            i += 1
            continue
        if c == "\\":
            m = _RTF_CW.match(s, i)
            if not m:
                i += 1
                continue
            i = m.end()
            if m.group(1) == "bin" and m.group(2) is not None:
                # \binN: N bytes of RAW binary follow — unescaped, so a
                # 0x7D byte inside would otherwise close the enclosing
                # group and corrupt skip tracking for the rest of the
                # file (latin-1 decode is 1 char per byte, so a char
                # skip IS a byte skip).  Must run even inside a skipped
                # destination (\bin lives in \pict, which IS skipped).
                i += max(int(m.group(2)), 0)
                continue
            if skip_depth is not None:
                continue
            word, num, hexv, sym = m.group(1), m.group(2), m.group(3), m.group(4)
            if hexv is not None:
                out.append(bytes([int(hexv, 16)]).decode("cp1252", "replace"))
            elif sym is not None:
                if sym == "*":
                    # \* marks an unknown destination — skip its group
                    skip_depth = depth
                elif sym in "{}\\":
                    out.append(sym)
                elif sym == "~":
                    out.append("\u00a0")
            elif word in ("par", "line", "sect", "page", "row"):
                out.append("\n")
            elif word in ("tab", "cell"):
                out.append("\t")
            elif word == "uc" and num is not None:
                uc_skip = int(num)
            elif word == "u" and num is not None:
                cp = int(num)
                out.append(chr(cp + 65536 if cp < 0 else cp))
                # consume the fallback character(s)
                skipped = 0
                while skipped < uc_skip and i < n:
                    if s[i] == "\\" and i + 3 < n and s[i + 1] == "'":
                        i += 4
                    else:
                        i += 1
                    skipped += 1
            elif word in _RTF_SKIP:
                skip_depth = depth
            continue
        if skip_depth is None and c not in "\r\n":
            out.append(c)
        i += 1
    text = re.sub(r"\n{3,}", "\n\n", "".join(out)).strip()
    # \uN-escaped non-BMP chars arrive as surrogate pairs — recombine here
    # so direct callers (not just the dispatcher) get valid UTF-8
    return DocumentContent(text=_fix_surrogates(text) or None, mime="application/rtf")


# ---------------------------------------------------------------------------
# Legacy Office (CFB/OLE2): .doc / .xls / .ppt / .msg — public MS-* specs
# ---------------------------------------------------------------------------

def _doc_extract_text(cfb) -> str | None:
    """MS-DOC: piece-table text extraction from the WordDocument stream.

    FIB → fcClx/lcbClx (FibRgFcLcb97 fixed offsets 0x01A2/0x01A6) → Clx in
    the 0Table/1Table stream (selected by FIB flag bit fWhichTblStm) →
    PlcPcd pieces; each PCD's fc bit 0x40000000 selects cp1252-at-fc/2 vs
    UTF-16LE-at-fc (MS-DOC §2.4.1 "Retrieving Text")."""
    word = cfb.open_stream("WordDocument")
    if len(word) < 0x01AA or struct.unpack_from("<H", word, 0)[0] != 0xA5EC:
        return None
    (flags,) = struct.unpack_from("<H", word, 0x000A)
    table_name = "1Table" if flags & 0x0200 else "0Table"
    if not cfb.has_stream(table_name):
        return None
    table = cfb.open_stream(table_name)
    (fc_clx,) = struct.unpack_from("<I", word, 0x01A2)
    (lcb_clx,) = struct.unpack_from("<I", word, 0x01A6)
    clx = table[fc_clx : fc_clx + lcb_clx]
    # walk Clx: Prc blocks (0x01 + int16 size) precede the Pcdt (0x02)
    i = 0
    plc = b""
    while i < len(clx):
        if clx[i] == 0x01:
            (sz,) = struct.unpack_from("<h", clx, i + 1)
            i += 3 + sz
        elif clx[i] == 0x02:
            (lcb,) = struct.unpack_from("<I", clx, i + 1)
            plc = clx[i + 5 : i + 5 + lcb]
            break
        else:
            return None
    if not plc:
        return None
    n = (len(plc) - 4) // 12
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    parts: list[str] = []
    for k in range(n):
        (fc_raw,) = struct.unpack_from("<I", plc, 4 * (n + 1) + 8 * k + 2)
        n_chars = cps[k + 1] - cps[k]
        fc = fc_raw & 0x3FFFFFFF
        if fc_raw & 0x40000000:
            chunk = word[fc // 2 : fc // 2 + n_chars]
            parts.append(chunk.decode("cp1252", "replace"))
        else:
            chunk = word[fc : fc + 2 * n_chars]
            parts.append(chunk.decode("utf-16-le", "replace"))
    text = "".join(parts)
    # Word control chars: CR = paragraph, 0x07 = cell/row mark, others drop
    text = text.replace("\r", "\n").replace("\x07", "\t")
    text = re.sub(r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "", text)
    return _fix_surrogates(text.strip()) or None


def _xls_sst_strings(book: bytes) -> list[str]:
    """BIFF8 SST shared strings (MS-XLS §2.4.265), CONTINUE-record aware."""
    # first stitch the SST record with its CONTINUEs into one buffer,
    # remembering where each continue boundary is (a string may restart
    # its compression flag at a boundary)
    i = 0
    segs: list[bytes] = []
    while i + 4 <= len(book):
        rec, ln = struct.unpack_from("<HH", book, i)
        body = book[i + 4 : i + 4 + ln]
        if rec == 0x00FC:  # SST
            segs = [body]
            j = i + 4 + ln
            while j + 4 <= len(book):
                r2, l2 = struct.unpack_from("<HH", book, j)
                if r2 != 0x003C:  # CONTINUE
                    break
                segs.append(book[j + 4 : j + 4 + l2])
                j += 4 + l2
            break
        i += 4 + ln
    if not segs:
        return []
    out: list[str] = []
    seg_idx, pos = 0, 8  # skip cstTotal/cstUnique
    def read(nbytes: int) -> bytes:
        nonlocal seg_idx, pos
        buf = bytearray()
        while nbytes > 0 and seg_idx < len(segs):
            avail = len(segs[seg_idx]) - pos
            take = min(avail, nbytes)
            buf += segs[seg_idx][pos : pos + take]
            pos += take
            nbytes -= take
            if pos >= len(segs[seg_idx]):
                seg_idx += 1
                pos = 0
        return bytes(buf)

    while True:
        hdr = read(3)
        if len(hdr) < 3:
            break
        cch, flags = struct.unpack("<HB", hdr)
        rich = flags & 0x08
        ext = flags & 0x04
        c_run = struct.unpack("<H", read(2))[0] if rich else 0
        cb_ext = struct.unpack("<i", read(4))[0] if ext else 0
        # character data may switch width at a CONTINUE boundary; read
        # char-by-char segment-aware
        chars: list[str] = []
        wide = bool(flags & 0x01)
        remaining = cch
        while remaining > 0:
            if seg_idx < len(segs) and pos == 0:
                # crossed into a CONTINUE: first byte is a fresh width
                # flag (MS-XLS §2.5.293 — repeated at the start of EVERY
                # CONTINUE that splits character data, including when the
                # string header exactly filled the previous segment, i.e.
                # before any char of this string was read)
                flag_byte = read(1)
                if not flag_byte:
                    break
                wide = bool(flag_byte[0] & 0x01)
            if seg_idx >= len(segs):
                break
            avail_bytes = len(segs[seg_idx]) - pos
            unit = 2 if wide else 1
            take_chars = min(remaining, avail_bytes // unit)
            if take_chars == 0:
                seg_idx += 1
                pos = 0
                continue
            raw = read(take_chars * unit)
            chars.append(
                raw.decode("utf-16-le" if wide else "cp1252", "replace")
            )
            remaining -= take_chars
        read(4 * c_run + max(cb_ext, 0))
        out.append("".join(chars))
        if len(out) > 100_000:
            break
    return out


def xls_extract(data: bytes) -> DocumentContent:
    from solr_map_reduce_spark.sources.cfb import CfbFile

    cfb = CfbFile(data)
    name = "Workbook" if cfb.has_stream("Workbook") else "Book"
    strings = _xls_sst_strings(cfb.open_stream(name))
    return DocumentContent(
        text="\n".join(s for s in strings if s.strip()) or None,
        mime="application/vnd.ms-excel",
    )


def ppt_extract(data: bytes) -> DocumentContent:
    """MS-PPT: TextCharsAtom (0x0FA0, UTF-16LE) + TextBytesAtom (0x0FA8,
    cp1252) records in the PowerPoint Document stream."""
    from solr_map_reduce_spark.sources.cfb import CfbFile

    cfb = CfbFile(data)
    stream = cfb.open_stream("PowerPoint Document")
    parts: list[str] = []

    def walk(buf: bytes) -> None:
        i = 0
        while i + 8 <= len(buf):
            ver_inst, rtype, rlen = struct.unpack_from("<HHI", buf, i)
            body = buf[i + 8 : i + 8 + rlen]
            if (ver_inst & 0x000F) == 0x000F:  # container: descend
                walk(body)
            elif rtype == 0x0FA0:
                parts.append(body.decode("utf-16-le", "replace"))
            elif rtype == 0x0FA8:
                parts.append(body.decode("cp1252", "replace"))
            i += 8 + rlen

    walk(stream)
    text = "\n".join(
        re.sub(r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "", p.replace("\r", "\n")).strip()
        for p in parts if p.strip()
    )
    return DocumentContent(
        text=_fix_surrogates(text) or None,
        mime="application/vnd.ms-powerpoint",
    )


_MSG_PROPS = (  # (property id, field) — MS-OXPROPS canonical tags
    ("0037", "subject"),
    ("0C1A", "from"),
    ("0E04", "to"),
    ("1000", "body"),
)


def msg_extract(data: bytes) -> DocumentContent:
    """MS-OXMSG: property streams ``__substg1.0_<tag><type>`` (001F =
    UTF-16LE, 001E = ANSI)."""
    from solr_map_reduce_spark.sources.cfb import CfbFile

    cfb = CfbFile(data)
    names = set(cfb.stream_names())
    meta: dict[str, str] = {}
    for tag, field_name in _MSG_PROPS:
        for suffix, enc in (("001F", "utf-16-le"), ("001E", "cp1252")):
            sname = f"__substg1.0_{tag}{suffix}"
            if sname in names:
                val = cfb.open_stream(sname).decode(enc, "replace").strip("\x00")
                if val:
                    meta[field_name] = _fix_surrogates(val)
                break
    lines = [f"{k.title()}: {meta[k]}" for k in ("from", "to", "subject") if k in meta]
    body = meta.get("body", "")
    text = "\n".join(lines) + ("\n\n" + body if body else "")
    return DocumentContent(
        text=text.strip() or None,
        mime="application/vnd.ms-outlook",
        title=meta.get("subject"),
        metadata={k: v for k, v in meta.items() if k != "body"},
    )


def doc_extract(data: bytes) -> DocumentContent:
    from solr_map_reduce_spark.sources.cfb import CfbFile

    cfb = CfbFile(data)
    return DocumentContent(
        text=_doc_extract_text(cfb), mime="application/msword"
    )


def cfb_extract(data: bytes) -> DocumentContent | None:
    """Dispatch a CFB payload by its characteristic stream names."""
    from solr_map_reduce_spark.sources.cfb import CfbFile

    try:
        cfb = CfbFile(data)
    except Exception:
        return None
    names = set(cfb.stream_names())
    try:
        if "WordDocument" in names:
            return doc_extract(data)
        if "Workbook" in names or "Book" in names:
            return xls_extract(data)
        if "PowerPoint Document" in names:
            return ppt_extract(data)
        if any(n.startswith("__substg1.0_") for n in names):
            return msg_extract(data)
    except Exception:
        pass
    # remaining CFB payloads typed by their characteristic stream (Tika
    # detector parity for the corpus's Visio fixture); no text decode
    if "VisioDocument" in names:
        return DocumentContent(text=None, mime="application/vnd.visio")
    return DocumentContent(text=None, mime="application/x-ole-storage")


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def _fix_surrogates(s: str | None) -> str | None:
    """Recombine surrogate pairs (RTF encodes non-BMP chars as two ``\\uN``
    escapes) and replace stray lone surrogates — Arrow/UTF-8 rejects them."""
    if s is None:
        return None
    try:
        s.encode("utf-8")
        return s
    except UnicodeEncodeError:
        pass
    try:
        return s.encode("utf-16", "surrogatepass").decode("utf-16")
    except UnicodeDecodeError:
        return "".join(
            "�" if 0xD800 <= ord(c) <= 0xDFFF else c for c in s
        )


def extract_document(data: bytes) -> DocumentContent | None:
    """Magic-dispatch to the matching builtin extractor; None when no
    binary-document format matches (caller falls through to text paths)."""
    if data.startswith(b"%PDF"):
        doc = pdf_extract(data)
    elif data.startswith(b"{\\rtf"):
        doc = rtf_extract(data)
    elif data.startswith(b"PK\x03\x04"):
        doc = ooxml_extract(data)
    elif data.startswith(bytes.fromhex("d0cf11e0a1b11ae1")):
        doc = cfb_extract(data)
    elif data.startswith(b"ID3") or (
        len(data) >= 128 and data[-128:-125] == b"TAG"
    ):
        doc = mp3_extract(data)
    elif data.startswith(b"fLaC"):
        doc = flac_extract(data)
    elif data.startswith(b"FORM") and data[8:12] in (b"AIFF", b"AIFC"):
        doc = aiff_extract(data)
    elif data[:4] in (b"II*\x00", b"MM\x00*"):
        doc = tiff_extract(data)
    elif data.startswith(b"8BPS"):
        doc = psd_extract(data)
    elif len(data) >= 12 and data[4:8] == b"ftyp":
        doc = mp4_extract(data)
    elif data.startswith(b"FLV\x01"):
        doc = flv_extract(data)
    elif data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        doc = wav_extract(data)
    elif data.startswith(b"Obj\x01"):
        doc = avro_extract(data)
    else:
        doc = image_extract(data)  # PNG/JPEG/GIF/BMP/netpbm headers
        if doc is None:
            return None
    if doc is not None:
        doc.text = _fix_surrogates(doc.text)
        doc.title = _fix_surrogates(doc.title)
        doc.metadata = {k: _fix_surrogates(v) for k, v in doc.metadata.items()}
    return doc


# ---------------------------------------------------------------------------
# media metadata (the Tika audio/image/video metadata slice: typed mime +
# header-derived metadata, no payload decode — solrCellDocumentTypes.conf
# routes these through Tika parsers whose output the reference maps to
# fields; here the public format specs are decoded directly)
# ---------------------------------------------------------------------------

_ID3_ENCODINGS = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}
_ID3_FIELDS = {
    "TIT2": "title", "TPE1": "artist", "TALB": "album", "TCON": "genre",
    "TYER": "year", "TDRC": "year", "COMM": "comment",
    # ID3v2.2 three-letter ids
    "TT2": "title", "TP1": "artist", "TAL": "album",
}


def _syncsafe(b: bytes) -> int:
    n = 0
    for x in b:
        n = (n << 7) | (x & 0x7F)
    return n


def mp3_extract(data: bytes) -> DocumentContent:
    """MP3: ID3v2 text frames (ID3v2.2/2.3/2.4 per id3.org) with an ID3v1
    trailer fallback.  Emits title/artist/album/... metadata; no audio
    decode."""
    meta: dict[str, str] = {}
    if data.startswith(b"ID3") and len(data) >= 10:
        ver = data[3]
        size = _syncsafe(data[6:10])
        pos, end = 10, min(10 + size, len(data))
        id_len, sz_len = (3, 3) if ver == 2 else (4, 4)
        while pos + id_len + sz_len <= end:
            fid = data[pos : pos + id_len].decode("latin-1", "replace")
            if not fid.strip("\x00").strip():
                break
            if ver == 2:
                fsz = int.from_bytes(data[pos + 3 : pos + 6], "big")
                hdr = 6
            else:
                raw_sz = data[pos + 4 : pos + 8]
                fsz = _syncsafe(raw_sz) if ver >= 4 else int.from_bytes(raw_sz, "big")
                hdr = 10
            frame = data[pos + hdr : pos + hdr + fsz]
            pos += hdr + fsz
            key = _ID3_FIELDS.get(fid)
            if key and frame:
                enc = _ID3_ENCODINGS.get(frame[0], "latin-1")
                body = frame[1:]
                if fid.startswith("COM"):
                    # COMM: 3-byte language + description + terminator + text
                    body = body[3:]
                    if "16" in enc:
                        # 16-bit terminator must sit on a code-unit boundary
                        cut = next(
                            (
                                i
                                for i in range(0, len(body) - 1, 2)
                                if body[i : i + 2] == b"\x00\x00"
                            ),
                            -1,
                        )
                        if cut >= 0:
                            body = body[cut + 2 :]
                    else:
                        cut = body.find(b"\x00")
                        if cut >= 0:
                            body = body[cut + 1 :]
                try:
                    val = body.decode(enc, "replace").strip("\x00").strip()
                except Exception:
                    val = ""
                if val and key not in meta:
                    meta[key] = val
    if not meta and len(data) >= 128 and data[-128:-125] == b"TAG":
        tag = data[-128:]
        for key, lo, hi in (("title", 3, 33), ("artist", 33, 63), ("album", 63, 93)):
            val = tag[lo:hi].decode("latin-1", "replace").rstrip("\x00 ").strip()
            if val:
                meta[key] = val
    title = meta.get("title")
    return DocumentContent(None, "audio/mpeg", title=title, metadata=meta)


def flac_extract(data: bytes) -> DocumentContent:
    """FLAC: STREAMINFO (sample rate / channels / bits / total samples) and
    VORBIS_COMMENT tags, per the FLAC format spec."""
    meta: dict[str, str] = {}
    title = None
    pos = 4
    while pos + 4 <= len(data):
        hdr = data[pos]
        btype, last = hdr & 0x7F, bool(hdr & 0x80)
        blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + blen]
        if btype == 0 and len(body) >= 18:  # STREAMINFO
            sr = (int.from_bytes(body[10:13], "big") >> 4) & 0xFFFFF
            channels = ((body[12] >> 1) & 0x07) + 1
            bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
            total = int.from_bytes(body[13:18], "big") & ((1 << 36) - 1)
            meta["sample_rate"] = str(sr)
            meta["channels"] = str(channels)
            meta["bits_per_sample"] = str(bps)
            if sr:
                meta["duration_s"] = f"{total / sr:.3f}"
        elif btype == 4 and len(body) >= 8:  # VORBIS_COMMENT
            vlen = int.from_bytes(body[0:4], "little")
            p = 4 + vlen
            if p + 4 <= len(body):
                n = int.from_bytes(body[p : p + 4], "little")
                p += 4
                for _ in range(n):
                    if p + 4 > len(body):
                        break
                    clen = int.from_bytes(body[p : p + 4], "little")
                    p += 4
                    item = body[p : p + clen].decode("utf-8", "replace")
                    p += clen
                    if "=" in item:
                        k, v = item.split("=", 1)
                        meta.setdefault(k.lower(), v)
        pos += 4 + blen
        if last:
            break
    title = meta.get("title")
    return DocumentContent(None, "audio/x-flac", title=title, metadata=meta)


def aiff_extract(data: bytes) -> DocumentContent:
    """AIFF: COMM chunk — channels, frame count, sample size, and the
    80-bit extended-float sample rate (IEEE 754 extended, per AIFF-1.3)."""
    meta: dict[str, str] = {}
    pos = 12  # FORM + size + AIFF
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        clen = int.from_bytes(data[pos + 4 : pos + 8], "big")
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"COMM" and len(body) >= 18:
            channels = int.from_bytes(body[0:2], "big")
            frames = int.from_bytes(body[2:6], "big")
            bits = int.from_bytes(body[6:8], "big")
            exp = int.from_bytes(body[8:10], "big") & 0x7FFF
            mant = int.from_bytes(body[10:18], "big")
            # clamp the garbage-exponent case (extended-float range far
            # exceeds IEEE double) rather than overflow
            rate = (
                mant * 2.0 ** (exp - 16383 - 63)
                if mant and -1000 < exp - 16383 < 1000
                else 0.0
            )
            meta["channels"] = str(channels)
            meta["bits_per_sample"] = str(bits)
            meta["sample_rate"] = str(int(round(rate)))
            if rate:
                meta["duration_s"] = f"{frames / rate:.3f}"
            break
        pos += 8 + clen + (clen & 1)
    return DocumentContent(None, "audio/x-aiff", metadata=meta)


# TIFF 6.0 value-type byte widths (type id -> element size)
_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}
# IFD tags surfaced as named metadata (TIFF 6.0 / EXIF 2.3 baseline set)
_IFD_TAGS = {
    256: "width", 257: "height", 271: "make", 272: "model",
    274: "orientation", 305: "software", 306: "datetime",
    315: "artist", 33432: "copyright",
}


def _tiff_ifd(data: bytes, off: int, bo: str) -> dict[int, str]:
    """Decode one TIFF IFD into tag -> stringified value (ASCII, SHORT,
    LONG, RATIONAL); values longer than 4 bytes follow their offset pointer.
    Shared by the TIFF extractor and the JPEG APP1/EXIF reader."""
    out: dict[int, str] = {}
    if off < 0 or off + 2 > len(data):
        return out
    n = int.from_bytes(data[off : off + 2], bo)
    for i in range(n):
        e = off + 2 + i * 12
        if e + 12 > len(data):
            break
        tag = int.from_bytes(data[e : e + 2], bo)
        typ = int.from_bytes(data[e + 2 : e + 4], bo)
        cnt = int.from_bytes(data[e + 4 : e + 8], bo)
        size = _TIFF_TYPE_SIZE.get(typ, 0) * cnt
        if size == 0:
            continue
        if size <= 4:
            raw = data[e + 8 : e + 8 + size]
        else:
            voff = int.from_bytes(data[e + 8 : e + 12], bo)
            raw = data[voff : voff + size]
        if len(raw) < size:
            continue
        if typ == 2:  # ASCII, NUL-terminated
            out[tag] = raw.split(b"\x00")[0].decode("ascii", "replace").strip()
        elif typ == 3:
            out[tag] = str(int.from_bytes(raw[:2], bo))
        elif typ == 4:
            out[tag] = str(int.from_bytes(raw[:4], bo))
        elif typ == 5:
            num = int.from_bytes(raw[:4], bo)
            den = int.from_bytes(raw[4:8], bo)
            out[tag] = str(num) if den == 1 else f"{num}/{den}"
    return out


def _named_ifd_meta(entries: dict[int, str]) -> dict[str, str]:
    return {name: entries[tag] for tag, name in _IFD_TAGS.items() if tag in entries}


def tiff_extract(data: bytes) -> DocumentContent:
    """TIFF: first-IFD baseline tags (ImageWidth/Length 256/257 plus the
    named EXIF-adjacent ASCII tags), both byte orders (TIFF 6.0 spec)."""
    bo = "little" if data[:2] == b"II" else "big"
    off = int.from_bytes(data[4:8], bo)
    meta = _named_ifd_meta(_tiff_ifd(data, off, bo))
    return DocumentContent(None, "image/tiff", metadata=meta)


def _jpeg_exif(data: bytes) -> dict[str, str]:
    """EXIF IFD0 tags from a JPEG APP1 segment (``Exif\\0\\0`` + embedded
    TIFF blob — EXIF 2.3 §4.5.2); empty when the image carries no EXIF."""
    i = 2
    while i + 4 < len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seglen = int.from_bytes(data[i + 2 : i + 4], "big")
        if marker == 0xE1 and data[i + 4 : i + 10] == b"Exif\x00\x00":
            tiff = data[i + 10 : i + 2 + seglen]
            if tiff[:2] in (b"II", b"MM") and len(tiff) >= 8:
                bo = "little" if tiff[:2] == b"II" else "big"
                off = int.from_bytes(tiff[4:8], bo)
                return _named_ifd_meta(_tiff_ifd(tiff, off, bo))
            return {}
        if marker == 0xDA:  # start of scan: no EXIF ahead
            break
        i += 2 + seglen
    return {}


_IMAGE_MIMES = {
    "PNG": "image/png", "JPEG": "image/jpeg", "GIF": "image/gif",
    "BMP": "image/bmp", "PBM": "image/x-portable-bitmap",
    "PGM": "image/x-portable-graymap", "PPM": "image/x-portable-pixmap",
}


def image_extract(data: bytes) -> DocumentContent | None:
    """PNG/JPEG/GIF/BMP/netpbm: typed mime + width/height from the container
    header (the shared parser of the multimodal decode tier); JPEG
    additionally surfaces EXIF IFD0 tags via the TIFF walker.  None when the
    payload is not a recognized raster image."""
    from solr_map_reduce_spark.extensions.multimodal import _builtin_image_meta

    parsed = _builtin_image_meta(data)
    if parsed is None:
        return None
    w, h, _mode, fmt = parsed
    meta = {"width": str(w), "height": str(h)}
    if fmt == "JPEG":
        try:
            meta.update(_jpeg_exif(data))
        except Exception:
            pass
    return DocumentContent(None, _IMAGE_MIMES[fmt], metadata=meta)


def wav_extract(data: bytes) -> DocumentContent:
    """WAV/RIFF: fmt-chunk metadata (sample rate, channels, duration, PCM
    codec) via the multimodal tier's stdlib ``wave`` parser."""
    from solr_map_reduce_spark.extensions.multimodal import _builtin_audio_meta

    meta: dict[str, str] = {}
    parsed = _builtin_audio_meta(data)
    if parsed is not None:
        rate, channels, duration, codec = parsed
        meta = {
            "sample_rate": str(rate), "channels": str(channels),
            "duration_s": str(duration), "codec": codec,
        }
    return DocumentContent(None, "audio/x-wav", metadata=meta)


def avro_extract(data: bytes) -> DocumentContent:
    """Avro object container: typed + writer-schema name and codec read from
    the container header (sources/avro_fallback.parse_header) — the payload
    itself is decoded by ``read_avro``/B5, not the solrCell path."""
    from solr_map_reduce_spark.sources.avro_fallback import parse_header

    meta: dict[str, str] = {}
    try:
        schema, codec, _sync, _pos = parse_header(data)
        if isinstance(schema, dict) and schema.get("name"):
            meta["schema_name"] = str(schema["name"])
        meta["codec"] = codec
    except Exception:
        pass
    return DocumentContent(None, "application/avro", metadata=meta)


def psd_extract(data: bytes) -> DocumentContent:
    """PSD header: channels / height / width / depth / color mode."""
    meta: dict[str, str] = {}
    if len(data) >= 26:
        meta["channels"] = str(int.from_bytes(data[12:14], "big"))
        meta["height"] = str(int.from_bytes(data[14:18], "big"))
        meta["width"] = str(int.from_bytes(data[18:22], "big"))
        meta["bits_per_channel"] = str(int.from_bytes(data[22:24], "big"))
    return DocumentContent(None, "image/vnd.adobe.photoshop", metadata=meta)


def mp4_extract(data: bytes) -> DocumentContent:
    """MP4/M4A: ftyp major brand + mvhd duration/timescale via a bounded
    ISO-BMFF box walk (containers: moov/trak/mdia descended)."""
    meta: dict[str, str] = {}

    def walk(lo: int, hi: int, depth: int) -> None:
        pos = lo
        while pos + 8 <= hi and depth < 6:
            size = int.from_bytes(data[pos : pos + 4], "big")
            btype = data[pos + 4 : pos + 8]
            hdr = 8
            if size == 1:  # largesize form: 16-byte header, payload at +16
                size = int.from_bytes(data[pos + 8 : pos + 16], "big")
                hdr = 16
            if size < hdr:
                break
            body = pos + hdr
            if btype == b"ftyp":
                meta["brand"] = data[body : body + 4].decode("latin-1", "replace").strip()
            elif btype == b"mvhd":
                v = data[body] if body < len(data) else 0
                if v == 1:
                    ts = int.from_bytes(data[body + 20 : body + 24], "big")
                    dur = int.from_bytes(data[body + 24 : body + 32], "big")
                else:
                    ts = int.from_bytes(data[body + 12 : body + 16], "big")
                    dur = int.from_bytes(data[body + 16 : body + 20], "big")
                if ts:
                    meta["duration_s"] = f"{dur / ts:.3f}"
            elif btype in (b"moov", b"trak", b"mdia"):
                walk(body, min(pos + size, hi), depth + 1)
            pos += size

    walk(0, len(data), 0)
    brand = meta.get("brand", "")
    mime = "audio/mp4" if brand.startswith("M4A") else "video/mp4"
    return DocumentContent(None, mime, metadata=meta)


def flv_extract(data: bytes) -> DocumentContent:
    """FLV header: version + audio/video presence flags."""
    meta: dict[str, str] = {}
    if len(data) >= 5:
        meta["version"] = str(data[3])
        meta["has_audio"] = str(bool(data[4] & 0x04)).lower()
        meta["has_video"] = str(bool(data[4] & 0x01)).lower()
    return DocumentContent(None, "video/x-flv", metadata=meta)
