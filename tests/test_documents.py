"""Unit tests for the builtin document extractors (sources/documents.py):
format-spec edge cases on synthetic inputs — the reference-corpus golden
tests live in test_binary_sources.py."""

import io
import struct
import zipfile
import zlib

import pytest

from solr_map_reduce_spark.sources.documents import (
    DocumentContent,
    _fix_surrogates,
    _pdf_unescape,
    extract_document,
    pdf_extract,
    rtf_extract,
)


def _mini_pdf(content_ops: bytes, compress: bool = True, info: bytes = b"") -> bytes:
    body = zlib.compress(content_ops) if compress else content_ops
    filt = b"/Filter /FlateDecode " if compress else b""
    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< " + filt + b"/Length " + str(len(body)).encode() + b" >>\n"
        b"stream\n" + body + b"\nendstream\nendobj\n" + info + b"\n%%EOF"
    )


class TestPdf:
    def test_tj_and_array_tj(self):
        ops = b"BT (Hello) Tj [(Wo) -10 (rld)] TJ ET"
        doc = pdf_extract(_mini_pdf(ops))
        assert doc.text.strip() == "HelloWorld"

    def test_uncompressed_stream(self):
        doc = pdf_extract(_mini_pdf(b"BT (plain) Tj ET", compress=False))
        assert doc.text.strip() == "plain"

    def test_literal_escapes(self):
        assert _pdf_unescape(rb"a\(b\)c\\d\n\101") == b"a(b)c\\d\nA"

    def test_hex_string_show(self):
        ops = b"BT <48 69> Tj ET"  # "Hi" with embedded whitespace
        assert pdf_extract(_mini_pdf(ops)).text.strip() == "Hi"

    def test_info_dict_utf16_title(self):
        # UTF-16BE with BOM via octal escapes, as PDF producers emit
        info = b"2 0 obj\n<< /Title (\\376\\377\\000H\\000i) >>\nendobj"
        doc = pdf_extract(_mini_pdf(b"BT (x) Tj ET", info=info))
        assert doc.title == "Hi"

    def test_line_break_on_et(self):
        ops = b"BT (line1) Tj ET BT (line2) Tj ET"
        assert pdf_extract(_mini_pdf(ops)).text.splitlines()[:2] == ["line1", "line2"]

    def test_truncated_pdf_no_crash(self):
        assert pdf_extract(_mini_pdf(b"BT (ok) Tj ET")[:40]).text is None


class TestRtf:
    def test_basic_par_and_escapes(self):
        doc = rtf_extract(rb"{\rtf1 Hello\par World \'e9 \{x\}}")
        assert "Hello" in doc.text and "World" in doc.text
        assert "é" in doc.text and "{x}" in doc.text

    def test_destination_groups_skipped(self):
        doc = rtf_extract(
            rb"{\rtf1{\fonttbl{\f0 Arial;}}{\*\generator Acme 1.0;}Visible}"
        )
        assert doc.text == "Visible"
        assert "Arial" not in doc.text and "Acme" not in doc.text

    def test_unicode_escape_with_fallback(self):
        doc = rtf_extract(rb"{\rtf1 \u8364 ? euro}")
        assert doc.text.startswith("€")
        assert "?" not in doc.text.split("euro")[0]  # fallback char consumed

    def test_surrogate_pair_recombined(self):
        # U+1F600 as an RTF surrogate pair: \ud83d \ude00 (negative \uN form)
        doc = rtf_extract(rb"{\rtf1 \u-10179 ?\u-8704 ? done}")
        assert "\U0001f600" in doc.text


class TestOoxml:
    def _zip(self, entries: dict[str, str]) -> bytes:
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            for name, content in entries.items():
                zf.writestr(name, content)
        return buf.getvalue()

    def test_docx_entities_and_paragraphs(self):
        data = self._zip(
            {
                "word/document.xml": (
                    "<w:document><w:p><w:r><w:t>A &amp; B</w:t></w:r></w:p>"
                    "<w:p><w:r><w:t xml:space=\"preserve\">second</w:t></w:r></w:p>"
                    "</w:document>"
                )
            }
        )
        doc = extract_document(data)
        assert doc.text == "A & B\nsecond"

    def test_plain_zip_is_not_a_document(self):
        assert extract_document(self._zip({"readme.txt": "hi"})) is None

    def test_truncated_zip_no_crash(self):
        data = self._zip({"word/document.xml": "<w:t>x</w:t>"})[:30]
        # dispatcher sees PK magic but the archive is broken -> None
        assert extract_document(data) is None


class TestSurrogates:
    def test_pair_recombines(self):
        assert _fix_surrogates("a😀b") == "a\U0001f600b"

    def test_lone_surrogate_replaced(self):
        out = _fix_surrogates("a\ud800b")
        assert "\ud800" not in out and out.startswith("a") and out.endswith("b")

    def test_clean_text_unchanged(self):
        assert _fix_surrogates("plain") == "plain"
        assert _fix_surrogates(None) is None


class TestCfbRobustness:
    def test_truncated_cfb_typed_not_crashing(self):
        data = bytes.fromhex("d0cf11e0a1b11ae1") + b"\x00" * 100
        doc = extract_document(data)
        # unparseable container -> None (extract_content then magic-types it)
        assert doc is None or isinstance(doc, DocumentContent)

    def test_non_document_bytes_none(self):
        assert extract_document(b"\x00\x01\x02\x03") is None
        assert extract_document(b"") is None


class TestMediaExtractorRobustness:
    """The extractors must never raise on malformed payloads (B22 stance):
    truncated/garbage bytes behind each magic prefix still return a typed
    DocumentContent (or None), never an exception."""

    MAGICS = [
        b"ID3\x03\x00\x00\x00\x00\x00\x7f",
        b"fLaC\x00\x00\x00\x22",
        b"FORM\x00\x00\x00\x10AIFFCOMM",
        b"II*\x00\x08\x00\x00\x00",
        b"MM\x00*\x00\x00\x00\x08",
        b"8BPS\x00\x01",
        b"\x00\x00\x00\x20ftypM4A ",
        b"FLV\x01\x05",
        b"RIFF\x00\x00\x00\x10WAVEfmt ",
        b"Obj\x01\x04\x14avro",
        b"\x89PNG\r\n\x1a\n\x00\x00\x00\rIHDR",
        b"\xff\xd8\xff\xe1\x00\x20Exif\x00\x00II*\x00",
        b"GIF89a\x10\x00",
        b"P6\n100 75\n255\n",
    ]

    def test_truncated_magic_prefixes(self):
        for magic in self.MAGICS:
            for cut in range(len(magic) + 1):
                doc = extract_document(magic[:cut])
                assert doc is None or doc.mime

    def test_magic_plus_garbage(self):
        import random

        rng = random.Random(42)
        for magic in self.MAGICS:
            for _ in range(20):
                junk = bytes(rng.randrange(256) for _ in range(rng.randrange(400)))
                doc = extract_document(magic + junk)
                assert doc is None or doc.mime

    def test_id3v1_trailer_only(self):
        tag = b"TAG" + b"My Title".ljust(30, b"\x00") + b"Artist".ljust(30, b"\x00") + b"\x00" * 65
        data = b"\xff" * 10 + tag[: 128 - 10]  # wrong-size trailer: no crash
        extract_document(data)
        full = b"\xff" * 200 + b"TAG" + b"My Title".ljust(30, b"\x00") + b"An Artist".ljust(30, b"\x00") + b"Album".ljust(30, b"\x00") + b"\x00" * 35
        doc = extract_document(full)
        assert doc.mime == "audio/mpeg"
        assert doc.metadata["title"] == "My Title"
        assert doc.metadata["artist"] == "An Artist"


class TestExtractorRegressions:
    def test_pdf_backslash_89_not_octal(self):
        from solr_map_reduce_spark.sources.documents import _pdf_unescape

        assert _pdf_unescape(rb"a\9b") == b"a9b"
        assert _pdf_unescape(rb"a\8\9z") == b"a89z"
        assert _pdf_unescape(rb"a\101b") == b"aAb"  # real octal still decodes
        assert _pdf_unescape(rb"a\0b") == b"a\x00b"

    def test_mp4_largesize_box_header(self):
        import struct

        from solr_map_reduce_spark.sources.documents import mp4_extract

        # size==1 (largesize) form: 16-byte header, payload at +16
        data = struct.pack(">I4sQ4s", 1, b"ftyp", 20, b"M4A ") + b"mp42"
        doc = mp4_extract(data)
        assert doc.metadata["brand"] == "M4A"
        assert doc.mime == "audio/mp4"
