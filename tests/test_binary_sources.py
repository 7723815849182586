"""Binary-document operators (B11-B14): MIME sniffing, decompress, unpack,
attachment separation, solrCell-analog content extraction."""

import bz2
import gzip
import io
import tarfile
import zipfile

import pyspark.sql.functions as F
import pytest

from solr_map_reduce_spark.sources import binary as B

PNG = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16
PDF = b"%PDF-1.4 fake"
GZ = gzip.compress(b"hello gzip world")
BZ = bz2.compress(b"hello bzip2 world")
XML = b'<?xml version="1.0"?><root/>'


def _tar_bytes(entries):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in entries:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def _zip_bytes(entries):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in entries:
            zf.writestr(name, data)
    return buf.getvalue()


@pytest.fixture(scope="module")
def bin_df(spark):
    rows = [
        ("png", bytearray(PNG)),
        ("pdf", bytearray(PDF)),
        ("gz", bytearray(GZ)),
        ("bz2", bytearray(BZ)),
        ("xml", bytearray(XML)),
        ("txt", bytearray(b"plain old text")),
        ("bin", bytearray(b"\x00\xff\xfe\x01 not utf8 \xff")),
        ("empty", bytearray(b"")),
        ("null", None),
    ]
    return spark.createDataFrame(rows, "path string, content binary")


def test_detect_mime_type(bin_df):
    got = {
        r["path"]: r["mime"]
        for r in bin_df.select(
            "path", B.detect_mime_type(F.col("content")).alias("mime")
        ).collect()
    }
    assert got["png"] == "image/png"
    assert got["pdf"] == "application/pdf"
    assert got["gz"] == "application/gzip"
    assert got["bz2"] == "application/x-bzip2"
    assert got["xml"] == "application/xml"
    assert got["txt"] == "text/plain"
    assert got["bin"] == "application/octet-stream"
    assert got["empty"] == "application/x-empty"
    assert got["null"] == "application/x-empty"


def test_detect_mime_tar(spark):
    tar = _tar_bytes([("a.txt", b"aaa")])
    df = spark.createDataFrame([("t", bytearray(tar))], "path string, content binary")
    got = df.select(B.detect_mime_type(F.col("content")).alias("m")).first()["m"]
    assert got == "application/x-tar"


def test_decompress_roundtrip(bin_df):
    out = {
        r["path"]: (bytes(r["content"]) if r["content"] is not None else None)
        for r in B.decompress(bin_df).collect()
    }
    assert out["gz"] == b"hello gzip world"
    assert out["bz2"] == b"hello bzip2 world"
    assert out["txt"] == b"plain old text"  # pass-through
    assert out["png"] == PNG
    assert out["null"] is None


def test_decompress_corrupt_keep(spark):
    corrupt = b"\x1f\x8b" + b"garbage"
    df = spark.createDataFrame([("c", bytearray(corrupt))], "path string, content binary")
    kept = bytes(B.decompress(df, on_error="keep").first()["content"])
    assert kept == corrupt
    nulled = B.decompress(df, on_error="null").first()["content"]
    assert nulled is None


def test_unpack_zip_and_tar(spark):
    z = _zip_bytes([("a.txt", b"AAA"), ("d/b.txt", b"BBB")])
    t = _tar_bytes([("x.csv", b"1,2,3")])
    df = spark.createDataFrame(
        [("z", bytearray(z)), ("t", bytearray(t)), ("p", bytearray(b"loose"))],
        "path string, content binary",
    )
    got = [
        (r["path"], r["entry_name"], bytes(r["entry_content"]))
        for r in B.unpack(df).orderBy("path", "entry_name").collect()
    ]
    assert ("z", "a.txt", b"AAA") in got
    assert ("z", "d/b.txt", b"BBB") in got
    assert ("t", "x.csv", b"1,2,3") in got
    assert ("p", None, b"loose") in got
    assert len(got) == 4


def test_separate_attachments(spark):
    df = spark.createDataFrame(
        [("d1", [bytearray(b"a"), bytearray(b"b")]), ("d2", [bytearray(b"c")])],
        "doc string, attachments array<binary>",
    )
    out = B.separate_attachments(df).collect()
    assert len(out) == 3
    assert sorted(bytes(r["attachments"]) for r in out) == [b"a", b"b", b"c"]


def test_extract_content_builtin(bin_df):
    out = {r["path"]: r for r in B.extract_content(bin_df).collect()}
    assert out["txt"]["content_text"] == "plain old text"
    assert out["txt"]["content_type"] == "text/plain"
    assert out["xml"]["content_type"] == "application/xml"
    assert out["bin"]["content_text"] is None
    assert out["bin"]["content_type"] == "application/octet-stream"
    assert out["png"]["content_length"] == len(PNG)


def test_extract_content_tika_stub(bin_df):
    with pytest.raises(NotImplementedError):
        B.extract_content(bin_df, impl="tika")


def test_pipeline_shape_binaryfile_to_index(spark, tmp_path):
    """B11-B13 end-to-end: binaryFile scan → decompress → extract → typed
    rows (the solrCell morphline shape, solrCellDocumentTypes.conf:36-97)."""
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.txt.gz").write_bytes(gzip.compress(b"doc one body"))
    (src / "b.txt").write_bytes(b"doc two body")
    df = spark.read.format("binaryFile").load(str(src))
    out = B.extract_content(B.decompress(df)).select(
        F.col("path"), "content_text", "content_type"
    )
    got = {r["path"].rsplit("/", 1)[-1]: r["content_text"] for r in out.collect()}
    assert got == {"a.txt.gz": "doc one body", "b.txt": "doc two body"}


def test_extract_rfc822_email(spark):
    """B11 builtin parser handles message/rfc822 (the reference's
    mbox/message parser slot, solrCellDocumentTypes.conf:251), golden-tested
    on the reference's own email fixture."""
    import os

    from solr_map_reduce_spark.sources.binary import extract_content

    fixture = (
        "/root/reference/morphlines-core/src/test/resources/test-documents/testRFC822"
    )
    if not os.path.exists(fixture):
        import pytest

        pytest.skip("reference fixture absent")
    df = spark.read.format("binaryFile").load(fixture)
    row = extract_content(df).select(
        "content_type", "content_text"
    ).first()
    assert row["content_type"] == "message/rfc822"
    assert "Subject: [jira] Commented: (TIKA-461)" in row["content_text"]
    assert "mime4j" in row["content_text"]  # body survived


def test_extract_plain_text_not_misdetected_as_email(spark):
    from solr_map_reduce_spark.sources.binary import extract_content

    df = spark.createDataFrame(
        [
            (bytearray("note: this has a colon\nbut is not mail".encode()),),
            (bytearray(b"plain words only"),),
        ],
        "content binary",
    )
    got = [r["content_type"] for r in extract_content(df).collect()]
    assert got == ["text/plain", "text/plain"]


# -- B11 builtin document extractors: golden tests on the reference's own
# corpus (mlt/resources/test-documents — the files solrCell feeds to Tika,
# solrCellDocumentTypes.conf:178-230) ---------------------------------------

REF_DOCS = "/root/reference/morphlines-core/src/test/resources/test-documents"


@pytest.mark.skipif(
    not __import__("os").path.isdir(REF_DOCS), reason="reference corpus absent"
)
class TestReferenceCorpusExtraction:
    def _extract_one(self, name):
        from solr_map_reduce_spark.sources.documents import extract_document

        with open(f"{REF_DOCS}/{name}", "rb") as f:
            return extract_document(f.read())

    def test_pdf_text_and_metadata(self):
        doc = self._extract_one("testPDF.pdf")
        assert doc.mime == "application/pdf"
        assert doc.title == "Apache Tika - Apache Tika"
        assert "Apache Tika" in doc.text
        assert "toolkit" in doc.text
        # UTF-16BE metadata value with octal escapes decodes
        assert doc.metadata["author"] == "Bertrand Delacrétaz"

    def test_docx_paragraph_text(self):
        doc = self._extract_one("NullHeader.docx")
        assert doc.mime.endswith("wordprocessingml.document")
        assert doc.text.startswith("Hundreds injured in Yemen protest")
        assert "Taiz" in doc.text
        # paragraph boundaries become newlines
        assert "protest\nBBC Middle East" in doc.text

    def test_xlsx_shared_strings_and_title(self):
        doc = self._extract_one("testEXCEL.xlsx")
        assert doc.mime.endswith("spreadsheetml.sheet")
        assert doc.title == "Simple Excel document"
        assert "Sample Excel Worksheet" in doc.text
        assert "Number" in doc.text and "Square" in doc.text

    def test_pptx_slide_text(self):
        doc = self._extract_one("testPPT_various.pptx")
        assert doc.mime.endswith("presentationml.presentation")
        assert "Here is a text box" in doc.text
        assert "Row 1 Col 1" in doc.text

    def test_rtf_text(self):
        doc = self._extract_one("testRTFVarious.rtf")
        assert doc.mime == "application/rtf"
        assert "Here is a list:" in doc.text or "Bold italic underline" in doc.text
        # control words and group data must not leak
        assert "\\par" not in doc.text and "fonttbl" not in doc.text

    def test_pages_zip_extracted(self):
        # .pages is a zip but not OOXML — routed to the iWork index.xml path
        doc = self._extract_one("testPages.pages")
        assert doc.mime == "application/vnd.apple.pages"
        assert doc.text.startswith("Lorem ipsum dolor sit amet")
        assert "Consectetur adipiscing elit" in doc.text

    def test_generic_zip_with_index_xml_not_iwork(self):
        # a plain archive that merely CONTAINS index.xml must not be typed
        # as Pages — the root-element gate (Tika parity)
        import io
        import zipfile

        from solr_map_reduce_spark.sources.documents import extract_document

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("index.xml", "<?xml version='1.0'?><site><p>x</p></site>")
        assert extract_document(buf.getvalue()) is None

    def test_spark_extract_content_over_corpus(self, spark):
        """The Spark surface: binaryFile scan over the real corpus →
        extract_content yields text + title columns for all five formats."""
        files = [
            "testPDF.pdf", "NullHeader.docx", "testEXCEL.xlsx",
            "testPPT_various.pptx", "testRTFVarious.rtf",
        ]
        df = spark.read.format("binaryFile").load(
            [f"{REF_DOCS}/{n}" for n in files]
        )
        out = {r["path"].split("/")[-1]: r for r in
               B.extract_content(df).select(
                   "path", "content_text", "content_type", "content_title"
               ).collect()}
        assert len(out) == 5
        assert all(r["content_text"] for r in out.values())
        assert out["testPDF.pdf"]["content_title"] == "Apache Tika - Apache Tika"
        assert "Yemen" in out["NullHeader.docx"]["content_text"]
        assert out["testEXCEL.xlsx"]["content_type"].endswith("sheet")
        assert "text box" in out["testPPT_various.pptx"]["content_text"]
        assert out["testRTFVarious.rtf"]["content_type"] == "application/rtf"


@pytest.mark.skipif(
    not __import__("os").path.isdir(REF_DOCS), reason="reference corpus absent"
)
class TestLegacyOfficeExtraction:
    """CFB/OLE2 formats (.doc/.xls/.ppt/.msg) via the minimal MS-CFB reader
    (sources/cfb.py) + per-format extractors — golden on the reference's
    Tika corpus."""

    def _extract_one(self, name):
        from solr_map_reduce_spark.sources.documents import extract_document

        with open(f"{REF_DOCS}/{name}", "rb") as f:
            return extract_document(f.read())

    def test_doc_piece_table_text(self):
        doc = self._extract_one("testWORD_various.doc")
        assert doc.mime == "application/msword"
        assert "Here is a list:" in doc.text
        assert "Bold italic underline" in doc.text

    def test_xls_shared_strings(self):
        doc = self._extract_one("testEXCEL.xls")
        assert doc.mime == "application/vnd.ms-excel"
        assert "Sample Excel Worksheet" in doc.text
        assert "Microsoft Excel X for Mac" in doc.text

    def test_ppt_text_atoms(self):
        doc = self._extract_one("testPPT_various.ppt")
        assert doc.mime == "application/vnd.ms-powerpoint"
        assert "This is the header text." in doc.text

    def test_msg_properties(self):
        doc = self._extract_one("test-outlook.msg")
        assert doc.mime == "application/vnd.ms-outlook"
        assert doc.title == "Microsoft Outlook Express 6"
        assert doc.text.startswith("From: L'Équipe Microsoft Outlook Express")
        assert doc.metadata["to"].startswith("Nouvel utilisateur")

    def test_visio_cfb_typed_not_parsed(self):
        doc = self._extract_one("testVISIO.vsd")
        assert doc.mime == "application/vnd.visio"
        assert doc.text is None


@pytest.mark.skipif(
    not __import__("os").path.isdir(REF_DOCS), reason="reference corpus absent"
)
class TestMediaMetadataExtraction:
    """Media/metadata slice of the Tika corpus: typed mime + header-derived
    metadata from the public format specs (ID3, FLAC, AIFF, TIFF 6.0, PSD,
    ISO-BMFF, FLV)."""

    def _extract_one(self, name):
        from solr_map_reduce_spark.sources.documents import extract_document

        with open(f"{REF_DOCS}/{name}", "rb") as f:
            return extract_document(f.read())

    def test_mp3_id3v2_i18n_tags(self):
        doc = self._extract_one("testMP3i18n.mp3")
        assert doc.mime == "audio/mpeg"
        assert doc.title == "Une chason en Français"
        assert doc.metadata["artist"] == "Test Artist ⑨①"
        assert doc.metadata["album"] == "Test Album ①⑨"
        assert "Comment" in doc.metadata["comment"]

    def test_flac_streaminfo_and_vorbis_comments(self):
        doc = self._extract_one("testFLAC.flac")
        assert doc.mime == "audio/x-flac"
        assert doc.metadata["sample_rate"] == "44100"
        assert doc.metadata["channels"] == "2"
        assert doc.metadata["bits_per_sample"] == "16"
        assert doc.title == "Test Title"

    def test_aiff_comm_chunk(self):
        doc = self._extract_one("testAIFF.aif")
        assert doc.mime == "audio/x-aiff"
        assert doc.metadata["sample_rate"] == "44100"
        assert doc.metadata["channels"] == "2"
        assert doc.metadata["bits_per_sample"] == "16"

    def test_tiff_dimensions(self):
        doc = self._extract_one("testTIFF.tif")
        assert doc.mime == "image/tiff"
        assert doc.metadata["width"] == "100"
        assert doc.metadata["height"] == "75"

    def test_psd_header(self):
        doc = self._extract_one("testPSD.psd")
        assert doc.mime == "image/vnd.adobe.photoshop"
        assert doc.metadata["width"] == "537"
        assert doc.metadata["height"] == "51"

    def test_m4a_brand_and_duration(self):
        doc = self._extract_one("testMP4.m4a")
        assert doc.mime == "audio/mp4"
        assert doc.metadata["brand"] == "M4A"
        assert float(doc.metadata["duration_s"]) > 0

    def test_flv_header_flags(self):
        doc = self._extract_one("testFLV.flv")
        assert doc.mime == "video/x-flv"
        assert doc.metadata == {
            "version": "1", "has_audio": "true", "has_video": "true"
        }

    def test_wav_fmt_chunk(self):
        doc = self._extract_one("testWAV.wav")
        assert doc.mime == "audio/x-wav"
        assert doc.metadata["sample_rate"] == "44100"
        assert doc.metadata["channels"] == "2"
        assert doc.metadata["codec"] == "pcm_s16le"

    def test_jpeg_exif_ifd0(self):
        # EXIF IFD0 via the shared TIFF walker (APP1 Exif\0\0 blob)
        doc = self._extract_one("testJPEG_EXIF.jpg")
        assert doc.mime == "image/jpeg"
        assert doc.metadata["width"] == "100"
        assert doc.metadata["height"] == "68"
        assert doc.metadata["make"] == "Canon"
        assert doc.metadata["model"] == "Canon EOS 40D"

    def test_png_bmp_dimensions(self):
        png = self._extract_one("testPNG.png")
        assert (png.mime, png.metadata["width"], png.metadata["height"]) == (
            "image/png", "100", "75",
        )
        bmp = self._extract_one("testBMP.bmp")
        assert (bmp.mime, bmp.metadata["width"], bmp.metadata["height"]) == (
            "image/bmp", "100", "75",
        )

    def test_avro_container_typed_with_schema_name(self):
        doc = self._extract_one("sample-statuses-20120521-100919.avro")
        assert doc.mime == "application/avro"
        assert doc.metadata["schema_name"] == "Doc"
        assert doc.metadata["codec"] == "null"


@pytest.mark.skipif(
    not __import__("os").path.isdir(REF_DOCS), reason="reference corpus absent"
)
class TestCompressedPayloadRecursion:
    """decompress → callParentPipe parity (solrCellDocumentTypes.conf:88-97):
    gzip/bz2 payloads are decompressed and the INNER document's type, text,
    and metadata win, with the codec recorded."""

    def _payload(self, name):
        from solr_map_reduce_spark.sources.binary import _extract_payload

        with open(f"{REF_DOCS}/{name}", "rb") as f:
            return _extract_payload(f.read())

    def test_gzip_csv(self):
        text, mime, _title, meta = self._payload("cars.csv.gz")
        assert mime == "text/plain"
        assert meta["compression"] == "gzip"
        assert text.startswith("Age,Color,Extras,Type,Used")

    def test_bzip2_text(self):
        text, mime, _title, meta = self._payload(
            "sample-statuses-20120906-141433.bz2"
        )
        assert mime == "text/plain"
        assert meta["compression"] == "bzip2"
        assert "sample tweet one" in text

    def test_gzip_jpeg_inner_exif_wins(self):
        _text, mime, _title, meta = self._payload("testJPEG_EXIF.jpg.gz")
        assert mime == "image/jpeg"
        assert meta["compression"] == "gzip"
        assert meta["model"] == "Canon EOS 40D"

    def test_corrupt_gzip_falls_through_to_magic(self):
        from solr_map_reduce_spark.sources.binary import _extract_payload

        text, mime, _title, meta = _extract_payload(b"\x1f\x8b\x08garbage!!")
        assert mime == "application/gzip"
        assert text is None and "compression" not in meta


@pytest.mark.skipif(
    not __import__("os").path.isdir(REF_DOCS), reason="reference corpus absent"
)
class TestMbox:
    def test_extract_content_types_and_counts_mbox(self, spark):
        from solr_map_reduce_spark.sources.binary import extract_content

        df = (
            spark.read.format("binaryFile")
            .load(f"{REF_DOCS}/complex.mbox")
            .select("path", "content")
        )
        row = extract_content(df).collect()[0]
        assert row["content_type"] == "application/mbox"
        assert row["content_metadata"]["message_count"] == "3"
        assert "shuffle/sort" in row["content_text"]

    def test_explode_mbox_one_row_per_message(self, spark):
        from solr_map_reduce_spark.sources.binary import explode_mbox

        df = (
            spark.read.format("binaryFile")
            .load(f"{REF_DOCS}/complex.mbox")
            .select("path", "content")
        )
        rows = explode_mbox(df).orderBy("message_index").collect()
        assert [r["message_index"] for r in rows] == [0, 1, 2]
        assert all("hadoop" in r["message_text"].lower() for r in rows)

    def test_explode_mbox_non_mbox_zero_rows(self, spark):
        from solr_map_reduce_spark.sources.binary import explode_mbox

        df = spark.createDataFrame(
            [("x", bytearray(b"plain text, not mail"))], "path string, content binary"
        )
        assert explode_mbox(df).count() == 0


class TestMboxGate:
    def test_prose_starting_with_from_is_plain_text(self):
        from solr_map_reduce_spark.sources.binary import _extract_payload

        text, mime, _t, _m = _extract_payload(
            b"From the desk of the editor:\nhello world"
        )
        assert mime == "text/plain"
        assert text.startswith("From the desk")  # first line NOT eaten

    def test_explode_mbox_skips_prose(self, spark):
        from solr_map_reduce_spark.sources.binary import explode_mbox

        df = spark.createDataFrame(
            [("p1", bytearray(b"From here to there\nno mail at all"))],
            "path string, content binary",
        )
        assert explode_mbox(df).count() == 0


class TestMboxGateRecall:
    def test_mbox_with_malformed_first_message_still_mbox(self):
        """A truncated/headerless first message must not discard a valid
        archive: any parsing message keeps mbox handling."""
        from solr_map_reduce_spark.sources.binary import _extract_payload

        data = (
            "From broken@x Mon Jan 1 00:00:00 2020\n"
            "this first message has no headers at all\n"
            "From alice@example.com Mon Jan 1 00:00:01 2020\n"
            "From: alice@example.com\nTo: bob@example.com\n"
            "Subject: hi\n\nreal body\n"
        ).encode()
        text, mime, _t, meta = _extract_payload(data)
        assert mime == "application/mbox"
        assert meta["message_count"] == "2"
        assert "real body" in text
