"""Round-13 review regressions.

Perf claw-back (r12 verdict "what's wrong #1"): the finite-score kNN
guards cost ~2x on the exact-cosine scans because the single-Column
``cosine_to_query`` evaluated the norm fold twice (guard + denominator)
and Catalyst pushes a finite Filter through ANY projection stack by
substituting the aliased score's whole fold expression into the
predicate (PushDownPredicate has no cheapness heuristic).  The working
fix is the NULL-score shape: ``attach_cosine_score(nonfinite="null")``
computes the folds once as scalar columns, maps unusable scores to
NULL (sorting last under desc), and every top-k path filters
``isNotNull`` AFTER its limit — predicates don't push through a Limit.
Used by ``cosine_topk``, both exact ``{!knn}`` paths, and the dot arms
(``attach_dot_score``).  Plus the ADVICE items: a zero-magnitude
cosine QUERY vector is rejected loudly (Lucene raises; a
NULL-everywhere score column would serve a silently empty page
instead), and the fit sample is content-hash-keyed (layout-invariant).
"""

import math

import pytest
import pyspark.sql.functions as F

from solr_map_reduce_spark.extensions import similarity as sim


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.8, 0.6, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 0.0, 0.0]),          # zero-norm: NULL score, dropped
        (5, [float("nan"), 1.0, 0.0, 0.0]),  # NaN component: dropped
        (6, [-1.0, 0.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_attach_cosine_score_matches_column_form(spark, vecs):
    q = [1.0, 1.0, 0.0, 0.0]
    got = {
        r["vec_id"]: r["score"]
        for r in sim.attach_cosine_score(vecs, q).collect()
    }
    # rows 4 (zero-norm -> NULL) and 5 (NaN) are dropped
    assert set(got) == {1, 2, 3, 6}
    import numpy as np

    for vid, v in [(1, [1, 0, 0, 0]), (2, [0.8, 0.6, 0, 0]),
                   (3, [0, 1, 0, 0]), (6, [-1, 0, 0, 0])]:
        a, b = np.asarray(v, float), np.asarray(q, float)
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert math.isclose(got[vid], want, rel_tol=1e-12), vid


def test_attach_cosine_score_keeps_nonfinite_when_asked(spark, vecs):
    q = [1.0, 0.0, 0.0, 0.0]
    out = sim.attach_cosine_score(vecs, q, nonfinite="keep").collect()
    by_id = {r["vec_id"]: r["score"] for r in out}
    assert len(out) == 6              # nothing dropped
    assert by_id[4] is None           # zero-norm stored vector -> NULL
    assert math.isnan(by_id[5])       # NaN component flows through


def test_attach_cosine_score_null_mode_keeps_rows_nulls_unusable(spark, vecs):
    # the top-k shape: unusable vectors score NULL (sort last under
    # desc) instead of being filtered — a pre-limit finite filter gets
    # the folds substituted into its pushed-down predicate and pays the
    # scan twice
    q = [1.0, 0.0, 0.0, 0.0]
    out = sim.attach_cosine_score(vecs, q, nonfinite="null").collect()
    by_id = {r["vec_id"]: r["score"] for r in out}
    assert len(out) == 6                      # rows kept
    assert by_id[4] is None and by_id[5] is None   # zero-norm AND NaN -> NULL
    assert by_id[1] is not None


def test_attach_dot_score_null_mode(spark, vecs):
    q = [1.0, 0.0, 0.0, 0.0]
    out = sim.attach_dot_score(vecs, q, nonfinite="null").collect()
    by_id = {r["vec_id"]: r["score"] for r in out}
    assert by_id[5] is None            # NaN dot -> NULL
    assert by_id[4] == 0.0             # zero vector has a legal dot of 0
    assert by_id[1] == 1.0 and by_id[6] == -1.0


def test_cosine_topk_unchanged_by_fast_shape(spark, vecs):
    q = [1.0, 1.0, 0.0, 0.0]
    got = [r["vec_id"] for r in sim.cosine_topk(vecs, q, k=3).collect()]
    # cos: 2 -> 0.9899.., 1 and 3 tie at 0.7071.. (id tiebreak), 6 last
    assert got == [2, 1, 3]


def test_zero_query_vector_raises_in_similarity(spark, vecs):
    with pytest.raises(ValueError, match="zero-magnitude"):
        sim.cosine_topk(vecs, [0.0, 0.0, 0.0, 0.0], k=3)
    with pytest.raises(ValueError, match="zero-magnitude"):
        sim.attach_cosine_score(vecs, [0.0, 0.0, 0.0, 0.0])
    with pytest.raises(ValueError, match="zero-magnitude"):
        sim.cosine_to_query(F.col("embedding"), [0.0, 0.0])


def test_zero_query_vector_raises_in_knn_parser(spark, vecs, tmp_path):
    from solr_map_reduce_spark.extensions.search import QuerySyntaxError
    from solr_map_reduce_spark.index_reader import SearchIndex
    from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
    from solr_map_reduce_spark.schema import Field, IndexSchema

    schema = IndexSchema(
        fields=(
            Field("id", "string", required=True),
            Field("embedding", "array<double>"),
        ),
        unique_key="id",
    )
    out = str(tmp_path / "idx")
    IndexJob(IndexJobConfig(schema=schema, shards=2)).build(
        vecs.select(
            F.col("vec_id").cast("string").alias("id"), "embedding"
        ),
        out,
    )
    idx = SearchIndex.open(spark, out)
    with pytest.raises(QuerySyntaxError, match="zero-magnitude"):
        idx.query("{!knn f=embedding topK=3}[0.0, 0.0, 0.0, 0.0]")
    # dot similarity still accepts a zero query (a legal, all-zero score)
    idx.query(
        "{!knn f=embedding topK=3 similarity=dot}[0.0, 0.0, 0.0, 0.0]"
    ).collect()


def test_exact_knn_page_still_drops_poisoned_rows(spark, vecs, tmp_path):
    """The refactored exact {!knn} path keeps the r12 hygiene contract:
    zero-norm and NaN-component stored vectors never appear on a page."""
    from solr_map_reduce_spark.extensions.search import QuerySyntaxError
    from solr_map_reduce_spark.index_reader import SearchIndex
    from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
    from solr_map_reduce_spark.schema import Field, IndexSchema

    schema = IndexSchema(
        fields=(
            Field("id", "string", required=True),
            Field("embedding", "array<double>"),
        ),
        unique_key="id",
    )
    out = str(tmp_path / "idx")
    IndexJob(IndexJobConfig(schema=schema, shards=2)).build(
        vecs.select(
            F.col("vec_id").cast("string").alias("id"), "embedding"
        ),
        out,
    )
    idx = SearchIndex.open(spark, out)
    page = [
        r["id"]
        for r in idx.query(
            "{!knn f=embedding topK=10}[1.0, 1.0, 0.0, 0.0]"
        ).collect()
    ]
    assert "4" not in page and "5" not in page
    assert page[0] == "2"


# ---------------------------------------------------------------------------
# Adversarial review pass over the extractor surfaces (r12 verdict item 3):
# documents.py / cfb.py / multimodal.py / metadata.py
# ---------------------------------------------------------------------------

def _docx_bytes(document_xml: str) -> bytes:
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", document_xml)
    return buf.getvalue()


def test_docx_tab_and_break_become_whitespace():
    """<w:tab/> / <w:br/> runs previously vanished, merging adjacent words
    ("cell1cell2") — Tika emits tab/newline for them."""
    from solr_map_reduce_spark.sources.documents import docx_extract

    xml = (
        '<w:document><w:body><w:p>'
        '<w:r><w:t>cell1</w:t></w:r><w:r><w:tab/></w:r>'
        '<w:r><w:t>cell2</w:t></w:r><w:r><w:br/></w:r>'
        '<w:r><w:t>line2</w:t></w:r>'
        '</w:p></w:body></w:document>'
    )
    doc = docx_extract(_docx_bytes(xml))
    assert doc.text == "cell1\tcell2\nline2"


def test_xls_sst_flag_when_string_starts_at_continue_boundary():
    """MS-XLS §2.5.293: EVERY continue boundary that splits character data
    repeats the width-flag byte — including when the string HEADER exactly
    filled the previous record, so no chars had been read yet (the old
    ``and chars`` conjunct skipped the flag and shifted the text one byte)."""
    import struct

    from solr_map_reduce_spark.sources.documents import _xls_sst_strings

    # SST body: cstTotal + cstUnique + one header (cch=4, flags=0) = 11 bytes,
    # char data entirely in the CONTINUE (fresh flag byte + "abcd")
    sst_body = struct.pack("<iiHB", 1, 1, 4, 0x00)
    cont_body = b"\x00" + b"abcd"
    book = (
        struct.pack("<HH", 0x00FC, len(sst_body)) + sst_body
        + struct.pack("<HH", 0x003C, len(cont_body)) + cont_body
    )
    assert _xls_sst_strings(book) == ["abcd"]


def test_rtf_bin_bytes_do_not_corrupt_group_tracking():
    """\\binN raw bytes are unescaped — a 0x7D byte inside previously closed
    the enclosing skip group, leaking binary garbage into the text."""
    from solr_map_reduce_spark.sources.documents import rtf_extract

    doc = rtf_extract(b"{\\rtf1 A{\\pict\\bin3 }x}B}")
    assert doc.text == "A"


def test_jpeg_meta_stops_at_sos():
    """A SOF-less JPEG must yield None, not garbage dimensions parsed from
    stuffed 0xFF bytes inside the entropy-coded data."""
    from solr_map_reduce_spark.extensions.multimodal import _builtin_image_meta

    # SOI + SOS, then compressed-looking data containing a fake SOF0 marker
    data = (
        b"\xff\xd8"
        + b"\xff\xda\x00\x04\x01\x00"
        + b"\x12\x34\xff\xc0\x00\x11\x08\x00\x10\x00\x10\x03"
    )
    assert _builtin_image_meta(data) is None


def _fake_meta_df(spark, path, mtime):
    import datetime

    rows = [
        (
            {
                "file_path": path,
                "file_name": path.rsplit("/", 1)[-1],
                "file_size": 123,
                "file_modification_time": mtime,
            },
        )
    ]
    schema = (
        "_metadata struct<file_path:string,file_name:string,"
        "file_size:long,file_modification_time:timestamp>"
    )
    return spark.createDataFrame(rows, schema)


def test_file_port_extracted_from_authority(spark):
    import datetime

    from solr_map_reduce_spark.operators.metadata import enrich_file_metadata

    mt = datetime.datetime(2024, 5, 1, 12, 0, 0)
    with_port = enrich_file_metadata(
        _fake_meta_df(spark, "hdfs://namenode:8020/data/part-0.parquet", mt)
    ).first()
    assert with_port["file_port"] == 8020
    assert with_port["file_host"] == "namenode"
    portless = enrich_file_metadata(
        _fake_meta_df(spark, "file:/tmp/x.parquet", mt)
    ).first()
    assert portless["file_port"] == -1


def test_file_last_modified_keeps_milliseconds(spark):
    import datetime

    from solr_map_reduce_spark.operators.metadata import enrich_file_metadata

    mt = datetime.datetime(2024, 5, 1, 12, 0, 0, 500_000)  # .5 s
    row = enrich_file_metadata(_fake_meta_df(spark, "file:/tmp/y", mt)).first()
    assert row["file_last_modified"] % 1000 == 500


def test_feature_extract_survives_degenerate_dimensions(spark):
    from solr_map_reduce_spark.extensions.multimodal import feature_extract

    df = spark.createDataFrame(
        [("a", 128, 256), ("b", 0, 0), ("c", None, None)],
        "media_id string, width int, height int",
    )
    rows = {r["media_id"]: r for r in feature_extract(df).collect()}
    assert rows["a"]["aspect_ratio"] == 0.5
    assert rows["a"]["size_bucket"] == "large"
    assert rows["b"]["aspect_ratio"] is None      # was: DIVIDE_BY_ZERO
    assert rows["b"]["size_bucket"] == "small"
    assert rows["c"]["aspect_ratio"] is None
    assert rows["c"]["size_bucket"] is None


# ---------------------------------------------------------------------------
# ADVICE r12: HadoopFS.write_text delete-then-rename window
# ---------------------------------------------------------------------------
# The old shape deleted the destination and then FileSystem.rename'd the
# temp in: a crash between the two lost the destination ENTIRELY (not
# just stale), and a concurrent re-create of dst inside the window made
# the rename error.  write_text now replaces atomically via
# FileContext.rename(OVERWRITE) (no absent-dst window) and cleans the
# temp up on failure; real rename failures surface without touching dst.


class TestHadoopFsAtomicWriteText:
    def _fs(self, spark):
        from solr_map_reduce_spark.fs import HadoopFS, get_fs

        fs = get_fs("file:///tmp", spark)
        assert isinstance(fs, HadoopFS)
        return fs

    def test_replaces_existing_destination_atomically(self, spark, tmp_path):
        import os

        fs = self._fs(spark)
        dst = f"file://{tmp_path}/m/_MARKER.json"
        fs.mkdirs(f"file://{tmp_path}/m")
        fs.write_text(dst, "OLD")
        fs.write_text(dst, "NEW")
        assert fs.read_text(dst) == "NEW"
        # no orphaned temp (Hadoop's local .crc sidecar is fine)
        assert [p for p in os.listdir(tmp_path / "m")
                if ".tmp" in p] == []

    def test_creates_absent_destination(self, spark, tmp_path):
        fs = self._fs(spark)
        dst = f"file://{tmp_path}/n/_META.json"
        fs.mkdirs(f"file://{tmp_path}/n")
        fs.write_text(dst, "{}")
        assert fs.read_text(dst) == "{}"

    def test_failed_replace_keeps_destination_and_cleans_temp(
        self, spark, tmp_path
    ):
        # dst is a NON-EMPTY DIRECTORY: the atomic replace must fail
        # LOUDLY, leave the directory untouched (the old code deleted
        # dst first — here it would have errored AFTER the delete on a
        # file dst, and lost it), and remove the temp file
        import os

        import pytest as _pytest

        fs = self._fs(spark)
        d = tmp_path / "o" / "_MARKER.json"
        d.mkdir(parents=True)
        (d / "keep.txt").write_text("x")
        with _pytest.raises(Exception):
            fs.write_text(f"file://{d}", "clobber")
        assert (d / "keep.txt").read_text() == "x"   # dst untouched
        assert [p for p in os.listdir(tmp_path / "o")
                if p.endswith(".tmp")] == []         # temp cleaned

    def test_local_fs_write_text_cleans_temp_on_failure(self, tmp_path):
        import os

        from solr_map_reduce_spark.fs import LocalFS

        fs = LocalFS()
        d = tmp_path / "p" / "_MARKER.json"
        d.mkdir(parents=True)
        (d / "keep.txt").write_text("x")
        with pytest.raises(OSError):
            fs.write_text(str(d), "clobber")     # os.replace onto a dir
        assert (d / "keep.txt").read_text() == "x"
        assert [p for p in os.listdir(tmp_path / "p")
                if p.endswith(".tmp")] == []


# ---------------------------------------------------------------------------
# cfb.py adversarial review (r13): hand-rolled v3 container fixtures
# ---------------------------------------------------------------------------

def _cfb_v3(small_size=10, sector_shift=9, root_type=5, minifat_next=None,
            n_minifat=1, trunc=None):
    """Minimal valid CFB v3: 1 FAT sector, 1 dir sector (root + 'Small'
    mini stream + 'Big' FAT stream), 1 miniFAT sector, 1 mini-stream
    sector, 8 big sectors.  Knobs poison specific fields."""
    import struct as st

    FREE, END, FATS = 0xFFFFFFFF, 0xFFFFFFFE, 0xFFFFFFFD
    head = bytearray(512)
    head[0:8] = bytes.fromhex("d0cf11e0a1b11ae1")
    st.pack_into("<H", head, 0x18, 0x3E)        # minor
    st.pack_into("<H", head, 0x1A, 3)           # major v3
    st.pack_into("<H", head, 0x1C, 0xFFFE)      # byte order
    st.pack_into("<H", head, 0x1E, sector_shift)
    st.pack_into("<H", head, 0x20, 6)           # mini shift
    st.pack_into("<I", head, 0x2C, 1)           # n_fat
    st.pack_into("<I", head, 0x30, 1)           # first_dir
    st.pack_into("<I", head, 0x38, 4096)        # mini cutoff
    st.pack_into("<I", head, 0x3C, 2)           # first_minifat
    st.pack_into("<I", head, 0x40, n_minifat)
    st.pack_into("<I", head, 0x44, END)         # first_difat
    st.pack_into("<I", head, 0x48, 0)           # n_difat
    st.pack_into("<I", head, 0x4C, 0)           # difat[0] -> FAT sector 0
    for i in range(1, 109):
        st.pack_into("<I", head, 0x4C + 4 * i, FREE)

    fat = [FREE] * 128
    fat[0] = FATS
    fat[1] = END                                # dir chain
    fat[2] = END if minifat_next is None else minifat_next
    fat[3] = END                                # mini-stream data chain
    for s in range(4, 11):
        fat[s] = s + 1
    fat[11] = END                               # big chain 4..11
    fat_sec = st.pack("<128I", *fat)

    def entry(name, etype, start, size):
        e = bytearray(128)
        nb = name.encode("utf-16-le")
        e[0:len(nb)] = nb
        st.pack_into("<H", e, 0x40, len(nb) + 2)
        e[0x42] = etype
        st.pack_into("<III", e, 0x44, FREE, FREE, FREE)  # left/right/child
        st.pack_into("<I", e, 0x74, start)
        st.pack_into("<Q", e, 0x78, size)
        return bytes(e)

    dir_sec = (
        entry("Root Entry", root_type, 3, 512)
        + entry("Small", 2, 0, small_size)
        + entry("Big", 2, 4, 4096)
        + bytes(128)
    )
    minifat = [END] + [FREE] * 127
    minifat_sec = st.pack("<128I", *minifat)
    mini_data = (b"hello-mini" + bytes(54)) + bytes(448)
    big = (b"B" * 512) * 8
    data = bytes(head) + fat_sec + dir_sec + minifat_sec + mini_data + big
    return data[:trunc] if trunc else data


class TestCfbReview:
    def test_baseline_fixture_parses(self):
        from solr_map_reduce_spark.sources.cfb import CfbFile

        f = CfbFile(_cfb_v3())
        assert f.open_stream("Small") == b"hello-mini"
        assert f.open_stream("Big") == b"B" * 4096

    def test_v3_size_high_dword_garbage_masked(self):
        # MS-CFB 2.6.1: v3 writers may leave garbage in the high 32 size
        # bits.  Pre-fix, the inflated size crossed the mini cutoff and
        # open_stream read mini-sid 0 as FAT sector 0 — silently WRONG
        # bytes (the FAT table), not an error
        from solr_map_reduce_spark.sources.cfb import CfbFile

        f = CfbFile(_cfb_v3(small_size=10 | (0xDEAD << 32)))
        assert f.open_stream("Small") == b"hello-mini"

    def test_corrupt_sector_shift_is_loud_value_error(self):
        from solr_map_reduce_spark.sources.cfb import CfbFile

        for shift in (0, 5, 31, 0xFFFF):
            with pytest.raises(ValueError, match="corrupt CFB header"):
                CfbFile(_cfb_v3(sector_shift=shift))

    def test_missing_root_is_value_error_not_stopiteration(self):
        from solr_map_reduce_spark.sources.cfb import CfbFile

        with pytest.raises(ValueError, match="root"):
            CfbFile(_cfb_v3(root_type=0))

    def test_cyclic_minifat_chain_is_bounded(self):
        # miniFAT chain pointing at itself + a header claiming 16M
        # miniFAT sectors: pre-fix this looped n_minifat times appending
        # 512 bytes per round (a multi-GB allocation masquerading as a
        # parse); now bounded by the file's physical sector count
        from solr_map_reduce_spark.sources.cfb import CfbFile

        f = CfbFile(_cfb_v3(minifat_next=2, n_minifat=0x1000000))
        assert len(f.minifat) <= f.max_sectors * 128
        assert f.open_stream("Small") == b"hello-mini"

    def test_truncated_container_never_struct_errors(self):
        import struct as st

        from solr_map_reduce_spark.sources.cfb import CfbFile

        full = _cfb_v3()
        for cut in (512, 600, 1024, 1500, 2048, 3000):
            try:
                f = CfbFile(full[:cut])
                f.stream_names()
                for n in f.stream_names():
                    f.open_stream(n)
            except (ValueError, KeyError):
                pass  # loud, typed — fine
            except st.error as e:  # pragma: no cover
                raise AssertionError(f"struct.error leaked at cut={cut}") from e

    def test_reference_corpus_unchanged(self):
        # the review fixes must not change what the real corpus extracts
        import glob

        from solr_map_reduce_spark.sources.documents import extract_document

        corpus = glob.glob(
            "/root/reference/morphlines-core/src/test/resources/"
            "test-documents/*.doc"
        ) + glob.glob(
            "/root/reference/morphlines-core/src/test/resources/"
            "test-documents/*.xls"
        )
        assert corpus, "reference corpus not found"
        for p in corpus:
            doc = extract_document(open(p, "rb").read())
            assert doc is not None and doc.text, p


# ---------------------------------------------------------------------------
# r13: layout-invariant fit sampling (content-hash selection)
# ---------------------------------------------------------------------------

def test_fit_sample_is_layout_invariant(spark):
    # the r12 fix made refits of ONE layout bit-identical; selection was
    # still per-partition Bernoulli, so compaction/repartitioning (same
    # content, different layout) drew a different sample and refit
    # different centroids.  Content-hash selection keys membership on
    # the row's own bytes: same content -> same sample -> same fit,
    # whatever the partitioning.
    import numpy as np

    from solr_map_reduce_spark.extensions.similarity import (
        IvfIndex,
        _driver_sample,
    )

    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(400)]
    layouts = [
        spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        .repartition(p)
        for p in (1, 7, 32)
    ]
    samples = [
        _driver_sample(df, "embedding", 64, seed=11) for df in layouts
    ]
    assert np.array_equal(samples[0], samples[1])
    assert np.array_equal(samples[0], samples[2])
    cents = [IvfIndex.fit(df, n_centroids=4).centroids for df in layouts]
    assert np.array_equal(cents[0], cents[1])
    assert np.array_equal(cents[0], cents[2])


def test_fit_sample_is_seed_sensitive(spark):
    # different seeds must still draw different samples (the hash is
    # seed-keyed, not a fixed content digest)
    import numpy as np

    from solr_map_reduce_spark.extensions.similarity import _driver_sample

    rng = np.random.RandomState(4)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    s1 = _driver_sample(df, "embedding", 64, seed=1)
    s2 = _driver_sample(df, "embedding", 64, seed=2)
    assert not np.array_equal(s1, s2)


# ---------------------------------------------------------------------------
# r13: sidecar review pass (term_blooms / key_ranges)
# ---------------------------------------------------------------------------

def test_truncated_bloom_bitmap_is_loud_not_false_negative(spark, tmp_path):
    # a tampered/truncated bitmap previously hit a bare IndexError
    # mid-probe — and a short bitmap read as "bit clear" would PRUNE a
    # matching shard, the one thing the Bloom contract forbids
    import base64

    from solr_map_reduce_spark.term_blooms import candidate_shards

    blooms = {
        "text": {
            "m": 1 << 16,
            "k": 4,
            "shards": {"0": base64.b64encode(b"\xff" * 10).decode()},
        }
    }
    with pytest.raises(ValueError, match="corrupt"):
        candidate_shards(spark, blooms, "text", ["hello"])


def test_next_prefix_skips_surrogate_gap():
    from solr_map_reduce_spark.key_ranges import next_prefix

    # normal increments unchanged
    assert next_prefix("ab") == "ac"
    assert next_prefix("a\x7f") == "a\x80"
    # U+D7FF + 1 would be a lone surrogate — unencodable as UTF-8, so
    # a Spark literal built from it raises; no valid key orders inside
    # the gap, so the exclusive bound jumps to U+E000 exactly
    out = next_prefix("a퟿")
    assert out == "a"
    out.encode("utf-8")  # must be a valid Spark literal
    # carry still works
    assert next_prefix(chr(0x10FFFF)) is None
    assert next_prefix("a" + chr(0x10FFFF)) == "b"
