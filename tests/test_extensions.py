import numpy as np
import pyspark.sql.functions as F
import pytest

from solr_map_reduce_spark.extensions import multimodal, similarity, text_analysis, text_dedup


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill in the afternoon sun"
    )
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base + " slowly"),  # near dup of 1
        (4, "completely different content about spark dataframes and shuffles"),
        (5, "another unrelated document mentioning parquet row groups only"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _exact_jaccard(a: str, b: str, k: int = 3) -> float:
    def sh(s):
        toks = [t for t in "".join(c if c.isalnum() else " " for c in s.lower()).split() if t]
        return {" ".join(toks[i : i + k]) for i in range(max(1, len(toks) - k + 1))}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_minhash_finds_near_dups(spark, near_dup_docs):
    pairs = text_dedup.minhash_dedup(near_dup_docs, threshold=0.5).collect()
    found = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert (1, 2) in found and found[(1, 2)] == 1.0
    assert (1, 3) in found and found[(1, 3)] > 0.5
    assert not any({a, b} & {4, 5} and {a, b} & {1, 2, 3} for a, b in found)


def test_minhash_jaccard_is_exact_on_pairs(near_dup_docs):
    rows = {r["doc_id"]: r["text"] for r in near_dup_docs.collect()}
    # verified jaccard must equal exact set jaccard (verification is exact,
    # only candidate generation is approximate)
    expected = _exact_jaccard(rows[1], rows[3])
    got = (
        text_dedup.minhash_dedup(near_dup_docs, threshold=0.1)
        .filter((F.col("id_a") == 1) & (F.col("id_b") == 3))
        .first()
    )
    assert got is not None
    assert abs(got["jaccard"] - expected) < 1e-12


def test_exact_dedup(spark, near_dup_docs):
    out = {r["keep_id"]: r["n_dupes"] for r in text_dedup.exact_dedup(near_dup_docs).collect()}
    assert out[1] == 1  # doc 2 is its dup
    assert out[3] == 0 and out[4] == 0 and out[5] == 0
    assert 2 not in out


def test_simhash_near_dups_close(spark, near_dup_docs):
    sims = text_dedup.simhash64(near_dup_docs)
    pairs = text_dedup.simhash_candidates(sims, max_hamming=10).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert got.get((1, 2)) == 0
    assert (1, 3) in got


def test_ngram_jaccard_pairs(spark, near_dup_docs):
    pairs = text_dedup.ngram_jaccard_pairs(near_dup_docs, threshold=0.5).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in ids


def test_cosine_topk_matches_numpy(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = e.orderBy("vec_id").limit(200).collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    q = mat[0]
    sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -sims))[:5]
    expected = [int(ids[i]) for i in order]
    sub = spark.createDataFrame(rows)
    got = [r["vec_id"] for r in similarity.cosine_topk(sub, q.tolist(), k=5).collect()]
    assert got == expected


def test_ivf_recall_reasonable(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.orderBy("vec_id").first()["embedding"]
    exact = {r["vec_id"] for r in similarity.cosine_topk(e, q, k=10).collect()}
    idx = similarity.IvfIndex.fit(e, n_centroids=8)
    assigned = idx.assign(e).cache()
    approx = {r["vec_id"] for r in idx.search(assigned, q, k=10, nprobe=4).collect()}
    assert len(exact & approx) >= 5  # recall@10 >= 0.5 with half the buckets probed


def test_cosine_pairs_lsh_finds_identical(spark):
    rng = np.random.RandomState(0)
    base = rng.randn(8, 16).astype(np.float32)
    rows = [(i, base[i % 8].tolist()) for i in range(16)]  # each vec duplicated
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = similarity.cosine_pairs_lsh(df, threshold=0.999, n_planes=8).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert all((i, i + 8) in found for i in range(8))


def test_lang_id_english(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog are in the house with all of them"),
            (2, "el perro y el gato de la casa que son los animales"),
            (3, "der Hund und die Katze sind mit den Kindern von Berlin"),
            (4, "这是一个中文文档"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in text_analysis.lang_id(df).collect()}
    assert got == {1: "en", 2: "es", 3: "de", 4: "zh"}


def test_quality_features_ranges(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = text_analysis.quality_features(d).collect()
    for r in feats:
        assert 0.0 <= r["alpha_ratio"] <= 1.0
        assert 0.0 <= r["quality_score"] <= 1.0 + 1e-9


def test_fingerprint_permutation_invariant(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha alpha"), (3, "other words")],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["fingerprint"] for r in text_analysis.fingerprint(df).collect()}
    assert fps[1] == fps[2] != fps[3]


def test_multimodal_decode_plumbing(spark):
    df = spark.createDataFrame(
        [("m1", bytearray(b"payload-1")), ("m2", bytearray(b"payload-2")), ("m3", None)],
        "media_id string, content binary",
    )
    out = {r["media_id"]: r for r in multimodal.decode_image(df).collect()}
    assert out["m1"]["n_bytes"] == 9
    assert 64 <= out["m1"]["width"] < 256
    assert out["m3"]["width"] == 0 and out["m3"]["mode"] == "NONE"
    # deterministic across invocations
    again = {r["media_id"]: r for r in multimodal.decode_image(df).collect()}
    assert out["m1"]["width"] == again["m1"]["width"]


def test_multimodal_pillow_stub_raises(spark):
    df = spark.createDataFrame([("m1", bytearray(b"x"))], "media_id string, content binary")
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(df, impl="pillow")


def test_frame_sampling_plumbing(spark):
    df = spark.createDataFrame([("v1", bytearray(b"video"))], "media_id string, content binary")
    frames = multimodal.sample_frames(df, n_frames=3).collect()
    assert [r["frame_idx"] for r in frames] == [0, 1, 2]


def test_resize_plumbing(spark):
    df = spark.createDataFrame(
        [("m1", bytearray(b"img-bytes")), ("m2", None)],
        "media_id string, content binary",
    )
    out = {r["media_id"]: r for r in multimodal.resize_image(df, 224, 224).collect()}
    assert (out["m1"]["width"], out["m1"]["height"]) == (224, 224)
    assert bytes(out["m1"]["content"]) == b"img-bytes"  # payload passes through
    assert out["m2"]["width"] == 0
    with pytest.raises(NotImplementedError):
        multimodal.resize_image(df, 224, 224, impl="pillow")


def test_audio_decode_plumbing(spark):
    df = spark.createDataFrame(
        [("a1", bytearray(b"wav-1")), ("a2", bytearray(b"wav-2")), ("a3", None)],
        "media_id string, content binary",
    )
    out = {r["media_id"]: r for r in multimodal.decode_audio(df).collect()}
    assert out["a1"]["sample_rate"] in (8000, 16000, 22050, 44100, 48000)
    assert out["a1"]["n_channels"] in (1, 2)
    assert 0.5 <= out["a1"]["duration_s"] <= 300.0
    assert out["a3"]["codec"] == "NONE" and out["a3"]["n_bytes"] == 0
    again = {r["media_id"]: r for r in multimodal.decode_audio(df).collect()}
    assert out["a1"]["duration_s"] == again["a1"]["duration_s"]  # deterministic


def test_pack_sequences_invariants(spark):
    """No multi-doc chunk exceeds the budget, chunk ids are dense and
    monotone in pack order, and every doc is assigned exactly once."""
    rows = [("g1", i, w) for i, w in enumerate([10, 20, 70, 5, 100, 1, 99, 120, 3])]
    rows += [("g2", i, w) for i, w in enumerate([100, 100, 100])]
    df = spark.createDataFrame(rows, "lang string, doc_id long, n_chars long")
    packed = text_analysis.pack_sequences(
        df, weight_col="n_chars", budget=100, group_cols=("lang",),
        order_col="doc_id",
    ).toPandas()
    assert len(packed) == len(rows)
    for lang, grp in packed.groupby("lang"):
        grp = grp.sort_values("doc_id")
        # monotone dense chunk ids
        diffs = grp["chunk"].diff().dropna()
        assert set(diffs.unique()) <= {0.0, 1.0}
        assert grp["chunk"].iloc[0] == 0
        sums = grp.groupby("chunk").agg(w=("n_chars", "sum"), n=("doc_id", "count"))
        assert ((sums["w"] <= 100) | (sums["n"] == 1)).all()


def test_pack_sequences_oversized_doc_gets_own_chunk(spark):
    df = spark.createDataFrame(
        [("g", 1, 50), ("g", 2, 500), ("g", 3, 50)],
        "lang string, doc_id long, n_chars long",
    )
    packed = (
        text_analysis.pack_sequences(df, budget=100)
        .toPandas().sort_values("doc_id")
    )
    assert list(packed["chunk"]) == [0, 1, 2]


def test_redact_pii_tokens(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@ex-ample.co.uk, ip 192.168.001.42, tel +44 20 7946 0958 end")],
        "id long, text string",
    )
    out = df.select(text_analysis.redact_pii(F.col("text")).alias("r")).first()["r"]
    assert out == "mail <EMAIL>, ip <IP>, tel <PHONE> end"


def test_repetition_score_flags_degenerate_text(spark):
    rows = [
        (1, "spam spam spam spam spam spam spam spam"),
        (2, "a genuinely varied sentence with no repeated trigram at all"),
        (3, "ab"),  # fewer than 3 tokens -> 0 ngrams, dup_frac 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text_analysis.repetition_score(df).collect()}
    assert out[1]["total_ngrams"] == 6 and out[1]["dup_frac"] == 5 / 6
    assert out[2]["dup_frac"] == 0.0
    assert out[3]["total_ngrams"] == 0 and out[3]["dup_frac"] == 0.0


def test_builtin_image_metadata_real_formats(spark):
    """impl='builtin' parses REAL container headers — dimensions crafted
    independently here, plus the reference's real PNG fixture."""
    import os
    import struct
    import zlib as _zlib

    from solr_map_reduce_spark.extensions.multimodal import decode_image

    ihdr = struct.pack(">IIBBBBB", 320, 200, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr
        + struct.pack(">I", _zlib.crc32(b"IHDR" + ihdr))
    )
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + (15).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 8
        + b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + (480).to_bytes(2, "big") + (640).to_bytes(2, "big") + b"\x03" + b"\x00" * 9
    )
    gif = b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00" * 4
    pgm = b"P5\n# c\n77 55\n255\n" + b"\x00" * 10
    rows = [("png", bytearray(png)), ("jpg", bytearray(jpeg)),
            ("gif", bytearray(gif)), ("pgm", bytearray(pgm)),
            ("junk", bytearray(b"\x00\x01\x02"))]
    ref_png = "/root/reference/morphlines-core/src/test/resources/test-documents/testPNG.png"
    if os.path.exists(ref_png):
        rows.append(("refpng", bytearray(open(ref_png, "rb").read())))
    df = spark.createDataFrame(rows, "media_id string, content binary")
    got = {r["media_id"]: r for r in decode_image(df, impl="builtin").collect()}
    assert (got["png"]["width"], got["png"]["height"], got["png"]["mode"],
            got["png"]["format"]) == (320, 200, "RGB", "PNG")
    assert (got["jpg"]["width"], got["jpg"]["height"], got["jpg"]["format"]) == (640, 480, "JPEG")
    assert (got["gif"]["width"], got["gif"]["height"]) == (12, 34)
    assert (got["pgm"]["width"], got["pgm"]["height"], got["pgm"]["mode"]) == (77, 55, "L")
    assert got["junk"]["width"] is None and got["junk"]["format"] is None
    if "refpng" in got:
        assert got["refpng"]["format"] == "PNG"
        assert got["refpng"]["width"] > 0 and got["refpng"]["height"] > 0


def test_builtin_audio_metadata_wav(spark):
    """impl='builtin' really decodes WAV via the stdlib reader; the fixture
    is written with the stdlib writer (independent of the parse path)."""
    import io
    import wave as wave_mod

    from solr_map_reduce_spark.extensions.multimodal import decode_audio

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(b"\x00\x00" * 2 * 8000)  # 0.5 s stereo
    df = spark.createDataFrame(
        [("wav", bytearray(buf.getvalue())), ("junk", bytearray(b"not audio"))],
        "media_id string, content binary",
    )
    got = {r["media_id"]: r for r in decode_audio(df, impl="builtin").collect()}
    assert got["wav"]["sample_rate"] == 16000
    assert got["wav"]["n_channels"] == 2
    assert abs(got["wav"]["duration_s"] - 0.5) < 1e-6
    assert got["wav"]["codec"] == "pcm_s16le"
    assert got["junk"]["sample_rate"] is None


def test_builtin_image_metadata_malformed_inputs(spark):
    """Truncated/fill-byte-laden containers: nulls or correct parse, never a
    task-killing exception."""
    from solr_map_reduce_spark.extensions.multimodal import _builtin_image_meta

    png_trunc = b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR" + b"\x00" * 8
    assert len(png_trunc) == 24 + 1 - 1  # 24 bytes: passes old guard, no color byte
    assert _builtin_image_meta(png_trunc) is None
    # JPEG with a legal 0xFF fill byte before SOF0
    jpeg_fill = (
        b"\xff\xd8" + b"\xff"  # fill byte
        + b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + (10).to_bytes(2, "big") + (20).to_bytes(2, "big") + b"\x01" + b"\x00" * 9
    )
    assert _builtin_image_meta(jpeg_fill) == (20, 10, "L", "JPEG")
    # netpbm bitmap kinds
    assert _builtin_image_meta(b"P1\n3 2\n" + b"0 " * 6) == (3, 2, "1", "PBM")
    assert _builtin_image_meta(b"P4\n3 2\n\x00") == (3, 2, "1", "PBM")


def test_normalize_url_edges(spark):
    from solr_map_reduce_spark.extensions.text_analysis import normalize_url

    cases = [
        # lowercases scheme://host only; path keeps case
        ("HTTPS://Example.COM/Path/To?id=3", "https://example.com/Path/To?id=3"),
        # tracking params scrubbed wherever they sit; order of rest kept
        ("http://a.b/x?utm_source=f&id=1&gclid=z&q=Y", "http://a.b/x?id=1&q=Y"),
        # query emptied out -> dropped entirely
        ("http://a.b/x?utm_campaign=c&fbclid=1", "http://a.b/x"),
        # fragment stripped
        ("http://a.b/x#frag", "http://a.b/x"),
        # no scheme: string untouched except fragment/query rules
        ("a.b/X?ref=tw", "a.b/X"),
        # bare 'ref' without '=' is also scrubbed; 'refresh=1' is NOT
        ("http://a.b/x?ref&refresh=1", "http://a.b/x?refresh=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["c"] for r in df.select(normalize_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_url_dedup_first_wins(spark):
    from solr_map_reduce_spark.extensions.text_analysis import url_dedup

    df = spark.createDataFrame(
        [
            (1, "HTTP://A.b/p?utm_source=x"),
            (2, "http://a.b/p"),
            (3, "http://a.b/q"),
        ],
        "doc_id long, url string",
    )
    got = {r["canonical_url"]: (r["keep_id"], r["n_dupes"]) for r in url_dedup(df).collect()}
    assert got == {"http://a.b/p": (1, 1), "http://a.b/q": (3, 0)}


def test_c4_line_filter_rules(spark):
    from solr_map_reduce_spark.extensions.text_analysis import c4_line_filter

    doc = "\n".join([
        "This line survives the filter.",          # kept
        "Too short.",                              # < 3 words
        "no terminal punctuation here",            # no ./!/?
        "Enable JavaScript to view this page.",    # boilerplate marker
        "Please accept our cookie policy today.",  # boilerplate marker
        "Another good sentence stays here!",       # kept
        "",                                        # empty
    ])
    df = spark.createDataFrame(
        [(1, doc), (2, "no survivors here"), (3, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in c4_line_filter(df).collect()}
    assert set(rows) == {1}  # doc 2 empties out, doc 3 is null
    assert rows[1]["clean_text"] == (
        "This line survives the filter.\nAnother good sentence stays here!"
    )
    assert rows[1]["n_lines_kept"] == 2 and rows[1]["n_lines_dropped"] == 5


def test_normalize_url_idempotent(spark):
    """Canonicalization must be a projection: normalize(normalize(u)) ==
    normalize(u) — a second pass over already-clean URLs changes nothing
    (re-running a curation stage is a no-op, important for resumable
    pipelines)."""
    from solr_map_reduce_spark.extensions.text_analysis import normalize_url

    urls = [
        "HTTPS://Example.COM/Path?utm_source=a&id=1&fbclid=2#x",
        "http://a.b/x?ref",
        "ftp://Host.Net/File.TXT",
        "no-scheme/path?gclid=1&keep=2",
        "http://h/p?a=1&b=2&c=3",
        "",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(normalize_url(F.col("url")).alias("url"))
    twice = once.select(normalize_url(F.col("url")).alias("url"))
    assert [r["url"] for r in once.collect()] == [r["url"] for r in twice.collect()]


def test_hash_split_stability_and_proportions(spark):
    from solr_map_reduce_spark.extensions.text_analysis import hash_split

    df = spark.range(0, 5000).select(F.col("id").alias("doc_id"))
    s1 = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id").collect()}
    # stability: a shuffled, appended-to input assigns identically
    df2 = df.repartition(7).union(
        spark.range(5000, 5100).select(F.col("id").alias("doc_id"))
    )
    s2 = {r["doc_id"]: r["split"] for r in hash_split(df2, "doc_id").collect()}
    assert all(s2[k] == v for k, v in s1.items())
    # proportions: within a few points of 80/10/10 at n=5000
    from collections import Counter

    c = Counter(s1.values())
    assert abs(c["train"] / 5000 - 0.8) < 0.03
    assert abs(c["val"] / 5000 - 0.1) < 0.02
    assert abs(c["test"] / 5000 - 0.1) < 0.02


class TestGopherRules:
    """Round-6: the published Gopher quality rules (Rae et al. 2021,
    App. A1.1) as one JVM-expression pass, DuckDB-oracled in the registry
    (ext_gopher_rules)."""

    def _run(self, spark, rows, **kw):
        from solr_map_reduce_spark.extensions.text_analysis import gopher_rules

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {
            r["doc_id"]: r.asDict() for r in gopher_rules(df, **kw).collect()
        }

    def test_good_document_passes(self, spark):
        text = " ".join(
            "the quick brown fox jumps over that lazy dog and we have fun with it"
            .split() * 5
        )  # 70 words, ordinary prose
        out = self._run(spark, [(1, text)])
        assert out[1]["passes"] is True
        assert out[1]["n_words"] == 75
        assert out[1]["stop_hits"] >= 2

    def test_word_count_bounds(self, spark):
        short = "the and of that"  # 4 words < 50
        out = self._run(spark, [(1, short)])
        assert out[1]["passes"] is False
        # with a lowered floor the same text passes the count rule
        out2 = self._run(spark, [(1, short)], min_words=2)
        assert out2[1]["n_words"] == 4
        assert bool(out2[1]["passes"]) is True

    def test_bullet_and_ellipsis_lines(self, spark):
        bullets = "\n".join(f"• item {i} of the list" for i in range(20))
        out = self._run(spark, [(1, bullets)], min_words=10)
        assert out[1]["bullet_line_frac"] == 1.0
        assert out[1]["passes"] is False  # > 90% bullet lines
        dots = "\n".join(f"the sentence {i} trails off..." for i in range(20))
        out = self._run(spark, [(2, dots)], min_words=10)
        assert out[2]["ellipsis_line_frac"] == 1.0
        assert out[2]["passes"] is False  # > 30% ellipsis-terminated

    def test_symbol_ratio_and_alpha_fraction(self, spark):
        hashy = "the " * 10 + "# " * 10  # 10 hashes / 20 words = 0.5 > 0.1
        out = self._run(spark, [(1, hashy)], min_words=5)
        assert out[1]["symbol_word_ratio"] == 0.5
        assert out[1]["passes"] is False
        nums = "the be of " + "123 456 " * 20  # alpha fraction 3/43 << 0.8
        out = self._run(spark, [(2, nums)], min_words=5)
        assert out[2]["passes"] is False

    def test_empty_and_null_safe(self, spark):
        out = self._run(spark, [(1, ""), (2, "   \n  ")])
        assert out[1]["n_words"] == 0 and out[1]["passes"] is False
        assert out[2]["n_words"] == 0 and out[2]["passes"] is False


class TestChunkDocuments:
    """Round-6: overlapping token-window chunking (the long-doc splitting
    stage upstream of pack_sequences), DuckDB-oracled as ext_chunk_docs."""

    def _chunks(self, spark, text, **kw):
        from solr_map_reduce_spark.extensions.text_analysis import chunk_documents

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = chunk_documents(df, **kw).orderBy("chunk_idx").collect()
        return [(r["chunk_idx"], r["chunk_text"], r["n_tokens"]) for r in rows]

    def test_short_doc_single_chunk(self, spark):
        out = self._chunks(spark, "a b c", chunk_tokens=10, overlap=2)
        assert out == [(0, "a b c", 3)]

    def test_empty_doc_no_chunks(self, spark):
        assert self._chunks(spark, "", chunk_tokens=10, overlap=2) == []
        assert self._chunks(spark, "   ", chunk_tokens=10, overlap=2) == []

    def test_windows_cover_all_tokens_with_exact_overlap(self, spark):
        words = [f"w{i}" for i in range(300)]
        out = self._chunks(spark, " ".join(words), chunk_tokens=128, overlap=32)
        assert len(out) == 3  # ceil((300-128)/96)+1
        stride = 96
        for idx, text, n in out:
            got = text.split()
            want = words[idx * stride: idx * stride + 128]
            assert got == want
        # neighbors share exactly `overlap` tokens
        a, b = out[0][1].split(), out[1][1].split()
        assert a[-32:] == b[:32]
        # the final chunk is shorter, never dropped: last token present
        assert out[-1][1].split()[-1] == "w299"
        # every token position covered
        covered = set()
        for idx, text, _ in out:
            covered.update(text.split())
        assert covered == set(words)

    def test_exact_multiple_no_phantom_chunk(self, spark):
        # n == chunk_tokens: exactly one chunk
        words = [f"w{i}" for i in range(128)]
        out = self._chunks(spark, " ".join(words), chunk_tokens=128, overlap=32)
        assert len(out) == 1 and out[0][2] == 128

    def test_overlap_must_be_smaller(self, spark):
        import pytest as _pytest

        from solr_map_reduce_spark.extensions.text_analysis import chunk_documents

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with _pytest.raises(ValueError, match="overlap"):
            chunk_documents(df, chunk_tokens=8, overlap=8)


def test_gopher_null_text_fails_not_null(spark):
    """Self-review r6: NULL text must produce passes=False (an empty doc),
    never a NULL verdict that escapes both the pass and the fail gate."""
    from solr_map_reduce_spark.extensions.text_analysis import gopher_rules

    df = spark.createDataFrame(
        [(1, None), (2, "the quick fox")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}
    assert out[1]["passes"] is False and out[1]["n_words"] == 0
    # gating on passes / NOT passes covers every row
    gq = gopher_rules(df)
    assert gq.filter("passes").count() + gq.filter("NOT passes").count() == 2
