import pyspark.sql.functions as F
import pytest

from solr_map_reduce_spark.functions import analyzers


def test_porter_stem_goldens():
    # Sample vocabulary from Porter's published test set
    cases = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
        "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
        "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
        "filing": "file", "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "rational": "ration", "valenci": "valenc",
        "digitizer": "digit", "conformabli": "conform", "radicalli": "radic",
        "differentli": "differ", "vileli": "vile", "analogousli": "analog",
        "vietnamization": "vietnam", "predication": "predic", "operator": "oper",
        "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
        "callousness": "callous", "formaliti": "formal", "sensitiviti": "sensit",
        "sensibiliti": "sensibl", "triplicate": "triplic", "formative": "form",
        "formalize": "formal", "electriciti": "electr", "electrical": "electr",
        "hopeful": "hope", "goodness": "good", "revival": "reviv",
        "allowance": "allow", "inference": "infer", "airliner": "airlin",
        "gyroscopic": "gyroscop", "adjustable": "adjust", "defensible": "defens",
        "irritant": "irrit", "replacement": "replac", "adjustment": "adjust",
        "dependent": "depend", "adoption": "adopt", "homologou": "homolog",
        "communism": "commun", "activate": "activ", "angulariti": "angular",
        "homologous": "homolog", "effective": "effect", "bowdlerize": "bowdler",
        "probate": "probat", "rate": "rate", "cease": "ceas",
        "controll": "control", "roll": "roll",
    }
    for word, want in cases.items():
        assert analyzers.porter_stem(word) == want, word


def test_text_en_pipeline():
    got = analyzers._analyze_en("The quick brown foxes are jumping over the lazy dogs")
    assert got == ["quick", "brown", "fox", "jump", "over", "lazi", "dog"]


def test_tokenize_lowercase(spark):
    df = spark.createDataFrame([("Hello World",)], "t string")
    out = df.select(analyzers.tokenize_lowercase(F.col("t")).alias("toks")).first()
    assert out["toks"] == ["hello world"]  # keyword tokenizer: one token


def test_tokenize_text_general(spark):
    df = spark.createDataFrame([("Hello, Wörld! 123",)], "t string")
    out = df.select(analyzers.tokenize_text_general(F.col("t")).alias("toks")).first()
    assert out["toks"] == ["hello", "wörld", "123"]


def test_tokenize_text_en_udf(spark):
    df = spark.createDataFrame([("The dogs are running quickly",), (None,)], "t string")
    out = [r["toks"] for r in df.select(analyzers.tokenize_text_en(F.col("t")).alias("toks")).collect()]
    assert out[0] == ["dog", "run", "quickli"]
    assert out[1] is None


def test_tokenize_whitespace(spark):
    df = spark.createDataFrame([("  a  b\tc ",)], "t string")
    out = df.select(analyzers.tokenize_whitespace(F.col("t")).alias("toks")).first()
    assert out["toks"] == ["a", "b", "c"]


def test_tokenize_text_df_api(spark):
    df = spark.createDataFrame([("1", "Some TEXT")], "id string, body string")
    out = analyzers.tokenize_text(df, "body", "body_tokens", "text_general").first()
    assert out["body_tokens"] == ["some", "text"]


class TestLanguageVariantAnalyzers:
    """r5: the analyzer registry generalizes the way the reference schema
    declares its ~30 text_<lang> fieldTypes — per-language stop list +
    published minimal stemmer (Savoy), golden-tested."""

    def test_french_tokens_golden(self, spark):
        from solr_map_reduce_spark.functions.analyzers import tokenize_text

        df = spark.createDataFrame(
            [("1", "Les chevaux mangent l'avoine dans les grandes prairies")],
            "id string, text string",
        )
        toks = tokenize_text(df, "text", "toks", analyzer="text_fr").collect()[0]["toks"]
        # les/dans/l' drop (stop + elision); chevaux->cheval (aux->al);
        # avoine->avoin (-e); grandes->grand; prairies->prairi (plural+e)
        assert toks == ["cheval", "mangent", "avoin", "grand", "prairi"]

    def test_german_tokens_golden(self, spark):
        from solr_map_reduce_spark.functions.analyzers import tokenize_text

        df = spark.createDataFrame(
            [("1", "Die Kinder spielen in den alten Straßen der Stadt")],
            "id string, text string",
        )
        toks = tokenize_text(df, "text", "toks", analyzer="text_de").collect()[0]["toks"]
        # die/in/den/der drop; kinder->kind (er); spielen->spiel (en);
        # alten->alt (en); straßen->straß (en); stadt unchanged
        assert toks == ["kind", "spiel", "alt", "straß", "stadt"]

    def test_minimal_stemmers_unit(self):
        from solr_map_reduce_spark.functions.analyzers import (
            french_minimal_stem,
            german_minimal_stem,
        )

        assert french_minimal_stem("chevaux") == "cheval"
        assert french_minimal_stem("grandes") == "grand"
        assert french_minimal_stem("chat") == "chat"  # < 6 letters untouched
        assert german_minimal_stem("lehrerinnen") == "lehrerin"
        assert german_minimal_stem("hauses") == "haus"
        assert german_minimal_stem("tag") == "tag"

    def test_analyzed_field_build_with_text_fr(self, spark, tmp_path):
        """An index built over a text_fr field stores the analyzed token
        column and serves term queries from it — same contract as
        text_en."""
        from solr_map_reduce_spark.index_reader import SearchIndex
        from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
        from solr_map_reduce_spark.schema import Field, IndexSchema

        schema = IndexSchema(
            fields=(Field("id", "string", required=True), Field("text", "text_fr")),
            unique_key="id",
        )
        df = spark.createDataFrame(
            [
                ("a", "Les chevaux galopent"),
                ("b", "Le cheval dort"),
                ("c", "Rien d'autre ici"),
            ],
            "id string, text string",
        )
        out = str(tmp_path / "fr_idx")
        IndexJob(
            IndexJobConfig(schema=schema, shards=2, dedup="none", routing="native")
        ).build(df, out)
        idx = SearchIndex.open(spark, out)
        # query-side analysis maps the surface form to the same stem, so
        # singular and plural meet in the stored token space
        terms = idx.analyze_terms(["chevaux"])
        assert terms == ["cheval"]
        hits = sorted(r["id"] for r in idx.contains_any(terms).collect())
        assert hits == ["a", "b"]

    def test_accented_stopwords_drop(self, spark):
        """Stop lists must carry the real accented forms — 'était'/'für'
        are function words even though ASCII-folding would miss them."""
        from solr_map_reduce_spark.functions.analyzers import tokenize_text

        fr = spark.createDataFrame(
            [("1", "Ils étaient où même ici")], "id string, text string"
        )
        toks = tokenize_text(fr, "text", "toks", analyzer="text_fr").collect()[0]["toks"]
        assert toks == ["ici"]
        de = spark.createDataFrame(
            [("1", "Wir können über die Brücke gehen")], "id string, text string"
        )
        toks = tokenize_text(de, "text", "toks", analyzer="text_de").collect()[0]["toks"]
        assert toks == ["brück", "geh"]

    def test_register_custom_language_end_to_end(self, spark, tmp_path):
        """register_text_analyzer: a user-supplied text_<lang> becomes a
        schema type, is analyzed at build time with stored tokens, and
        analyze_terms applies it to query terms — the path the reference's
        other ~26 declared language fieldTypes would take."""
        from solr_map_reduce_spark.functions.analyzers import (
            make_language_analyzer,
            register_text_analyzer,
        )
        from solr_map_reduce_spark.index_reader import SearchIndex
        from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
        from solr_map_reduce_spark.schema import Field, IndexSchema

        register_text_analyzer(
            "text_es",
            make_language_analyzer(
                {"el", "la", "los", "las", "de", "en", "y"},
                lambda w: w[:-1] if w.endswith("s") and len(w) > 3 else w,
            ),
        )
        schema = IndexSchema(
            fields=(Field("id", "string", required=True), Field("text", "text_es")),
            unique_key="id",
        )
        df = spark.createDataFrame(
            [("a", "Los gatos duermen"), ("b", "El gato come en la casa")],
            "id string, text string",
        )
        out = str(tmp_path / "es_idx")
        IndexJob(
            IndexJobConfig(schema=schema, shards=2, dedup="none", routing="native")
        ).build(df, out)
        idx = SearchIndex.open(spark, out)
        terms = idx.analyze_terms(["gatos"])
        assert terms == ["gato"]
        hits = sorted(r["id"] for r in idx.contains_any(terms).collect())
        assert hits == ["a", "b"]


class TestDriverSideQueryAnalysis:
    """Round-6: analyze_terms runs the analyzers' Python row kernels
    in-process — no Spark job for |Q| query terms on the serving path."""

    CORPUS = [
        None, "", "   ", "Tables are RUNNING quickly",
        "l'éléphant  mange, vite!", "foo_bar baz-qux 42x 007",
        "Wir können über die Brücke gehen", "UPPER lower MiXeD",
    ]

    @pytest.mark.parametrize(
        "atype",
        ["keyword", "lowercase", "whitespace", "text_general", "text_en",
         "text_fr", "text_de"],
    )
    def test_py_kernel_matches_column_analyzer(self, spark, atype):
        """Every driver-side kernel must tokenize EXACTLY like its Column
        twin (which is what built the stored token columns)."""
        from solr_map_reduce_spark.functions.analyzers import (
            ANALYZERS,
            PY_ANALYZERS,
        )

        df = spark.createDataFrame([(t,) for t in self.CORPUS], "t string")
        jvm = [
            r["toks"]
            for r in df.select(ANALYZERS[atype](F.col("t")).alias("toks")).collect()
        ]
        py = [PY_ANALYZERS[atype](t) for t in self.CORPUS]
        assert py == jvm

    def test_analyze_terms_launches_no_spark_job(self, spark, tmp_path, monkeypatch):
        """The old path built a |terms|-row DataFrame + UDF + collect per
        query (~100 ms serving latency).  Poisoning createDataFrame proves
        the built-in analyzers never touch Spark from analyze_terms."""
        from pyspark.sql import SparkSession

        from solr_map_reduce_spark.index_reader import SearchIndex
        from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
        from solr_map_reduce_spark.schema import Field, IndexSchema

        schema = IndexSchema(
            fields=(Field("id", "string", required=True), Field("text", "text_en")),
            unique_key="id",
        )
        df = spark.createDataFrame(
            [("a", "tables running"), ("b", "other words")],
            "id string, text string",
        )
        out = str(tmp_path / "idx")
        IndexJob(
            IndexJobConfig(schema=schema, shards=1, dedup="none", routing="native")
        ).build(df, out)
        idx = SearchIndex.open(spark, out)

        def boom(*a, **k):
            raise AssertionError("analyze_terms must not launch a Spark job")

        monkeypatch.setattr(SparkSession, "createDataFrame", boom)
        assert idx.analyze_terms(["Tables", "the"]) == ["tabl"]

    def test_registered_analyzer_gets_driver_kernel(self):
        from solr_map_reduce_spark.functions.analyzers import (
            PY_ANALYZERS,
            make_language_analyzer,
            register_text_analyzer,
        )

        register_text_analyzer(
            "text_pt_test",
            make_language_analyzer(
                {"os", "as", "de"}, lambda w: w.rstrip("s") if len(w) > 3 else w
            ),
        )
        assert PY_ANALYZERS["text_pt_test"]("Os gatos de casa") == ["gato", "casa"]


class TestSpanishItalianAnalyzers:
    """Round-6 built-ins via the same public-spec pattern as fr/de:
    Snowball stop lists (abridged) + minimal plural stemmers."""

    def test_spanish_goldens(self):
        from solr_map_reduce_spark.functions.analyzers import (
            PY_ANALYZERS,
            spanish_minimal_stem,
        )

        assert spanish_minimal_stem("gatos") == "gato"
        assert spanish_minimal_stem("casas") == "casa"
        assert spanish_minimal_stem("luces") == "luz"
        assert spanish_minimal_stem("colores") == "color"
        assert spanish_minimal_stem("leones") == "leon"
        assert spanish_minimal_stem("mes") == "mes"  # < 4 letters: untouched
        assert PY_ANALYZERS["text_es"]("Los gatos y las casas") == ["gato", "casa"]

    def test_italian_goldens(self):
        from solr_map_reduce_spark.functions.analyzers import (
            PY_ANALYZERS,
            italian_minimal_stem,
        )

        assert italian_minimal_stem("gattini") == "gattin"
        assert italian_minimal_stem("amiche") == "amic"  # -he strips 2: meets singular amica -> amic
        assert italian_minimal_stem("libretto") == "librett"
        assert italian_minimal_stem("libro") == "libro"  # < 6 letters: untouched
        assert italian_minimal_stem("casa") == "casa"  # < 6 letters: untouched
        assert PY_ANALYZERS["text_it"]("I gattini e le amiche") == ["gattin", "amic"]

    @pytest.mark.parametrize("atype", ["text_es", "text_it"])
    def test_py_kernel_matches_column(self, spark, atype):
        from solr_map_reduce_spark.functions.analyzers import (
            ANALYZERS,
            PY_ANALYZERS,
        )

        corpus = [None, "", "Los gatos duermen bien", "I gattini dormono bene"]
        df = spark.createDataFrame([(t,) for t in corpus], "t string")
        jvm = [
            r["toks"]
            for r in df.select(ANALYZERS[atype](F.col("t")).alias("toks")).collect()
        ]
        assert [PY_ANALYZERS[atype](t) for t in corpus] == jvm

    def test_spanish_field_builds_and_serves(self, spark, tmp_path):
        from solr_map_reduce_spark.index_reader import SearchIndex
        from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
        from solr_map_reduce_spark.schema import Field, IndexSchema

        schema = IndexSchema(
            fields=(Field("id", "string", required=True), Field("text", "text_es")),
            unique_key="id",
        )
        df = spark.createDataFrame(
            [("a", "Los gatos duermen"), ("b", "El perro come en la casa")],
            "id string, text string",
        )
        out = str(tmp_path / "es_builtin_idx")
        IndexJob(
            IndexJobConfig(schema=schema, shards=2, dedup="none", routing="native")
        ).build(df, out)
        idx = SearchIndex.open(spark, out)
        terms = idx.analyze_terms(["gatos"])
        assert terms == ["gato"]
        assert sorted(r["id"] for r in idx.contains_any(terms).collect()) == ["a"]


class TestPtSvNoAnalyzers:
    """Round-6: three more language variants shipped through the factory
    itself (stop list + minimal stemmer each) — the path every further
    declared text_<lang> fieldType takes."""

    def test_portuguese_goldens(self):
        from solr_map_reduce_spark.functions.analyzers import (
            PY_ANALYZERS,
            portuguese_minimal_stem,
        )

        assert portuguese_minimal_stem("gatos") == "gato"
        assert portuguese_minimal_stem("limões") == "limão"
        assert portuguese_minimal_stem("animais") == "animal"
        assert portuguese_minimal_stem("papéis") == "papel"
        assert portuguese_minimal_stem("bens") == "bem"
        assert portuguese_minimal_stem("luzes") == "luz"
        assert portuguese_minimal_stem("flores") == "flor"
        assert portuguese_minimal_stem("mas") == "mas"  # < 4 letters
        assert PY_ANALYZERS["text_pt"]("Os gatos e as flores") == ["gato", "flor"]

    def test_swedish_goldens(self):
        from solr_map_reduce_spark.functions.analyzers import (
            PY_ANALYZERS,
            swedish_minimal_stem,
        )

        assert swedish_minimal_stem("flickorna") == "flick"
        assert swedish_minimal_stem("husen") == "hus"
        assert swedish_minimal_stem("bilar") == "bil"
        assert swedish_minimal_stem("hus") == "hus"  # < 5 letters
        assert PY_ANALYZERS["text_sv"]("alla bilar och husen") == ["bil", "hus"]

    def test_norwegian_goldens(self):
        from solr_map_reduce_spark.functions.analyzers import (
            PY_ANALYZERS,
            norwegian_minimal_stem,
        )

        assert norwegian_minimal_stem("husene") == "hus"
        assert norwegian_minimal_stem("biler") == "bil"
        assert norwegian_minimal_stem("bilene") == "bil"
        assert norwegian_minimal_stem("huset") == "hus"
        assert PY_ANALYZERS["text_no"]("alle bilene og huset") == ["bil", "hus"]

    @pytest.mark.parametrize("atype", ["text_pt", "text_sv", "text_no"])
    def test_py_kernel_matches_column(self, spark, atype):
        from solr_map_reduce_spark.functions.analyzers import (
            ANALYZERS,
            PY_ANALYZERS,
        )

        corpus = [None, "", "Os limões e os animais", "alla flickorna i husen",
                  "alle husene og bilene"]
        df = spark.createDataFrame([(t,) for t in corpus], "t string")
        jvm = [
            r["toks"]
            for r in df.select(ANALYZERS[atype](F.col("t")).alias("toks")).collect()
        ]
        assert [PY_ANALYZERS[atype](t) for t in corpus] == jvm

    def test_pt_field_builds_and_serves(self, spark, tmp_path):
        from solr_map_reduce_spark.index_reader import SearchIndex
        from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
        from solr_map_reduce_spark.schema import Field, IndexSchema

        schema = IndexSchema(
            fields=(Field("id", "string", required=True), Field("text", "text_pt")),
            unique_key="id",
        )
        df = spark.createDataFrame(
            [("a", "Os gatos dormem"), ("b", "O cão corre no parque")],
            "id string, text string",
        )
        out = str(tmp_path / "pt_idx")
        IndexJob(
            IndexJobConfig(schema=schema, shards=2, dedup="none", routing="native")
        ).build(df, out)
        idx = SearchIndex.open(spark, out)
        assert idx.analyze_terms(["gatos"]) == ["gato"]
        assert sorted(
            r["id"] for r in idx.contains_any(idx.analyze_terms(["gatos"])).collect()
        ) == ["a"]


def test_danish_analyzer_goldens(spark):
    from solr_map_reduce_spark.functions.analyzers import (
        ANALYZERS,
        PY_ANALYZERS,
        danish_minimal_stem,
    )

    assert danish_minimal_stem("hundene") == "hund"
    assert danish_minimal_stem("husene") == "hus"
    assert danish_minimal_stem("bilen") == "bil"
    assert danish_minimal_stem("hus") == "hus"  # < 5 letters: untouched
    assert PY_ANALYZERS["text_da"]("alle hundene og husene") == ["hund", "hus"]
    # Column/kernel parity
    corpus = [None, "", "alle hundene løber hurtigt"]
    df = spark.createDataFrame([(t,) for t in corpus], "t string")
    jvm = [r["k"] for r in df.select(ANALYZERS["text_da"](F.col("t")).alias("k")).collect()]
    assert [PY_ANALYZERS["text_da"](t) for t in corpus] == jvm


def test_swedish_stop_list_keeps_english_us(spark):
    """Round-7 (ADVICE r6): 'us' is not a Swedish stop word (Snowball has
    'oss'); English 'us' tokens in mixed-language text must survive."""
    import pyspark.sql.functions as F

    from solr_map_reduce_spark.functions.analyzers import (
        SWEDISH_STOP_WORDS,
        tokenize_text_sv,
    )

    assert "us" not in SWEDISH_STOP_WORDS
    assert "oss" in SWEDISH_STOP_WORDS
    df = spark.createDataFrame([("kontakta us via oss",)], "t string")
    got = df.select(tokenize_text_sv(F.col("t")).alias("toks")).collect()[0]["toks"]
    assert "us" in got and "oss" not in got


def test_dutch_analyzer_goldens(spark):
    from solr_map_reduce_spark.functions.analyzers import (
        ANALYZERS,
        PY_ANALYZERS,
        dutch_minimal_stem,
    )

    assert dutch_minimal_stem("katten") == "katt"
    assert dutch_minimal_stem("kinderen") == "kind"
    assert dutch_minimal_stem("mogelijkheden") == "mogelijkheid"
    assert dutch_minimal_stem("boeken") == "boek"
    assert dutch_minimal_stem("kat") == "kat"  # short: untouched
    assert PY_ANALYZERS["text_nl"]("de katten en de boeken") == ["katt", "boek"]
    corpus = [None, "", "alle kinderen lezen boeken"]
    df = spark.createDataFrame([(t,) for t in corpus], "t string")
    jvm = [r["k"] for r in df.select(ANALYZERS["text_nl"](F.col("t")).alias("k")).collect()]
    assert [PY_ANALYZERS["text_nl"](t) for t in corpus] == jvm


def test_finnish_analyzer_goldens(spark):
    from solr_map_reduce_spark.functions.analyzers import (
        ANALYZERS,
        PY_ANALYZERS,
        finnish_minimal_stem,
    )

    assert finnish_minimal_stem("talossa") == "talo"   # inessive
    assert finnish_minimal_stem("taloissa") == "talo"  # plural inessive
    assert finnish_minimal_stem("autolla") == "auto"   # adessive
    assert finnish_minimal_stem("kissat") == "kissa"   # nominative plural
    assert finnish_minimal_stem("talo") == "talo"      # short: untouched
    assert PY_ANALYZERS["text_fi"]("kissat ja koirat talossa") == [
        "kissa", "koira", "talo"
    ]
    corpus = [None, "", "autolla taloissa ja kissat"]
    df = spark.createDataFrame([(t,) for t in corpus], "t string")
    jvm = [r["k"] for r in df.select(ANALYZERS["text_fi"](F.col("t")).alias("k")).collect()]
    assert [PY_ANALYZERS["text_fi"](t) for t in corpus] == jvm


def test_nl_fi_fields_build_and_serve(spark, tmp_path):
    from solr_map_reduce_spark.index_reader import SearchIndex
    from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
    from solr_map_reduce_spark.schema import Field, IndexSchema

    schema = IndexSchema(
        fields=(
            Field("id", "string", required=True),
            Field("nl", "text_nl"),
            Field("fi", "text_fi"),
        ),
        unique_key="id",
    )
    df = spark.createDataFrame(
        [("a", "de katten slapen", "kissat nukkuvat talossa"),
         ("b", "kinderen lezen boeken", "koirat juoksevat")],
        "id string, nl string, fi string",
    )
    out = str(tmp_path / "nlfi_idx")
    IndexJob(
        IndexJobConfig(schema=schema, shards=2, dedup="none", routing="native")
    ).build(df, out)
    idx = SearchIndex.open(spark, out)
    assert idx.analyze_terms(["katten"], field="nl") == ["katt"]
    assert idx.analyze_terms(["talossa"], field="fi") == ["talo"]
    assert sorted(r["id"] for r in idx.query("nl:katten").collect()) == ["a"]
    assert sorted(r["id"] for r in idx.query("fi:talossa").collect()) == ["a"]
    assert sorted(r["id"] for r in idx.query("nl:kinderen OR fi:koirat").collect()) == ["b"]


@pytest.mark.parametrize(
    "atype,text,want",
    [
        # книгами (instrumental pl) -> книг; старый -> стар
        ("text_ru", "старый книгами и", ["стар", "книг"]),
        # copiilor (gen/dat pl def) -> copi; cărțile -> cărț (conflates
        # with bare plural cărți -> cărț)
        ("text_ro", "copiilor și cărțile", ["copi", "cărț"]),
        ("text_ro", "cărți", ["cărț"]),
        # házban (inessive) -> ház; könyvek (plural) -> könyv
        ("text_hu", "a házban könyvek", ["ház", "könyv"]),
        # kitaplar -> kitap, evleri -> ev
        ("text_tr", "kitaplar ve evleri", ["kitap", "ev"]),
        # Turkish-aware case fold (Lucene TurkishLowerCaseFilter):
        # dotless I folds I->ı (KITAP -> kıtap, NOT kitap) and dotted
        # İ folds to i (İstanbul -> istanbul)
        ("text_tr", "KITAP İstanbul ILIK", ["kıtap", "istanbul", "ılık"]),
    ],
)
def test_r7_language_analyzer_goldens(spark, atype, text, want):
    from solr_map_reduce_spark.functions.analyzers import ANALYZERS, PY_ANALYZERS

    assert PY_ANALYZERS[atype](text) == want
    # Column/kernel parity incl. null/empty
    corpus = [None, "", text]
    df = spark.createDataFrame([(t,) for t in corpus], "t string")
    jvm = [r["k"] for r in df.select(ANALYZERS[atype](F.col("t")).alias("k")).collect()]
    assert [PY_ANALYZERS[atype](t) for t in corpus] == jvm


def test_r7_analyzed_types_registered():
    from solr_map_reduce_spark import indexing, schema

    for atype in ("text_ru", "text_ro", "text_hu", "text_tr"):
        assert atype in indexing.ANALYZED_TYPES
        assert atype in schema._TYPE_ALIASES


def test_jvm_python_tokenizer_parity_on_adversarial_unicode(spark):
    """The Column tokenizer (JVM regex [^\\p{L}\\p{N}]+) and its Python
    row kernel (re [^\\w]+|_) must agree on EVERY Unicode category edge:
    query-time analysis uses the Python twin while stored tokens come
    from the JVM one — any divergence is a term that can never match
    itself.  Cases cover Mn (combining marks), No/Nl (superscripts,
    circled digits, roman numerals), Cf (zero-width joiner), Pc
    (underscore — Python \\w includes it, hence the explicit |_),
    fullwidth forms, non-Latin digits, and curly apostrophes."""
    import pyspark.sql.functions as F

    from solr_map_reduce_spark.functions import analyzers as A

    cases = [
        "étude",            # e + combining acute (Mn)
        "x² y① z",          # superscript two, circled one (No)
        "a_b c_d", "_lead trail_",
        "Ⅵ roman",          # roman numeral (Nl)
        "km³ ⁰",
        "a‍b",          # zero-width joiner (Cf)
        "mc²e",
        "ＡＢ full",         # fullwidth (Lo/Lu variants)
        "१२३ देवनागरी",       # Devanagari digits + Mc vowel signs
        "store’s",           # curly apostrophe
        "", " ", "___",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    rows = df.select(
        "t", A.tokenize_text_general(F.col("t")).alias("toks")
    ).collect()
    for r in rows:
        assert list(r["toks"]) == A._py_text_general(r["t"]), repr(r["t"])
