import pyspark.sql.functions as F

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
