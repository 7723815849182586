"""Text-classification tier (extensions/text_ml.py + the stream DSL's
features()/train()/model()/classify()): information-gain feature
selection, batch logistic regression, map-only classification — golden
against hand computation and the pure-Python reference twin."""

import math

import pyspark.sql.functions as F
import pytest

from solr_map_reduce_spark.extensions import text_ml
from solr_map_reduce_spark.extensions.search import QuerySyntaxError
from solr_map_reduce_spark.extensions.stream_expr import StreamCompiler
from solr_map_reduce_spark.index_reader import SearchIndex
from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
from solr_map_reduce_spark.schema import Field, IndexSchema

# a tiny separable corpus: "good" docs contain 'signal', "bad" ones
# 'noise'; 'common' appears everywhere (zero information gain)
DOCS = [
    ("1", "signal common alpha", 1),
    ("2", "signal common beta", 1),
    ("3", "signal common gamma", 1),
    ("4", "noise common alpha", 0),
    ("5", "noise common beta", 0),
    ("6", "noise common delta", 0),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    schema = IndexSchema(
        fields=(Field("id", "string", required=True),
                Field("text", "text_general"),
                Field("label", "long")),
        unique_key="id",
    )
    df = spark.createDataFrame(DOCS, "id string, text string, label long")
    out = str(tmp_path_factory.mktemp("mlidx") / "idx")
    IndexJob(IndexJobConfig(schema=schema, shards=1, dedup="none")).build(
        df, out
    )
    return SearchIndex.open(spark, out)


def _h(p):
    return 0.0 if p in (0.0, 1.0) else -(
        p * math.log(p) + (1 - p) * math.log(1 - p)
    )


class TestFeatures:
    def test_information_gain_matches_hand_computation(self, idx):
        rows = text_ml.select_features(
            idx, outcome="label", num_terms=10
        ).collect()
        by_term = {r["term"]: r for r in rows}
        # 'signal': present in 3 docs, all positive.  IG = H(3/6) -
        # [3/6*H(3/3) + 3/6*H(0/3)] = ln2
        assert by_term["signal"]["score"] == pytest.approx(
            round(_h(0.5), 10), abs=1e-9
        )
        # 'common': in every doc — conditioning changes nothing, IG = 0
        assert by_term["common"]["score"] == pytest.approx(0.0, abs=1e-9)
        # 'alpha': 1 pos + 1 neg of 2 → H(C|t) = H(C), IG = 0
        assert by_term["alpha"]["score"] == pytest.approx(0.0, abs=1e-9)
        # idf pinned: ln((n+1)/(df+1))
        assert by_term["signal"]["idf"] == pytest.approx(
            round(math.log(7 / 4), 10), abs=1e-9
        )
        assert by_term["signal"]["df"] == 3
        assert by_term["signal"]["pos_df"] == 3

    def test_ordering_index_and_num_terms(self, idx):
        rows = text_ml.select_features(
            idx, outcome="label", num_terms=2
        ).collect()
        assert len(rows) == 2
        # top two by IG are signal/noise (ties broken term asc)
        assert [r["term"] for r in rows] == ["noise", "signal"]
        assert [r["index"] for r in rows] == [0, 1]

    def test_plan_shape(self, idx):
        # groupBy(term) + broadcast 1-row totals + TakeOrdered — and no
        # distinct-aggregate Expand (the rejected rollup shape would
        # triple every exploded pair)
        plan = (
            text_ml.select_features(idx, outcome="label", num_terms=5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Expand" not in plan
        assert "TakeOrderedAndProject" in plan

    def test_min_df_and_q_domain(self, idx):
        rows = text_ml.select_features(
            idx, outcome="label", num_terms=10, min_df=2
        ).collect()
        assert {r["term"] for r in rows} == {"signal", "noise", "common",
                                             "alpha", "beta"}
        rows = text_ml.select_features(
            idx, outcome="label", num_terms=10, q="alpha OR beta"
        ).collect()
        assert all(r["df"] <= 4 for r in rows)


class TestTrain:
    def test_matches_pure_python_reference(self, idx):
        feats_df = text_ml.select_features(idx, outcome="label", num_terms=2)
        got = text_ml.train_logistic(
            idx, feats_df, outcome="label", max_iterations=5, alpha=0.5
        ).orderBy("iteration").collect()
        feats = [(r["term"], r["idf"])
                 for r in feats_df.orderBy("index").collect()]
        docs = [(t.split(), y) for _i, t, y in DOCS]
        want = text_ml.reference_train(
            docs, feats, max_iterations=5, alpha=0.5
        )
        assert len(got) == 5
        for g, w in zip(got, want):
            assert g["error"] == pytest.approx(w["error"], abs=1e-8)
            assert g["accuracy"] == pytest.approx(w["accuracy"], abs=1e-12)
            # term order may differ between the two weight vectors; the
            # reference uses feats order and train_logistic preserves it
            assert list(g["weights"]) == pytest.approx(
                w["weights"], abs=1e-8
            )
        # separable corpus: training error strictly decreases and the
        # last iteration classifies perfectly
        errs = [g["error"] for g in got]
        assert all(a > b for a, b in zip(errs, errs[1:]))
        assert got[-1]["accuracy"] == 1.0

    def test_model_tuple_shape(self, idx):
        feats = [("signal", 1.0), ("noise", 1.0)]
        out = text_ml.train_logistic(
            idx, feats, outcome="label", max_iterations=2, name="m1"
        ).collect()
        r = out[0]
        assert r["name"] == "m1"
        assert list(r["terms"]) == ["signal", "noise"]
        assert len(r["weights"]) == 3  # intercept + one per term
        assert len(r["idfs"]) == 2

    def test_empty_features_is_loud(self, idx):
        with pytest.raises(ValueError, match="at least one feature"):
            text_ml.train_logistic(idx, [], outcome="label")


class TestClassify:
    MODEL = {
        "name": "m", "terms": ["signal", "noise"],
        "weights": [-0.5, 2.0, -2.0], "idfs": [1.0, 1.0],
    }

    def test_probability_matches_hand_computation(self, idx):
        out = text_ml.classify_df(
            idx.df(), idx._real_toks(idx._tokens_col()), self.MODEL
        ).select("id", "score", "probability").collect()
        by_id = {r["id"]: r for r in out}
        # doc 1 has 'signal': margin = -0.5 + 2.0 = 1.5
        assert by_id["1"]["score"] == pytest.approx(1.5)
        assert by_id["1"]["probability"] == pytest.approx(
            1 / (1 + math.exp(-1.5)), abs=1e-9
        )
        # doc 4 has 'noise': margin = -0.5 - 2.0 = -2.5
        assert by_id["4"]["score"] == pytest.approx(-2.5)

    def test_classify_is_map_only(self, idx):
        plan = (
            text_ml.classify_df(
                idx.df(), idx._real_toks(idx._tokens_col()), self.MODEL
            )
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan  # zero shuffles at any corpus size

    def test_weight_arity_is_loud(self, idx):
        bad = dict(self.MODEL, weights=[0.1, 0.2])
        with pytest.raises(ValueError, match="intercept"):
            text_ml.classify_df(idx.df(), F.col("text__tokens"), bad)


class TestStreamDSL:
    @pytest.fixture()
    def comp(self, idx, spark):
        models = spark.createDataFrame(
            [("m", 1, ["signal", "noise"], [-0.5, 2.0, -2.0], [1.0, 1.0]),
             ("m", 2, ["signal", "noise"], [-0.4, 2.1, -2.1], [1.0, 1.0])],
            "name string, iteration int, terms array<string>, "
            "weights array<double>, idfs array<double>",
        )
        return StreamCompiler({"docs": idx, "models": models})

    def test_features_expression(self, comp):
        rows = comp.run(
            'features(docs, q="*:*", field=text, outcome=label, '
            "numTerms=2)"
        ).collect()
        assert [r["term"] for r in rows] == ["noise", "signal"]

    def test_train_expression_end_to_end(self, comp):
        rows = comp.run(
            "train(docs, features(docs, field=text, outcome=label, "
            "numTerms=2), field=text, outcome=label, maxIterations=3, "
            'name="lr1")'
        ).collect()
        assert [r["iteration"] for r in rows] == [1, 2, 3]
        assert rows[0]["name"] == "lr1"
        assert rows[-1]["accuracy"] == 1.0

    def test_model_picks_latest_iteration(self, comp):
        rows = comp.run('model(models, id="m")').collect()
        assert len(rows) == 1 and rows[0]["iteration"] == 2

    def test_classify_expression_stored_tokens(self, comp):
        rows = comp.run(
            'classify(model(models, id="m"), search(docs, q="*:*"), '
            "field=text)"
        ).collect()
        by_id = {r["id"]: r for r in rows}
        assert by_id["1"]["score"] == pytest.approx(-0.4 + 2.1)
        assert len(rows) == 6

    def test_classify_raw_text_fallback(self, idx, spark):
        # doc stream WITHOUT stored tokens: classify analyzes the raw
        # field with text_general
        plain = spark.createDataFrame(
            [("x", "SIGNAL flare"), ("y", "quiet noise")],
            "id string, text string",
        )
        comp = StreamCompiler({"docs": idx, "raw": plain,
                               "models": spark.createDataFrame(
                                   [("m", 1, ["signal", "noise"],
                                     [0.0, 1.0, -1.0], [1.0, 1.0])],
                                   "name string, iteration int, "
                                   "terms array<string>, "
                                   "weights array<double>, "
                                   "idfs array<double>")})
        rows = comp.run(
            'classify(model(models, id="m"), search(raw), field=text)'
        ).collect()
        by_id = {r["id"]: r for r in rows}
        assert by_id["x"]["score"] == pytest.approx(1.0)
        assert by_id["y"]["score"] == pytest.approx(-1.0)

    def test_errors_are_loud(self, comp):
        with pytest.raises(QuerySyntaxError, match="outcome="):
            comp.run("features(docs, field=text)")
        with pytest.raises(QuerySyntaxError, match="id="):
            comp.run("model(models)")
        with pytest.raises(QuerySyntaxError, match="field="):
            comp.run('classify(model(models, id="m"), search(docs))')
        with pytest.raises(QuerySyntaxError, match="model stream is empty"):
            comp.run(
                'classify(model(models, id="ghost"), search(docs), '
                "field=text)"
            )
        with pytest.raises(QuerySyntaxError, match="tuple shape"):
            comp.run(
                'classify(tuple(name="m", iteration=1), search(docs), '
                "field=text)"
            )
