"""Learning-To-Rank rescoring (extensions/ltr.py): Solr LTR contrib
semantics — feature compilation, MinMax/Standard normalizers, linear and
additive-trees models as ONE codegen Column, bounded-pool rescore."""

import pytest
from pyspark.sql import functions as F

from solr_map_reduce_spark.extensions.ltr import (
    AdditiveTreesModel,
    Feature,
    LinearModel,
    TreeNode,
    ltr_rescore,
)


@pytest.fixture(scope="module")
def pool(spark):
    return spark.createDataFrame(
        [("d1", 100, "en"), ("d2", 300, "fr"), ("d3", 200, "en"),
         ("d4", None, "en")],
        "id string, len int, lang string",
    )


@pytest.fixture(scope="module")
def feats(spark):
    # Column-typed features need an active session (F.when at build time)
    return {
        "len_n": Feature("len",
                         norm={"type": "minmax", "min": 0, "max": 400}),
        "is_en": Feature(F.when(F.col("lang") == "en", 1.0).otherwise(0.0)),
    }


class TestLinear:
    def test_weighted_sum_orders_pool(self, pool, feats):
        model = LinearModel({"len_n": 1.0, "is_en": 0.5})
        rows = ltr_rescore(pool, model, feats, tiebreak="id").collect()
        # d3: 0.5+0.5=1.0; d2: 0.75; d1: 0.25+0.5=0.75; d4: 0+0.5=0.5
        # tie d1/d2 at 0.75 -> id asc: d1 before d2
        assert [r["id"] for r in rows] == ["d3", "d1", "d2", "d4"]
        assert rows[0]["ltr_score"] == pytest.approx(1.0)

    def test_default_replaces_null(self, pool):
        model = LinearModel({"len_n": 1.0})
        feats = {"len_n": Feature("len", default=400.0,
                                  norm={"type": "minmax", "min": 0,
                                        "max": 400})}
        rows = ltr_rescore(pool, model, feats, tiebreak="id").collect()
        assert rows[0]["id"] == "d4"  # null len -> default 400 -> top

    def test_standard_normalizer(self, pool):
        feats = {"z": Feature("len", norm={"type": "standard",
                                           "avg": 200.0, "std": 100.0})}
        rows = ltr_rescore(pool, LinearModel({"z": 1.0}), feats,
                           tiebreak="id").collect()
        got = {r["id"]: r["ltr_score"] for r in rows}
        assert got["d1"] == pytest.approx(-1.0)
        assert got["d2"] == pytest.approx(1.0)

    def test_k_truncates(self, pool, feats):
        model = LinearModel({"is_en": 1.0})
        assert ltr_rescore(pool, model, feats, k=2,
                           tiebreak="id").count() == 2

    def test_function_query_feature(self, pool):
        feats = {"lg": Feature("log(len)", default=0.0)}
        rows = ltr_rescore(pool, LinearModel({"lg": 1.0}), feats,
                           tiebreak="id").collect()
        assert rows[0]["id"] == "d2"  # log10(300) largest

    def test_errors(self, pool, feats):
        with pytest.raises(ValueError, match="unknown features"):
            ltr_rescore(pool, LinearModel({"nope": 1.0}), feats)
        with pytest.raises(ValueError, match="at least one feature"):
            ltr_rescore(pool, LinearModel({}), {})
        with pytest.raises(ValueError, match="unknown normalizer"):
            Feature("len", norm={"type": "zap"}).col()
        with pytest.raises(ValueError, match="max > min"):
            Feature("len", norm={"type": "minmax", "min": 1, "max": 1}).col()
        with pytest.raises(ValueError, match="std > 0"):
            Feature("len", norm={"type": "standard", "avg": 0,
                                 "std": 0}).col()


TREES_JSON = {
    "trees": [
        {"weight": "1.0",
         "root": {"feature": "len_n", "threshold": "0.5",
                  "left": {"value": "0.1"}, "right": {"value": "0.5"}}},
        {"weight": "2.0",
         "root": {"feature": "is_en", "threshold": "0.5",
                  "left": {"feature": "len_n", "threshold": "0.25",
                           "left": {"value": "0.0"},
                           "right": {"value": "0.2"}},
                  "right": {"value": "0.3"}}},
    ]
}


class TestTrees:
    def test_from_json_and_eval(self, pool, feats):
        model = AdditiveTreesModel.from_json(TREES_JSON)
        rows = ltr_rescore(pool, model, feats, tiebreak="id").collect()
        got = {r["id"]: r["ltr_score"] for r in rows}
        # d1: len_n=.25<=.5 ->0.1; en -> 0.3*2 => 0.7
        # d2: len_n=.75 ->0.5; fr, len_n>.25 -> 0.2*2 => 0.9
        # d3: len_n=.5<=.5 ->0.1; en ->0.6 => 0.7
        # d4: len_n=0 ->0.1; en ->0.6 => 0.7
        assert got["d2"] == pytest.approx(0.9)
        assert got["d1"] == got["d3"] == got["d4"] == pytest.approx(0.7)
        assert [r["id"] for r in rows][0] == "d2"

    def test_branch_rule_is_lte_left(self, pool, feats):
        # exactly-at-threshold goes LEFT (Solr's documented <= rule):
        # d3 has len_n == 0.5 and must take tree 1's left leaf (0.1)
        t = AdditiveTreesModel(trees=((1.0, TreeNode.from_dict(
            TREES_JSON["trees"][0]["root"])),))
        got = {r["id"]: r["ltr_score"] for r in
               ltr_rescore(pool, t, feats, tiebreak="id").collect()}
        assert got["d3"] == pytest.approx(0.1)

    def test_no_udf_in_plan(self, pool, feats):
        model = AdditiveTreesModel.from_json(TREES_JSON)
        plan = (ltr_rescore(pool, model, feats, tiebreak="id")
                ._jdf.queryExecution().executedPlan().toString())
        assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
        assert "CASE WHEN" in plan

    def test_malformed_json_is_loud(self):
        with pytest.raises(ValueError, match="trees="):
            AdditiveTreesModel.from_json({})
        with pytest.raises(ValueError, match="value= or feature"):
            TreeNode.from_dict({"feature": "x"})
        with pytest.raises(ValueError, match="unknown feature"):
            AdditiveTreesModel(trees=((1.0, TreeNode(
                feature="zap", threshold=0.5,
                left=TreeNode(value=0.0),
                right=TreeNode(value=1.0))),)).score_col(
                {"len_n": F.lit(1.0)})


class TestIndexIntegration:
    def test_ltr_rerank_request_shape(self, spark, tmp_path):
        from solr_map_reduce_spark.index_reader import SearchIndex
        from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
        from solr_map_reduce_spark.schema import Field, IndexSchema

        schema = IndexSchema(
            fields=(Field("id", "string", required=True),
                    Field("text", "text_general"),
                    Field("len", "long"),
                    Field("lang", "string")),
            unique_key="id",
        )
        df = spark.createDataFrame(
            [("a", "spark spark", 100, "en"), ("b", "spark", 300, "fr"),
             ("c", "spark row", 200, "en"), ("d", "other", 400, "en")],
            "id string, text string, len long, lang string",
        )
        out = str(tmp_path / "ltridx")
        IndexJob(IndexJobConfig(schema=schema, shards=1,
                                dedup="none")).build(df, out)
        idx = SearchIndex.open(spark, out)
        rows = idx.ltr_rerank(
            LinearModel({"len_n": 1.0, "is_en": 0.5}),
            {"len_n": Feature("len", norm={"type": "minmax", "min": 0,
                                           "max": 400}),
             "is_en": Feature(F.when(F.col("lang") == "en", 1.0)
                              .otherwise(0.0))},
            pool_sort=[("len", "desc")], rq=3, k=2, q="spark",
            select=["id"],
        ).collect()
        # q=spark -> a,b,c; pool top-3 by len: b(300),c(200),a(100)
        # scores: b .75, c 1.0, a .75+... a: .25+.5=.75 tie with b -> id asc
        assert [r["id"] for r in rows] == ["c", "a"]
        assert set(rows[0].asDict()) == {"id", "ltr_score"}


class TestSolrStoreLoaders:
    def test_load_linear_model_with_norms(self, pool):
        from solr_map_reduce_spark.extensions.ltr import (
            load_solr_features,
            load_solr_model,
        )

        feats = load_solr_features([
            {"name": "len", "class": "org.apache.solr.ltr.feature."
             "FieldValueFeature", "params": {"field": "len"}},
            {"name": "one", "class": "org.apache.solr.ltr.feature."
             "ValueFeature", "params": {"value": 1.0}},
            {"name": "lg", "class": "org.apache.solr.ltr.feature."
             "SolrFeature", "params": {"q": "{!func}log(len)"}},
        ])
        model, norms = load_solr_model({
            "class": "org.apache.solr.ltr.model.LinearModel",
            "name": "m1",
            "features": [
                {"name": "len",
                 "norm": {"class": "org.apache.solr.ltr.norm."
                          "MinMaxNormalizer",
                          "params": {"min": "0", "max": "400"}}},
                {"name": "one",
                 "norm": {"class": "org.apache.solr.ltr.norm."
                          "IdentityNormalizer"}},
            ],
            "params": {"weights": {"len": "1.0", "one": "0.5"}},
        })
        # fold the model's norms into the features (model-scoped in Solr)
        from solr_map_reduce_spark.extensions.ltr import Feature, ltr_rescore

        feats = {n: Feature(f.expr, f.default, norms.get(n))
                 for n, f in feats.items()}
        rows = ltr_rescore(pool, model, feats, tiebreak="id").collect()
        got = {r["id"]: r["ltr_score"] for r in rows}
        # d2: 300/400 + 0.5 = 1.25 top
        assert got["d2"] == pytest.approx(1.25)
        assert rows[0]["id"] == "d2"

    def test_load_trees_model(self, pool, feats):
        from solr_map_reduce_spark.extensions.ltr import (
            load_solr_model,
            ltr_rescore,
        )

        model, norms = load_solr_model({
            "class": "org.apache.solr.ltr.model."
                     "MultipleAdditiveTreesModel",
            "params": TREES_JSON,
        })
        assert norms == {}
        got = {r["id"]: r["ltr_score"] for r in
               ltr_rescore(pool, model, feats, tiebreak="id").collect()}
        assert got["d2"] == pytest.approx(0.9)

    def test_loader_errors_are_loud(self):
        from solr_map_reduce_spark.extensions.ltr import (
            load_solr_features,
            load_solr_model,
        )

        with pytest.raises(ValueError, match="unsupported model class"):
            load_solr_model({"class": "x.NeuralNetworkModel", "params": {}})
        with pytest.raises(ValueError, match="weights="):
            load_solr_model({"class": "x.LinearModel", "params": {}})
        with pytest.raises(ValueError, match="unsupported feature class"):
            load_solr_features([{"name": "f", "class": "x.Original"
                                 "ScoreFeature", "params": {}}])
        with pytest.raises(ValueError, match="function-query features"):
            load_solr_features([{"name": "f", "class": "x.SolrFeature",
                                 "params": {"q": "title:hello"}}])
        with pytest.raises(ValueError, match="unsupported normalizer"):
            load_solr_model({
                "class": "x.LinearModel",
                "features": [{"name": "f", "norm": {"class": "x.ZapNorm"}}],
                "params": {"weights": {"f": 1.0}},
            })
