"""Relevance function queries — Solr's termfreq/docfreq/idf over the
analyze-once token columns and the _vocab dictionary sidecar, wired
through the function-query grammar's index context."""

import math

import pytest
from pyspark.sql import functions as F

from solr_map_reduce_spark.extensions.search import (
    QuerySyntaxError,
    parse_function_query,
)
from solr_map_reduce_spark.index_reader import SearchIndex
from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
from solr_map_reduce_spark.schema import Field, IndexSchema


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    schema = IndexSchema(
        fields=(Field("id", "string", required=True),
                Field("text", "text_general"),
                Field("n", "long")),
        unique_key="id",
    )
    rows = [
        ("1", "spark spark spark rows", 1),
        ("2", "spark cols", 2),
        ("3", "other rows", 3),
        ("4", None, 4),
    ]
    df = spark.createDataFrame(rows, "id string, text string, n long")
    out = str(tmp_path_factory.mktemp("relfq") / "idx")
    IndexJob(IndexJobConfig(schema=schema, shards=1, dedup="none",
                            search_stats=True)).build(df, out)
    return SearchIndex.open(spark, out)


class TestTermfreq:
    def test_counts_occurrences_per_row(self, idx):
        rows = idx.search(sort=[("termfreq(text,spark)", "desc")],
                          select=["id"]).collect()
        assert rows[0]["id"] == "1"  # tf=3, then tf=1 (doc 2), then 0s

    def test_null_tokens_count_zero(self, idx):
        rows = idx.search(sort=[("termfreq(text,spark)", "asc")],
                          select=["id"]).collect()
        assert rows[0]["id"] in ("3", "4")  # both tf=0, null text counts 0

    def test_quoted_term(self, idx):
        a = idx.search(sort=[("termfreq(text,'spark')", "desc")],
                       select=["id"]).collect()
        b = idx.search(sort=[("termfreq(text,spark)", "desc")],
                       select=["id"]).collect()
        assert [r["id"] for r in a] == [r["id"] for r in b]

    def test_composes_with_arithmetic(self, idx):
        # sum(termfreq, n): doc1 3+1=4, doc2 1+2=3, doc3 0+3=3, doc4 0+4=4
        rows = idx.search(
            sort=[("sum(termfreq(text,spark),n)", "desc")],
            select=["id"]).collect()
        assert {rows[0]["id"], rows[1]["id"]} == {"1", "4"}


class TestDocfreqIdf:
    def test_docfreq_is_a_plan_literal(self, idx):
        df = idx.search(sort=[("docfreq(text,spark)", "desc")],
                        select=["id"])
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "vocab" not in plan.lower()  # resolved driver-side
        # frange over the constant: all docs when df >= 2 (spark in 2 docs)
        assert idx.query("{!frange l=2 u=2}docfreq(text,spark)").count() == 4
        assert idx.query("{!frange l=3}docfreq(text,spark)").count() == 0

    def test_idf_matches_bm25_formula(self, idx):
        # spark: df=2, N=4 -> ln(1 + (4-2+0.5)/(2+0.5)) = ln(2)
        got = idx.query(
            "{!frange l=%.15g u=%.15g}idf(text,spark)"
            % (math.log(2) - 1e-9, math.log(2) + 1e-9)
        ).count()
        assert got == 4

    def test_unseen_term_df_zero(self, idx):
        assert idx.query("{!frange u=0}docfreq(text,zebra)").count() == 4


class TestErrors:
    def test_needs_context(self):
        with pytest.raises(QuerySyntaxError, match="index context"):
            parse_function_query("termfreq(text,spark)")

    def test_classic_stats_are_loud(self, idx):
        for fn in ("ttf", "tf", "norm"):
            with pytest.raises(QuerySyntaxError, match="does not store"):
                idx.search(sort=[(f"{fn}(text,spark)", "desc")])

    def test_arg_shape_errors(self, idx):
        with pytest.raises(QuerySyntaxError, match="field name first"):
            idx.search(sort=[("termfreq(1,spark)", "desc")])
        with pytest.raises(QuerySyntaxError, match="exactly"):
            idx.search(sort=[("termfreq(text,spark,extra)", "desc")])
        with pytest.raises(QuerySyntaxError, match="string literals"):
            parse_function_query("sum('a', 1)")

    def test_ltr_feature_uses_context(self, idx):
        from solr_map_reduce_spark.extensions.ltr import Feature, LinearModel

        rows = idx.ltr_rerank(
            LinearModel({"tf": 1.0}),
            {"tf": Feature("termfreq(text,spark)")},
            pool_sort=[("n", "asc")], rq=10, k=1, select=["id"],
        ).collect()
        assert rows[0]["id"] == "1" and rows[0]["ltr_score"] == 3.0


class TestMs:
    def test_ms_now_is_fixed_now_literal(self, spark):
        from datetime import datetime, timezone

        from solr_map_reduce_spark.functions.datemath import fixed_now

        with fixed_now(datetime(2024, 1, 10)):
            col = parse_function_query("ms()")
        row = spark.range(1).select(col.alias("v")).collect()[0]
        want = datetime(2024, 1, 10, tzinfo=timezone.utc).timestamp() * 1000
        assert row["v"] == want

    def test_ms_field_and_delta(self, spark):
        from datetime import datetime

        from solr_map_reduce_spark.functions.datemath import fixed_now

        df = spark.createDataFrame(
            [(1, datetime(2024, 1, 9, 12))], "id long, ts timestamp"
        )
        with fixed_now(datetime(2024, 1, 10)):
            col = parse_function_query("ms(NOW,ts)")
        row = df.select(col.alias("v")).collect()[0]
        assert row["v"] == 12 * 3600 * 1000.0  # half a day in millis

    def test_ms_date_math_both_sides(self, spark):
        from datetime import datetime

        from solr_map_reduce_spark.functions.datemath import fixed_now

        with fixed_now(datetime(2024, 1, 10, 7, 30)):
            col = parse_function_query("ms(NOW/DAY+1DAY,NOW/DAY)")
        row = spark.range(1).select(col.alias("v")).collect()[0]
        assert row["v"] == 24 * 3600 * 1000.0

    def test_recency_boost_composes(self, spark):
        from datetime import datetime

        from solr_map_reduce_spark.functions.datemath import fixed_now

        df = spark.createDataFrame(
            [(1, datetime(2024, 1, 9)), (2, datetime(2024, 1, 5)),
             (3, datetime(2024, 1, 10))],
            "id long, ts timestamp",
        )
        with fixed_now(datetime(2024, 1, 10)):
            col = parse_function_query("recip(ms(NOW,ts),3.17e-11,1,1)")
        rows = df.select("id", col.alias("boost")).orderBy(
            F.desc("boost")).collect()
        assert [r["id"] for r in rows] == [3, 1, 2]  # newest first

    def test_ms_errors(self):
        with pytest.raises(QuerySyntaxError, match="0-2 date args"):
            parse_function_query("ms(a,b,c)")
        with pytest.raises(QuerySyntaxError, match="0-2 date args"):
            parse_function_query("ms(a,)")
        with pytest.raises(QuerySyntaxError, match="ms\\(\\) arg"):
            parse_function_query("ms('not a date!')")


class TestLuke:
    def test_index_and_field_report(self, idx):
        rpt = idx.luke(top_terms=3)
        assert rpt["num_docs"] == 4
        assert rpt["unique_key"] == "id"
        f = rpt["fields"]
        assert f["n"]["type"] == "bigint" and f["n"]["docs"] == 4
        assert f["text"]["docs"] == 3  # one null text
        assert not f["n"]["multi_valued"]
        assert "__" not in "".join(f)  # internal/token columns hidden
        # top terms ride the _vocab sidecar: df-ranked
        tops = rpt["top_terms"]["text"]
        assert tops and tops[0][0] in ("spark", "rows")
        assert all(df_ >= 1 for _t, df_ in tops)
