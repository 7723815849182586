"""Solr function-query parser (search.parse_function_query) and the
{!frange} query type."""

import pytest


def _eval(spark, expr, **cols):
    from solr_map_reduce_spark.extensions.search import parse_function_query

    df = spark.createDataFrame(
        [tuple(cols.values())],
        ", ".join(f"{k} double" for k in cols) or "dummy_unused double",
    ) if cols else spark.range(1)
    return df.select(parse_function_query(expr).alias("v")).collect()[0]["v"]


class TestFunctionQueryParser:
    def test_arithmetic_core(self, spark):
        assert _eval(spark, "sum(1,2,3)") == 6.0
        assert _eval(spark, "product(2,3,4)") == 24.0
        assert _eval(spark, "sub(10,4)") == 6.0
        assert _eval(spark, "div(1,4)") == 0.25
        assert _eval(spark, "min(3,1,2)") == 1.0
        assert _eval(spark, "max(3,1,2)") == 3.0
        assert _eval(spark, "abs(-5)") == 5.0
        assert _eval(spark, "sqrt(16)") == 4.0
        assert _eval(spark, "pow(2,10)") == 1024.0
        assert _eval(spark, "log(100)") == 2.0          # Lucene: base 10
        assert _eval(spark, "ln(1)") == 0.0
        assert _eval(spark, "linear(5,2,1)") == 11.0     # m*x + c
        assert _eval(spark, "recip(0,1,2,1)") == 2.0     # a/(m*x+b)
        assert _eval(spark, "recip(9,1,2,1)") == 0.2

    def test_field_refs_and_nesting(self, spark):
        assert _eval(spark, "div(a, sum(b, 1))", a=10.0, b=4.0) == 2.0
        assert _eval(spark, "recip(a, 0.5, 3, 1)", a=4.0) == 1.0
        # scientific-notation literals (the canonical recency ms constant)
        assert _eval(spark, "product(2e2, 0.5)") == 100.0

    def test_conditional_family(self, spark):
        # if: test is TRUE when nonzero (Solr BoolFunction coercion)
        assert _eval(spark, "if(1, 10, 20)") == 10.0
        assert _eval(spark, "if(0, 10, 20)") == 20.0
        assert _eval(spark, "if(sub(3,3), 10, 20)") == 20.0
        # missing test -> false branch
        assert _eval(spark, "if(a, 10, 20)", a=None) == 20.0
        # exists / def over NULL field values
        assert _eval(spark, "exists(a)", a=5.0) == 1.0
        assert _eval(spark, "exists(a)", a=None) == 0.0
        assert _eval(spark, "def(a, 7)", a=None) == 7.0
        assert _eval(spark, "def(a, 7)", a=3.0) == 3.0
        # not: 1 when zero/missing
        assert _eval(spark, "not(0)") == 1.0
        assert _eval(spark, "not(2)") == 0.0
        assert _eval(spark, "not(a)", a=None) == 1.0
        # mod: Java truncated semantics (sign of dividend)
        assert _eval(spark, "mod(10, 3)") == 1.0
        assert _eval(spark, "mod(-10, 3)") == -1.0
        # map(x, min, max, target[, def]): in-range remaps, out-of-range
        # passes through (or takes def)
        assert _eval(spark, "map(5, 0, 10, 1)") == 1.0
        assert _eval(spark, "map(15, 0, 10, 1)") == 15.0
        assert _eval(spark, "map(15, 0, 10, 1, 0)") == 0.0
        assert _eval(spark, "map(a, 0, 10, 1, 0)", a=None) == 0.0
        # composition — one expression tree end-to-end
        assert _eval(spark, "if(exists(a), map(def(a,0),0,10,1), 0)",
                     a=5.0) == 1.0

    def test_errors_are_loud(self, spark):
        from solr_map_reduce_spark.extensions.search import (
            QuerySyntaxError,
            parse_function_query,
        )

        for bad in ("nope(1)", "sum(1", "recip(1,2)", "div(1,2) trailing",
                    "sum(1,)", "", "+", "sum()", "min(1)", "max()",
                    "if(1,2)", "map(1,2,3)", "map(1,2,3,4,5,6)",
                    "mod(1)", "not()", "def(1)", "exists()"):
            with pytest.raises(QuerySyntaxError):
                parse_function_query(bad)


class TestFrange:
    @pytest.fixture(scope="class")
    def fidx(self, spark, tmp_path_factory):
        from solr_map_reduce_spark.index_reader import SearchIndex
        from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
        from solr_map_reduce_spark.schema import Field, IndexSchema

        schema = IndexSchema(
            fields=(Field("id", "string", required=True), Field("num", "long")),
            unique_key="id",
        )
        df = spark.createDataFrame(
            [(str(i), i) for i in range(10)], "id string, num long"
        )
        out = str(tmp_path_factory.mktemp("fr") / "idx")
        IndexJob(IndexJobConfig(schema=schema, shards=2, dedup="none")).build(df, out)
        return SearchIndex.open(spark, out)

    def test_bounds_and_inclusivity(self, fidx):
        ids = sorted(int(r["id"]) for r in
                     fidx.query("{!frange l=2 u=4}num").collect())
        assert ids == [2, 3, 4]
        ids = sorted(int(r["id"]) for r in
                     fidx.query("{!frange l=2 u=4 incl=false incu=false}num").collect())
        assert ids == [3]
        # function value, not raw field: num/2 in [2, 3) -> num in [4, 6)
        ids = sorted(int(r["id"]) for r in
                     fidx.query("{!frange l=2 u=3 incu=false}div(num,2)").collect())
        assert ids == [4, 5]

    def test_missing_bounds_loud(self, fidx):
        from solr_map_reduce_spark.extensions.search import QuerySyntaxError

        with pytest.raises(QuerySyntaxError, match="l= and/or u="):
            fidx.query("{!frange}num")
