"""Solr field collapsing + expand: SearchIndex.collapse / .expand and
the {!collapse} local-params query type (CollapsingQParserPlugin — ref
solr-map-reduce's Solr query contract; score-based head selection has no
relational analog so the min=/max=/sort= criterion is required)."""

import pytest

from solr_map_reduce_spark.extensions.search import QuerySyntaxError
from solr_map_reduce_spark.index_reader import SearchIndex
from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
from solr_map_reduce_spark.schema import Field, IndexSchema


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    schema = IndexSchema(
        fields=(Field("id", "string", required=True),
                Field("text", "text_general"),
                Field("grp", "string"),
                Field("n", "long"),
                Field("m", "long")),
        unique_key="id",
    )
    rows = [
        # grp a: head by max(n) = a3
        ("a1", "spark alpha", "a", 10, 7),
        ("a2", "spark beta", "a", 20, 5),
        ("a3", "spark gamma", "a", 30, 1),
        # grp b: n has a null — null metric must not beat 40
        ("b1", "other", "b", 40, 9),
        ("b2", "other", "b", None, 2),
        # grp c: ALL metric values null — still yields a head (id tiebreak)
        ("c1", "misc", "c", None, 3),
        ("c2", "misc", "c", None, 8),
        # null collapse field
        ("x1", "loose one", None, 99, 4),
        ("x2", "loose two", None, 98, 6),
    ]
    df = spark.createDataFrame(
        rows, "id string, text string, grp string, n long, m long"
    )
    out = str(tmp_path_factory.mktemp("collapse") / "idx")
    IndexJob(IndexJobConfig(schema=schema, shards=1, dedup="none")).build(df, out)
    return SearchIndex.open(spark, out)


class TestCollapse:
    def test_max_head_per_group(self, idx):
        got = {r["grp"]: r["id"]
               for r in idx.collapse("grp", max="n").collect()}
        # nullPolicy=ignore (default): x1/x2 dropped
        assert got == {"a": "a3", "b": "b1", "c": "c2"}

    def test_min_null_metric_never_wins(self, idx):
        got = {r["grp"]: r["id"]
               for r in idx.collapse("grp", min="n").collect()}
        # b: min(n)=40 (b2's null loses); c: all-null -> least id
        assert got == {"a": "a1", "b": "b1", "c": "c1"}

    def test_max_function_query_metric(self, idx):
        # max=sum(n,m): a1=17, a2=25, a3=31 -> a3; b1=49; c all-null sums
        got = {r["grp"]: r["id"]
               for r in idx.collapse("grp", max="sum(n,m)").collect()}
        assert got["a"] == "a3" and got["b"] == "b1"

    def test_compound_sort_criterion(self, idx):
        got = {r["grp"]: r["id"]
               for r in idx.collapse(
                   "grp", sort=[("m", "desc"), ("n", "asc")]).collect()}
        # a: m desc -> a1(7); b: b1(9); c: c2(8)
        assert got == {"a": "a1", "b": "b1", "c": "c2"}

    def test_null_policy_expand_passes_nulls_through(self, idx):
        ids = {r["id"] for r in
               idx.collapse("grp", max="n", null_policy="expand").collect()}
        assert ids == {"a3", "b1", "c2", "x1", "x2"}

    def test_null_policy_collapse_pools_nulls(self, idx):
        rows = idx.collapse("grp", max="n", null_policy="collapse").collect()
        got = {r["grp"]: r["id"] for r in rows}
        assert got[None] == "x1"  # max n=99 among the null group
        assert len(rows) == 4

    def test_q_scopes_the_domain(self, idx):
        got = {r["grp"]: r["id"]
               for r in idx.collapse("grp", max="n", q="spark").collect()}
        assert got == {"a": "a3"}

    def test_filters_scope_the_domain(self, idx):
        got = {r["grp"]: r["id"] for r in
               idx.collapse("grp", min="n", filters={"m": [5, 7, 9]})
               .collect()}
        assert got == {"a": "a1", "b": "b1"}

    def test_local_params_syntax(self, idx):
        # query() projects to the unique key (Solr's id-list response)
        ids = {r["id"] for r in
               idx.query("{!collapse field=grp max=n}").collect()}
        assert ids == {"a3", "b1", "c2"}

    def test_local_params_sort_and_inner_query(self, idx):
        ids = {r["id"] for r in
               idx.query("{!collapse field=grp sort='m desc'}spark")
               .collect()}
        assert ids == {"a1"}

    def test_minmax_path_is_aggregate_not_window(self, idx):
        # design-for-scale: the min=/max= head selection must compile to
        # a map-side-combined aggregate (partial max_by before the
        # exchange), never a full-row window shuffle
        plan = (idx.collapse("grp", max="n")
                ._jdf.queryExecution().executedPlan().toString())
        assert "max_by" in plan and "partial_max_by" in plan.lower()
        assert "Window" not in plan

    def test_errors(self, idx):
        with pytest.raises(ValueError, match="exactly one head criterion"):
            idx.collapse("grp")
        with pytest.raises(ValueError, match="exactly one head criterion"):
            idx.collapse("grp", max="n", min="m")
        with pytest.raises(ValueError, match="null_policy"):
            idx.collapse("grp", max="n", null_policy="zap")
        with pytest.raises(QuerySyntaxError, match="field="):
            idx.query("{!collapse max=n}")
        with pytest.raises(QuerySyntaxError, match="exactly one"):
            idx.query("{!collapse field=grp}")


class TestExpand:
    def test_expand_is_the_complement_of_collapse(self, idx):
        heads = {r["id"] for r in idx.collapse("grp", max="n").collect()}
        rest = {r["id"] for r in idx.expand("grp", max="n").collect()}
        assert heads & rest == set()
        assert heads | rest == {"a1", "a2", "a3", "b1", "b2", "c1", "c2"}

    def test_default_order_follows_head_criterion(self, idx):
        rows = idx.expand("grp", max="n").collect()
        a = [(r["id"], r["_rk"]) for r in rows if r["grp"] == "a"]
        # head a3 removed; remaining by n desc: a2 (rk 1), a1 (rk 2)
        assert sorted(a, key=lambda t: t[1]) == [("a2", 1), ("a1", 2)]

    def test_rows_caps_each_group(self, idx):
        rows = idx.expand("grp", max="n", rows=1).collect()
        per_group = {}
        for r in rows:
            per_group.setdefault(r["grp"], []).append(r["id"])
        assert per_group["a"] == ["a2"] and per_group["b"] == ["b2"]

    def test_expand_sort_overrides_order(self, idx):
        rows = idx.expand(
            "grp", max="n", expand_sort=[("m", "asc")]).collect()
        a = [(r["id"], r["_rk"]) for r in rows if r["grp"] == "a"]
        # among a1(m=7), a2(m=5): m asc -> a2 rk1, a1 rk2
        assert sorted(a, key=lambda t: t[1]) == [("a2", 1), ("a1", 2)]

    def test_null_field_docs_never_expand(self, idx):
        ids = {r["id"] for r in idx.expand("grp", max="n").collect()}
        assert "x1" not in ids and "x2" not in ids

    def test_q_scoping(self, idx):
        ids = {r["id"] for r in idx.expand("grp", max="n", q="spark")
               .collect()}
        assert ids == {"a1", "a2"}

    def test_select_projection(self, idx):
        rows = idx.expand("grp", max="n", select=["id"]).collect()
        assert set(rows[0].asDict()) == {"grp", "_rk", "id"}


class TestAliasCollapse:
    def test_collapse_is_relational_across_members(self, spark, tmp_path):
        # a group spanning two alias members must yield ONE head — a
        # per-member collapse unioned would emit two
        from solr_map_reduce_spark.index_reader import MultiIndex
        from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
        from solr_map_reduce_spark.schema import Field, IndexSchema

        schema = IndexSchema(
            fields=(Field("id", "string", required=True),
                    Field("text", "text_general"),
                    Field("grp", "string"),
                    Field("n", "long")),
            unique_key="id",
        )
        slices = [
            [("d1", "spark a", "g1", 10), ("d2", "spark b", "g2", 5)],
            [("d3", "spark c", "g1", 99), ("d4", "spark d", "g2", 1)],
        ]
        paths = []
        for i, rows in enumerate(slices):
            df = spark.createDataFrame(
                rows, "id string, text string, grp string, n long")
            out = str(tmp_path / f"m{i}")
            IndexJob(IndexJobConfig(schema=schema, shards=1,
                                    dedup="none")).build(df, out)
            paths.append(out)
        alias = MultiIndex.open(spark, paths)
        ids = {r["id"] for r in
               alias.query("{!collapse field=grp max=n}").collect()}
        # g1 head: d3 (99, in member 2); g2 head: d2 (5, in member 1)
        assert ids == {"d3", "d2"}


class TestCollapsePropertyParity:
    def test_aggregate_path_equals_window_reference(self, spark, idx):
        # hypothesis-driven: on random (group, metric-with-nulls) data,
        # the map-side max_by/min_by head selection must pick EXACTLY
        # the doc a row_number window over the documented ordering
        # picks — including null-metric and unique-key tie rules
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from pyspark.sql import Window
        import pyspark.sql.functions as F

        rows_st = st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=4),          # group
                st.one_of(st.none(),
                          st.integers(min_value=-5, max_value=5)),  # metric
            ),
            min_size=1, max_size=12,
        )

        @settings(max_examples=15, deadline=None)
        @given(rows_st)
        def run(rows):
            data = [(f"d{i}", f"g{g}", n) for i, (g, n) in enumerate(rows)]
            df = spark.createDataFrame(data, "id string, grp string, n long")
            got = {r["grp"]: r["id"] for r in
                   idx._collapse_heads(df, "grp", "n", None, None).collect()}
            w = Window.partitionBy("grp").orderBy(
                F.col("n").isNotNull().desc(), F.desc("n"), F.desc("id")
            )
            want = {r["grp"]: r["id"] for r in
                    df.withColumn("_rk", F.row_number().over(w))
                    .filter(F.col("_rk") == 1).collect()}
            assert got == want

        run()
