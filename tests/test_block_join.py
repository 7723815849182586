"""Local-params query types: {!join}, {!parent}, {!child} over a tiny
hand-built nested artifact — results checked against hand-derived sets,
errors loud, and composition with facet/search verified."""

import pytest


@pytest.fixture(scope="module")
def nidx(spark, tmp_path_factory):
    from solr_map_reduce_spark.index_reader import SearchIndex
    from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
    from solr_map_reduce_spark.schema import Field, IndexSchema

    schema = IndexSchema(
        fields=(
            Field("id", "string", required=True),
            Field("_root_", "string"),
            Field("kind", "string"),
            Field("grp", "string"),
            Field("num", "long"),
        ),
        unique_key="id",
    )
    # parents p1..p3; children cX-Y under each; p3 childless
    rows = [
        ("p1", "p1", "parent", "a", 0),
        ("p2", "p2", "parent", "b", 0),
        ("p3", "p3", "parent", "a", 0),
        ("c1-1", "p1", "child", "a", 5),
        ("c1-2", "p1", "child", "b", 50),
        ("c2-1", "p2", "child", "a", 7),
        ("c3x", None, "child", "b", 99),  # orphan: no root
    ]
    df = spark.createDataFrame(rows, "id string, _root_ string, kind string, grp string, num long")
    out = str(tmp_path_factory.mktemp("nested") / "idx")
    IndexJob(IndexJobConfig(schema=schema, shards=2, dedup="none")).build(df, out)
    return SearchIndex.open(spark, out)


def _ids(df):
    return sorted(r[0] for r in df.collect())


class TestBlockJoin:
    def test_parent_of_matching_children(self, nidx):
        # children with num >= 40: c1-2 (root p1), c3x (orphan) -> only p1
        assert _ids(nidx.query("{!parent which=kind:parent}num:[40 TO *]")) == ["p1"]

    def test_parent_all_children_when_inner_empty(self, nidx):
        # no inner query: every parent with at least one child
        assert _ids(nidx.query("{!parent which=kind:parent}")) == ["p1", "p2"]

    def test_child_of_matching_parents(self, nidx):
        # grp:a parents are p1 (children c1-1, c1-2) and childless p3
        assert _ids(nidx.query("{!child of=kind:parent}grp:a")) == [
            "c1-1", "c1-2"
        ]
        # narrowed to parents in grp b -> only p2's children
        assert _ids(nidx.query("{!child of=kind:parent}grp:b")) == ["c2-1"]

    def test_join_generic(self, nidx):
        # num>=50 rows are c1-2 and c3x, both grp=b -> every grp=b row
        got = _ids(nidx.query("{!join from=grp to=grp}num:[50 TO *]"))
        assert got == sorted(["p2", "c1-2", "c3x"])

    def test_errors_are_loud(self, nidx):
        from solr_map_reduce_spark.extensions.search import QuerySyntaxError

        with pytest.raises(QuerySyntaxError, match="from= and to="):
            nidx.query("{!join to=grp}num:[50 TO *]")
        with pytest.raises(QuerySyntaxError, match="inner query"):
            nidx.query("{!join from=grp to=grp}")
        with pytest.raises(QuerySyntaxError, match="which="):
            nidx.query("{!parent}num:5")
        with pytest.raises(QuerySyntaxError, match="unsupported"):
            nidx.query("{!xmlparser}x")
        with pytest.raises(QuerySyntaxError, match="malformed"):
            nidx.query("{!parent which=kind:parent oops")

    def test_composes_with_facet_and_search(self, nidx):
        # facet over a block-join result set
        got = {r["grp"]: r["cnt"]
               for r in nidx.facet("grp", q="{!child of=kind:parent}grp:a").collect()}
        assert got == {"a": 1, "b": 1}
        rows = nidx.search(q="{!parent which=kind:parent}num:[40 TO *]",
                           select=["id", "grp"]).collect()
        assert [(r["id"], r["grp"]) for r in rows] == [("p1", "a")]


class TestRawFieldParsers:
    """{!terms} / {!prefix} / {!field}: raw un-analyzed column predicates."""

    def test_terms_parser(self, nidx):
        assert _ids(nidx.query("{!terms f=grp}b")) == ["c1-2", "c3x", "p2"]
        assert _ids(nidx.query("{!terms f=kind}parent")) == ["p1", "p2", "p3"]
        # custom separator
        assert _ids(nidx.query("{!terms f=grp separator=|}a|b")) == sorted(
            ["p1", "p2", "p3", "c1-1", "c1-2", "c2-1", "c3x"]
        )

    def test_prefix_and_field_parsers(self, nidx):
        assert _ids(nidx.query("{!prefix f=id}c1")) == ["c1-1", "c1-2"]
        assert _ids(nidx.query("{!field f=id}p2")) == ["p2"]

    def test_missing_f_is_loud(self, nidx):
        from solr_map_reduce_spark.extensions.search import QuerySyntaxError
        import pytest

        for q in ("{!terms}a,b", "{!prefix}x", "{!field}x"):
            with pytest.raises(QuerySyntaxError, match="f= param"):
                nidx.query(q)

    def test_terms_filter_pushed_to_scan(self, nidx):
        plan = (
            nidx._query_scan("{!terms f=grp}a,b")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PushedFilters" in plan and "In(grp" in plan, plan


class TestJsonFacetBlockDomain:
    def test_block_children_domain(self, nidx):
        # domain grp:a restricted to parents (p1, p3) -> their children:
        # c1-1 (grp a), c1-2 (grp b); the orphan and p2's child drop
        rows = nidx.json_facet({
            "type": "terms", "field": "grp", "sort": "index asc",
            "domain": {"filter": "grp:a", "blockChildren": "kind:parent"},
        }).collect()
        assert {(r["grp"], r["count"]) for r in rows} == {("a", 1), ("b", 1)}

    def test_block_parent_domain(self, nidx):
        # child domain num:[7 TO *] = c1-2, c2-1, c3x (orphan, no root)
        # -> parents p1 (grp a), p2 (grp b)
        rows = nidx.json_facet({
            "type": "terms", "field": "grp", "sort": "index asc",
            "domain": {"filter": "num:[7 TO *]",
                       "blockParent": "kind:parent"},
        }).collect()
        assert {(r["grp"], r["count"]) for r in rows} == {("a", 1), ("b", 1)}

    def test_block_keys_mutually_exclusive(self, nidx):
        import pytest

        with pytest.raises(ValueError, match="mutually exclusive"):
            nidx.json_facet({
                "type": "terms", "field": "grp",
                "domain": {"blockChildren": "kind:parent",
                           "blockParent": "kind:parent"},
            })

    def test_stats_ride_the_mapped_domain(self, nidx):
        rows = nidx.json_facet({
            "type": "terms", "field": "grp", "sort": "index asc",
            "domain": {"filter": "grp:a", "blockChildren": "kind:parent"},
            "facet": {"mx": "max(num)"},
        }).collect()
        got = {r["grp"]: r["mx"] for r in rows}
        assert got == {"a": 5, "b": 50}
