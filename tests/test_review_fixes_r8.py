"""Round-8 end-of-round code-review regressions: each test pins a fix to
a reviewed defect — phrase adjacency on rev-marked token arrays via the
PUBLIC phrase() API, atomic remove preserving duplicate survivors,
cross-member relational queries over a collection alias, facet exclude
validation without filters, {!field}/{!prefix} exact-raw bodies, function
query min()/max() arity errors, and dismax stored-vs-derived statistics
parity when a field has NULL values."""

import pyspark.sql.functions as F
import pytest

from solr_map_reduce_spark.extensions.search import QuerySyntaxError


class TestPhrasePublicApiRevMarkers:
    """SearchIndex.phrase() (the direct API, not the query language)
    must skip text_general_rev's interleaved reversed copies."""

    @pytest.fixture(scope="class")
    def rev_idx(self, spark, tmp_path_factory):
        from solr_map_reduce_spark.index_reader import SearchIndex
        from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
        from solr_map_reduce_spark.schema import Field, IndexSchema

        schema = IndexSchema(
            fields=(Field("id", "string", required=True),
                    Field("text", "text_general_rev")),
            unique_key="id",
        )
        df = spark.createDataFrame(
            [("1", "hello world again"), ("2", "world then hello")],
            "id string, text string",
        )
        out = str(tmp_path_factory.mktemp("revp") / "idx")
        IndexJob(IndexJobConfig(schema=schema, shards=1, dedup="none")).build(df, out)
        return SearchIndex.open(spark, out)

    def test_phrase_slop0_matches_adjacent_real_tokens(self, rev_idx):
        got = sorted(r["id"] for r in rev_idx.phrase("hello world").collect())
        assert got == ["1"]

    def test_phrase_three_words(self, rev_idx):
        got = [r["id"] for r in rev_idx.phrase("hello world again").collect()]
        assert got == ["1"]


class TestRemoveKeepsDuplicateSurvivors:
    """Solr's atomic remove drops only the listed values — surviving
    duplicates stay (array_except would dedupe them)."""

    def test_remove_preserves_dups(self, spark, tmp_path):
        from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
        from solr_map_reduce_spark.schema import Field, IndexSchema

        from solr_map_reduce_spark.indexing import read_index

        schema = IndexSchema(
            fields=(Field("id", "string", required=True),
                    Field("tags", "string", multi_valued=True)),
            unique_key="id",
        )
        path = str(tmp_path / "rmdup")
        job = IndexJob(IndexJobConfig(schema=schema, shards=1, dedup="none"))
        df = spark.createDataFrame(
            [("1", ["a", "a", "b", "c"])], "id string, tags array<string>"
        )
        job.build(df, path)
        upd = spark.createDataFrame([("1", ["c"])],
                                    "id string, tags array<string>")
        job.update_fields(upd, path, ops={"tags": "remove"})
        rows = read_index(spark, path).collect()
        assert rows[0]["tags"] == ["a", "a", "b"]  # both 'a's survive


class TestAliasRelationalQueries:
    """{!join}/{!parent}/{!child} over a MultiIndex must match across
    members — the 'identical to the unpartitioned collection' contract
    (a per-member compile would silently drop cross-slice matches)."""

    @pytest.fixture(scope="class")
    def alias(self, spark, tmp_path_factory):
        from solr_map_reduce_spark.index_reader import MultiIndex, SearchIndex
        from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
        from solr_map_reduce_spark.schema import Field, IndexSchema

        schema = IndexSchema(
            fields=(Field("id", "string", required=True),
                    Field("text", "text_general"),
                    Field("lang", "string"),
                    Field("source", "string"),
                    Field("kind", "string"),
                    Field("_root_", "string")),
            unique_key="id",
        )
        # slice0 holds the only lang:de 'spark' doc (source S) and a
        # parent P1; slice1 holds another source-S doc and P1's child
        rows0 = [("a1", "spark rocks", "de", "S", "doc", None),
                 ("a2", "nothing here", "en", "T", "doc", None),
                 ("p1", "parent doc", "en", None, "parent", "p1")]
        rows1 = [("b1", "unrelated text", "en", "S", "doc", None),
                 ("b2", "noise", "en", "U", "doc", None),
                 ("c1", "spark child", "en", None, "child", "p1")]
        base = tmp_path_factory.mktemp("aliasrel")
        paths = []
        for part, rows in ((0, rows0), (1, rows1)):
            df = spark.createDataFrame(
                rows,
                "id string, text string, lang string, source string, "
                "kind string, _root_ string",
            )
            out = str(base / f"slice{part}")
            IndexJob(
                IndexJobConfig(schema=schema, shards=1, dedup="none")
            ).build(df, out)
            paths.append(out)
        return MultiIndex.open(spark, paths)

    def test_join_crosses_members(self, alias):
        got = sorted(
            r["id"] for r in
            alias.query("{!join from=source to=source}lang:de AND spark")
            .collect()
        )
        # a1 matched in slice0; its source S must also select b1 in slice1
        assert got == ["a1", "b1"]

    def test_parent_crosses_members(self, alias):
        got = [r["id"] for r in
               alias.query("{!parent which=kind:parent}spark").collect()]
        # p1 (slice0) qualifies via its child c1 (slice1)
        assert got == ["p1"]

    def test_child_crosses_members(self, alias):
        got = [r["id"] for r in
               alias.query("{!child of=kind:parent}parent").collect()]
        assert got == ["c1"]

    def test_search_routes_relational(self, alias):
        rows = alias.search(
            q="{!join from=source to=source}lang:de AND spark",
            sort=[("id", "asc")], select=["id"],
        ).collect()
        assert [r["id"] for r in rows] == ["a1", "b1"]


class TestFacetExcludeValidation:
    """exclude= must validate even with no filters — a typo'd exclude
    never passes silently."""

    def test_orphan_exclude_is_loud(self, spark, tmp_path):
        from solr_map_reduce_spark.index_reader import SearchIndex
        from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
        from solr_map_reduce_spark.schema import Field, IndexSchema

        schema = IndexSchema(
            fields=(Field("id", "string", required=True),
                    Field("grp", "string")),
            unique_key="id",
        )
        path = str(tmp_path / "fex")
        IndexJob(IndexJobConfig(schema=schema, shards=1, dedup="none")).build(
            spark.createDataFrame([("1", "a")], "id string, grp string"), path
        )
        idx = SearchIndex.open(spark, path)
        with pytest.raises(ValueError, match="unknown filter keys"):
            idx.facet("grp", exclude="grp")


class TestLocalParamsRawBody:
    """{!field}/{!prefix} bodies are VERBATIM (Solr's raw-value parsers):
    leading/trailing whitespace is part of the value."""

    @pytest.fixture(scope="class")
    def idx(self, spark, tmp_path_factory):
        from solr_map_reduce_spark.index_reader import SearchIndex
        from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
        from solr_map_reduce_spark.schema import Field, IndexSchema

        schema = IndexSchema(
            fields=(Field("id", "string", required=True),
                    Field("val", "string")),
            unique_key="id",
        )
        df = spark.createDataFrame(
            [("1", " leading"), ("2", "leading"), ("3", " lead me")],
            "id string, val string",
        )
        out = str(tmp_path_factory.mktemp("rawlp") / "idx")
        IndexJob(IndexJobConfig(schema=schema, shards=1, dedup="none")).build(df, out)
        return SearchIndex.open(spark, out)

    def test_field_exact_with_leading_space(self, idx):
        got = [r["id"] for r in idx.query("{!field f=val} leading").collect()]
        assert got == ["1"]

    def test_prefix_with_leading_space(self, idx):
        got = sorted(r["id"] for r in idx.query("{!prefix f=val} lead").collect())
        assert got == ["1", "3"]

    def test_join_body_still_trims(self, idx):
        # query-typed bodies strip their own whitespace — a padded inner
        # query parses the same as an unpadded one
        got = sorted(
            r["id"] for r in
            idx.query("{!join from=val to=val}  {!field f=val}leading ").collect()
        )
        assert got == ["2"]


class TestFunctionQueryArity:
    def test_min_single_arg_is_syntax_error(self):
        from solr_map_reduce_spark.extensions.search import parse_function_query

        with pytest.raises(QuerySyntaxError, match="min\\(\\) takes >=2"):
            parse_function_query("min(n_chars)")
        with pytest.raises(QuerySyntaxError, match="max\\(\\) takes >=2"):
            parse_function_query("max()")


class TestDismaxNullFieldParity:
    """Derived statistics must equal stored statistics when a field has
    NULL values: both count n_docs over ALL rows (search_stats counts
    the corpus), so idf — and therefore ranking — agrees between the
    sidecar and no-sidecar paths."""

    def test_stored_equals_derived_with_nulls(self, spark):
        from solr_map_reduce_spark.extensions.search import bm25_dismax

        df = spark.createDataFrame(
            [(1, ["x", "y"], ["q"]),
             (2, ["x"], None),
             (3, ["z"], None)],
            "doc_id long, t1 array<string>, t2 array<string>",
        )
        # stored stats the way search_stats computes them: n_docs =
        # count(*); (sum_dl, n_dl) over docs where the field is present
        specs = {
            "t1": {"weight": 1.0, "tokens_col": "t1",
                   "word_tokens": [["x"]],
                   "stored_stats": (3, 4, 3), "stored_dfs": {"x": 2}},
            "t2": {"weight": 1.0, "tokens_col": "t2",
                   "word_tokens": [["x"]],
                   "stored_stats": (3, 1, 1), "stored_dfs": {"x": 0}},
        }
        stored = {r["doc_id"]: r["score"]
                  for r in bm25_dismax(df, specs, k=10).collect()}
        for s in specs.values():
            s["stored_stats"] = None
            s["stored_dfs"] = None
        derived = {r["doc_id"]: r["score"]
                   for r in bm25_dismax(df, specs, k=10).collect()}
        assert stored.keys() == derived.keys()
        for d in stored:
            assert stored[d] == pytest.approx(derived[d], rel=1e-12)
