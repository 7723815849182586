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


class TestQOpAnd:
    """Solr q.op=AND: juxtaposed clauses conjoin; explicit OR still
    separates disjunct groups; the prohibit idiom is unchanged."""

    @pytest.fixture(scope="class")
    def idx(self, spark, tmp_path_factory):
        from solr_map_reduce_spark.index_reader import SearchIndex
        from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
        from solr_map_reduce_spark.schema import Field, IndexSchema

        schema = IndexSchema(
            fields=(Field("id", "string", required=True),
                    Field("text", "text_general")),
            unique_key="id",
        )
        df = spark.createDataFrame(
            [("1", "spark shuffle join"), ("2", "spark scan"),
             ("3", "shuffle only"), ("4", "spark shuffle")],
            "id string, text string",
        )
        out = str(tmp_path_factory.mktemp("qop") / "idx")
        IndexJob(IndexJobConfig(schema=schema, shards=1, dedup="none")).build(df, out)
        return SearchIndex.open(spark, out)

    def test_juxtaposition_conjoins(self, idx):
        # OR default: spark shuffle -> union
        assert idx.query("spark shuffle").count() == 4
        # AND: both terms required
        got = sorted(r["id"] for r in
                     idx.query("spark shuffle", op="AND").collect())
        assert got == ["1", "4"]

    def test_explicit_or_separates_groups(self, idx):
        # scan OR (shuffle join) under q.op=AND
        got = sorted(r["id"] for r in
                     idx.query("scan OR shuffle join", op="AND").collect())
        assert got == ["1", "2"]

    def test_prohibit_unchanged(self, idx):
        got = sorted(r["id"] for r in
                     idx.query("spark -scan", op="AND").collect())
        assert got == ["1", "4"]

    def test_op_validated_and_memo_keyed(self, idx):
        with pytest.raises(QuerySyntaxError, match="q.op must be"):
            idx.query("spark", op="XOR").count()
        # same q, different op -> different plans (memo keyed on op)
        assert idx.query("spark shuffle").count() != \
            idx.query("spark shuffle", op="AND").count()

    def test_search_accepts_op(self, idx):
        rows = idx.search(q="spark shuffle", op="AND",
                          sort=[("id", "asc")], select=["id"]).collect()
        assert [r["id"] for r in rows] == ["1", "4"]


class TestSortByFunction:
    def test_function_sort_key(self, spark, tmp_path):
        from solr_map_reduce_spark.index_reader import SearchIndex
        from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
        from solr_map_reduce_spark.schema import Field, IndexSchema

        schema = IndexSchema(
            fields=(Field("id", "string", required=True),
                    Field("a", "long"), Field("b", "long")),
            unique_key="id",
        )
        df = spark.createDataFrame(
            [("1", 10, 2), ("2", 9, 1), ("3", 30, 10)],
            "id string, a long, b long",
        )
        out = str(tmp_path / "fsort")
        IndexJob(IndexJobConfig(schema=schema, shards=1, dedup="none")).build(df, out)
        idx = SearchIndex.open(spark, out)
        # div(a,b): 5, 9, 3 -> desc = 2, 1, 3 (Solr sort-by-function)
        rows = idx.search(sort=[("div(a,b)", "desc")], select=["id"]).collect()
        assert [r["id"] for r in rows] == ["2", "1", "3"]


class TestFacetMincountOffset:
    def test_mincount_and_offset(self, spark, tmp_path):
        from solr_map_reduce_spark.index_reader import SearchIndex
        from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
        from solr_map_reduce_spark.schema import Field, IndexSchema

        schema = IndexSchema(
            fields=(Field("id", "string", required=True),
                    Field("g", "string")),
            unique_key="id",
        )
        df = spark.createDataFrame(
            [("1", "a"), ("2", "a"), ("3", "a"), ("4", "b"), ("5", "b"),
             ("6", "c")],
            "id string, g string",
        )
        out = str(tmp_path / "fmc")
        IndexJob(IndexJobConfig(schema=schema, shards=1, dedup="none")).build(df, out)
        idx = SearchIndex.open(spark, out)
        got = {r["g"]: r["cnt"] for r in idx.facet("g", mincount=2).collect()}
        assert got == {"a": 3, "b": 2}
        # facet paging: skip the top bucket, take the next one
        rows = idx.facet("g", offset=1, top=1).collect()
        assert [(r["g"], r["cnt"]) for r in rows] == [("b", 2)]


class TestDismaxMinimumShouldMatch:
    def test_resolve_mm(self):
        from solr_map_reduce_spark.extensions.search import resolve_mm

        assert resolve_mm(2, 3) == 2
        # Lucene: mm above the optional-clause count matches NOTHING —
        # the requirement is returned unclamped so 'matched >= req' is
        # unsatisfiable (never silently widened to all-words)
        assert resolve_mm(5, 3) == 5
        assert resolve_mm(-1, 3) == 2         # leave 1 optional
        assert resolve_mm("75%", 4) == 3      # rounds DOWN
        assert resolve_mm("75%", 3) == 2
        assert resolve_mm("-25%", 4) == 3     # leave floor(25%) optional
        assert resolve_mm("0%", 4) == 1       # non-positive -> 1
        assert resolve_mm(-10, 3) == 1

    def test_conditional_mm(self):
        """Solr's conditional format: N<spec applies when the clause
        count exceeds N; greatest applicable N wins; at or below the
        smallest N all clauses are required."""
        from solr_map_reduce_spark.extensions.search import resolve_mm

        assert resolve_mm("2<-25%", 2) == 2     # n <= 2: all required
        assert resolve_mm("2<-25%", 1) == 1
        assert resolve_mm("2<-25%", 4) == 3     # leave floor(25%) optional
        assert resolve_mm("3<90%", 10) == 9
        multi = "2<-25% 9<-3"
        assert resolve_mm(multi, 2) == 2        # below both thresholds
        assert resolve_mm(multi, 5) == 4        # 2<n<=9: -25%
        assert resolve_mm(multi, 12) == 9       # n>9: leave 3 optional
        for bad in ("x<2", "2<", "2<3<4"):
            with pytest.raises(QuerySyntaxError, match="conditional mm"):
                resolve_mm(bad, 4)

    def test_mm_filters_matches(self, spark):
        from solr_map_reduce_spark.extensions.search import bm25_dismax

        df = spark.createDataFrame(
            [(1, ["spark", "data"]), (2, ["spark"]), (3, ["data"]),
             (4, ["other"])],
            "doc_id long, toks array<string>",
        )
        specs = {
            "toks": {"weight": 1.0, "tokens_col": "toks",
                     "word_tokens": [["spark"], ["data"]],
                     "stored_stats": None, "stored_dfs": None},
        }
        any_hit = sorted(r["doc_id"] for r in
                         bm25_dismax(df, specs, k=10).collect())
        assert any_hit == [1, 2, 3]
        both = sorted(r["doc_id"] for r in
                      bm25_dismax(df, specs, k=10, mm=2).collect())
        assert both == [1]
        pct = sorted(r["doc_id"] for r in
                     bm25_dismax(df, specs, k=10, mm="50%").collect())
        assert pct == [1, 2, 3]
        # over-specified mm (3 required, 2 countable words): Lucene
        # matches nothing — never silently clamps down to all-words
        assert bm25_dismax(df, specs, k=10, mm=3).count() == 0


class TestQOpLocalParams:
    def test_join_inner_query_honors_op(self, spark, tmp_path):
        """q.op=AND must reach {!join}'s inner query (the memo keys on
        op, so both plans cache separately)."""
        from solr_map_reduce_spark.index_reader import SearchIndex
        from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
        from solr_map_reduce_spark.schema import Field, IndexSchema

        schema = IndexSchema(
            fields=(Field("id", "string", required=True),
                    Field("text", "text_general"),
                    Field("grp", "string")),
            unique_key="id",
        )
        df = spark.createDataFrame(
            [("1", "spark data", "g1"), ("2", "spark only", "g2"),
             ("3", "other", "g1"), ("4", "other", "g2")],
            "id string, text string, grp string",
        )
        out = str(tmp_path / "qopj")
        IndexJob(IndexJobConfig(schema=schema, shards=1, dedup="none")).build(df, out)
        idx = SearchIndex.open(spark, out)
        q = "{!join from=grp to=grp}spark data"
        # OR: inner matches docs 1+2 -> groups g1,g2 -> all 4 docs
        assert idx.query(q).count() == 4
        # AND: inner matches only doc 1 -> group g1 -> docs 1,3
        got = sorted(r["id"] for r in idx.query(q, op="AND").collect())
        assert got == ["1", "3"]
