"""Round-11 serving-surface review fixes: alias fromIndex/mlt/graph/
facet/sort semantics, {!mlt} param wiring, plan-memo staleness after
build_ann, get() key coercion, clean numeric-param errors."""

import numpy as np
import pytest
import pyspark.sql.functions as F

from solr_map_reduce_spark.extensions.search import QuerySyntaxError
from solr_map_reduce_spark.index_reader import MultiIndex, SearchIndex
from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
from solr_map_reduce_spark.schema import Field, IndexSchema


def _docs_artifact(spark, out, rows, extra_fields=(), shards=2):
    schema = IndexSchema(
        fields=(Field("id", "string", required=True),
                Field("text", "text_general"),
                *extra_fields),
        unique_key="id",
    )
    ddl = "id string, text string" + "".join(
        f", {f.name} {('array<string>' if f.multi_valued else f.type)}"
        for f in extra_fields
    )
    job = IndexJob(IndexJobConfig(schema=schema, shards=shards, dedup="none",
                                  search_stats=True))
    job.build(spark.createDataFrame(rows, ddl), out)
    return SearchIndex.open(spark, out)


@pytest.fixture(scope="module")
def alias(spark, tmp_path_factory):
    """Two-member alias with disjoint keys; member A holds doc a1."""
    base = tmp_path_factory.mktemp("alias_r11")
    a = _docs_artifact(
        spark, str(base / "a"),
        [(f"a{i}",
          "spark join engine fast" if i % 2 == 0 else "slow single pass",
          ["red" if i % 2 == 0 else "blue"], i)
         for i in range(20)],
        extra_fields=(Field("tags", "string", multi_valued=True),
                      Field("rank", "long")),
    )
    b = _docs_artifact(
        spark, str(base / "b"),
        [(f"b{i}",
          "spark join engine fast" if i % 3 == 0 else "other words entirely",
          ["green"], 100 + i)
         for i in range(20)],
        extra_fields=(Field("tags", "string", multi_valued=True),
                      Field("rank", "long")),
    )
    return MultiIndex([a, b]), a, b


class TestAliasFromIndex:
    def test_alias_from_index_joins_attached_collection(self, spark, alias,
                                                        tmp_path):
        ali, a, b = alias
        # a lookup collection whose keep rows name ids from BOTH members
        schema = IndexSchema(
            fields=(Field("ref", "string", required=True),
                    Field("label", "string")),
            unique_key="ref",
        )
        lk = str(tmp_path / "lk")
        IndexJob(IndexJobConfig(schema=schema, shards=1, dedup="none")).build(
            spark.createDataFrame(
                [("a1", "keep"), ("b2", "keep"), ("a3", "drop")],
                "ref string, label string"), lk)
        ali.attach_collection("lk", SearchIndex.open(spark, lk))
        got = sorted(r["id"] for r in ali.query(
            "{!join fromIndex=lk from=ref to=id}label:keep"
        ).collect())
        assert got == ["a1", "b2"]

    def test_alias_unknown_from_index_is_loud(self, alias):
        ali, _a, _b = alias
        with pytest.raises(QuerySyntaxError, match="fromIndex"):
            ali.query("{!join fromIndex=nope from=x to=id}label:keep")


class TestAliasMltAndGraph:
    def test_alias_mlt_matches_across_members(self, alias):
        ali, a, _b = alias
        # source doc lives ONLY in member a; similar docs exist in BOTH
        got = {r["id"] for r in ali.query("{!mlt qf=text}a0").collect()}
        assert "a0" not in got          # source excluded
        assert any(i.startswith("b") for i in got), got  # cross-member
        assert got  # non-empty

    def test_alias_mlt_missing_doc_is_loud(self, alias):
        ali, _a, _b = alias
        with pytest.raises(QuerySyntaxError, match="holds document"):
            ali.query("{!mlt qf=text}zzz")

    def test_alias_graph_refuses_loudly(self, alias):
        ali, _a, _b = alias
        with pytest.raises(QuerySyntaxError, match="alias"):
            ali.query("{!graph from=tags to=id}text:spark")


class TestAliasFacetAndSort:
    def test_alias_facet_explodes_multivalued(self, spark, tmp_path):
        rows_a = [("a1", "x", ["red", "blue"], 1), ("a2", "x", ["red"], 2)]
        rows_b = [("b1", "x", ["blue"], 3)]
        a = _docs_artifact(
            spark, str(tmp_path / "fa"), rows_a,
            extra_fields=(Field("tags", "string", multi_valued=True),
                          Field("rank", "long")))
        b = _docs_artifact(
            spark, str(tmp_path / "fb"), rows_b,
            extra_fields=(Field("tags", "string", multi_valued=True),
                          Field("rank", "long")))
        ali = MultiIndex([a, b])
        got = {r["tags"]: r["cnt"] for r in ali.facet("tags").collect()}
        assert got == {"red": 2, "blue": 2}
        # identical to the single-index contract on the union
        single = {r["tags"]: r["cnt"] for r in a.facet("tags").collect()}
        assert single == {"red": 2, "blue": 1}

    def test_alias_search_function_sort(self, alias):
        ali, _a, _b = alias
        rows = ali.search(
            sort=[("product(rank, -1)", "asc")], limit=3,
            select=["id", "rank"],
        ).collect()
        assert len(rows) == 3
        # product(rank,-1) asc == rank desc
        ranks = [r["rank"] for r in rows]
        assert ranks == sorted(ranks, reverse=True)


class TestMltParamWiring:
    def test_maxqt_respected_without_mintf(self, alias):
        _ali, a, _b = alias
        # maxqt=1: only the single most interesting term drives matching
        one = {r["id"] for r in a.query("{!mlt qf=text maxqt=1}a1").collect()}
        full = {r["id"] for r in a.query("{!mlt qf=text}a1").collect()}
        assert one  # matching happened at all
        assert one <= full  # a 1-term query can only shrink the match set

    def test_mintf_filters_low_frequency_terms(self, spark, tmp_path):
        # doc's only repeated term is 'join join'; mintf=2 keeps ONLY it
        a = _docs_artifact(
            spark, str(tmp_path / "m"),
            [("d1", "join join unique"), ("d2", "join elsewhere"),
             ("d3", "unique elsewhere")],
        )
        with_mintf = {r["id"] for r in a.query(
            "{!mlt qf=text mintf=2}d1").collect()}
        assert with_mintf == {"d2"}  # only the 'join' doc matches
        without = {r["id"] for r in a.query("{!mlt qf=text}d1").collect()}
        assert "d3" in without  # 'unique' participates when mintf absent


class TestServingStaleness:
    def test_build_ann_invalidates_plan_memo(self, spark, tmp_path):
        schema = IndexSchema(
            fields=(Field("vec_id", "long", required=True),
                    Field("embedding", "array<double>")),
            unique_key="vec_id",
        )
        rng = np.random.RandomState(3)
        V = rng.randn(60, 8)
        path = str(tmp_path / "idx")
        IndexJob(IndexJobConfig(schema=schema, shards=2, dedup="none")).build(
            spark.createDataFrame(
                [(i, [float(x) for x in V[i]]) for i in range(60)],
                "vec_id long, embedding array<double>"), path)
        idx = SearchIndex.open(spark, path)
        q = "{!knn f=embedding topK=5}[" + ", ".join(
            f"{x:.6f}" for x in V[0]) + "]"
        idx.query(q).collect()  # memoized as the exact corpus scan
        idx.build_ann("embedding", kind="ivf", n_centroids=4, nprobe=4)
        # the SAME query text on the SAME handle must now route (loud
        # proof: garbage a non-probed... simpler: the routed plan is a
        # bounded literal-rank replay, detectable by plan shape)
        plan = idx.query(q)._jdf.queryExecution().executedPlan().toString()
        assert "_knn_rank" in plan or "map_contains" in plan or \
            "CreateMap" in plan or "keys:" in plan, plan

    def test_get_int_key_on_string_artifact(self, spark, tmp_path):
        a = _docs_artifact(
            spark, str(tmp_path / "g"),
            [(str(i), "words here") for i in range(50)] + [("042", "padded")],
        )
        # int key coerces to its str form — same row as get('42'),
        # and the cast-aliased '042' row is NOT silently matched/missed
        assert [r["id"] for r in a.get(42).collect()] == ["42"]
        assert [r["id"] for r in a.get("042").collect()] == ["042"]
        assert sorted(
            r["id"] for r in a.get_many([42, "042"]).collect()
        ) == ["042", "42"]


class TestCleanParamErrors:
    def test_frange_and_graph_garbage_params(self, alias):
        _ali, a, _b = alias
        with pytest.raises(QuerySyntaxError, match="not a number"):
            a.query("{!frange l=abc}sum(rank, 1)")
        with pytest.raises(QuerySyntaxError, match="maxDepth"):
            a.query("{!graph from=tags to=id maxDepth=deep}text:spark")
        with pytest.raises(QuerySyntaxError, match="mindf"):
            a.query("{!mlt qf=text mindf=lots}a1")


class TestParserFixes:
    """search.py parser review: prohibit chains, unary +/!, field:*,
    escapes, local-params truncation, string ranges, exists()/def()."""

    @pytest.fixture(scope="class")
    def idx(self, spark, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("parser_r11") / "idx")
        rows = [
            ("1", "table scan fast", "electronics", "1.5.0"),
            ("2", "table shuffle heavy", "books", "10"),
            ("3", "table spill disk", None, "2"),
            ("4", "index seek", "toys", "0.9"),
            ("5", 'say "hello world" twice', "games", "1"),
        ]
        schema = IndexSchema(
            fields=(Field("id", "string", required=True),
                    Field("text", "text_general"),
                    Field("category", "string"),
                    Field("version", "string")),
            unique_key="id",
        )
        IndexJob(IndexJobConfig(schema=schema, shards=2, dedup="none")).build(
            spark.createDataFrame(
                rows, "id string, text string, category string, version string"
            ), out)
        return SearchIndex.open(spark, out)

    def _ids(self, idx, q, **kw):
        return sorted(r["id"] for r in idx.query(q, **kw).collect())

    def test_and_chained_negations_prohibit(self, idx):
        # 'table NOT shuffle AND NOT spill' must EXCLUDE both terms —
        # the old parser turned the AND chain into an OR disjunct that
        # matched nearly the whole corpus
        assert self._ids(idx, "table NOT shuffle AND NOT spill") == ["1"]

    def test_unary_bang_is_prohibit(self, idx):
        assert self._ids(idx, "table !shuffle") == ["1", "3"]

    def test_unary_plus_is_required(self, idx):
        # '+shuffle table': shuffle is a MUST, plain clauses stop
        # restricting matching (Lucene) — only doc 2 matches
        assert self._ids(idx, "+shuffle table") == ["2"]
        # q.op=AND: every clause is already a MUST
        assert self._ids(idx, "+shuffle table", op="AND") == ["2"]

    def test_field_star_is_exists(self, idx):
        assert self._ids(idx, "category:*") == ["1", "2", "4", "5"]
        assert self._ids(idx, "table AND category:*") == ["1", "2"]
        assert self._ids(idx, "text:*") == ["1", "2", "3", "4", "5"]

    def test_escaped_quote_inside_phrase(self, idx):
        got = self._ids(idx, '"say \\"hello world\\" twice"')
        assert got == ["5"]

    def test_escaped_colon_stays_in_term(self, idx):
        from solr_map_reduce_spark.extensions.search import parse_query
        ast = parse_query("foo\\:bar")
        assert ast == ("term", "foo:bar")  # literal, not a fielded clause

    def test_string_column_range_is_lexicographic(self, idx):
        # Solr string ranges compare lexicographically: '1.5.0' and
        # '10' both fall in ['1' TO '2']; numeric coercion dropped them
        got = self._ids(idx, "version:[1 TO 2]")
        assert got == ["1", "2", "3", "5"]  # 1.5.0, 10, 2, 1

    def test_exists_and_def_on_string_field(self, idx):
        # exists(category) must be true for any value (the double cast
        # read strings as missing); {!frange} over it selects the docs
        # WITH a category
        got = self._ids(idx, "{!frange l=1 u=1}exists(category)")
        assert got == ["1", "2", "4", "5"]
        got0 = self._ids(idx, "{!frange l=0 u=0}exists(category)")
        assert got0 == ["3"]

    def test_float_fuzzy_and_group_slop_are_loud(self, idx):
        with pytest.raises(QuerySyntaxError, match="fractional"):
            idx.query("roam~0.8")
        with pytest.raises(QuerySyntaxError, match="group"):
            idx.query("(quick fox)~2")

    def test_local_params_quoted_truncation_is_loud(self):
        from solr_map_reduce_spark.extensions.search import (
            parse_local_params,
        )
        with pytest.raises(QuerySyntaxError, match="quoted value"):
            parse_local_params("{!terms f=tags v='rock'n'roll'}x")

    def test_empty_terms_guards(self, spark):
        from solr_map_reduce_spark.extensions.search import (
            bm25_search, contains_all, contains_any, contains_none,
        )
        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        for fn in (contains_all, contains_any, contains_none, bm25_search):
            with pytest.raises(ValueError, match="at least one term"):
                fn(df, [])


class TestStreamSqlFixes:
    """stream_expr/sql review: injection hardening, Solr-semantics
    divergences, topic checkpoint safety."""

    @pytest.fixture(scope="class")
    def docs(self, spark, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("sqlfix") / "idx")
        rows = [("1", "spark join engine", 5), ("2", "slow scan", 7),
                ("3", "spark", 9), ("4", "entirely different", 11)]
        schema = IndexSchema(
            fields=(Field("id", "string", required=True),
                    Field("text", "text_general"),
                    Field("n", "long")),
            unique_key="id",
        )
        IndexJob(IndexJobConfig(schema=schema, shards=2, dedup="none",
                                search_stats=True)).build(
            spark.createDataFrame(rows, "id string, text string, n long"),
            out)
        return SearchIndex.open(spark, out)

    def test_sql_equality_backslash_quote_no_injection(self, docs):
        from solr_map_reduce_spark.extensions.sql import SqlEngine

        eng = SqlEngine({"docs": docs})
        # a literal containing \" must stay INSIDE the phrase — the old
        # escaping let it break out and inject OR clauses
        got = eng.sql(
            'SELECT id FROM docs WHERE text = \'x\\" OR id:1 OR y\''
        ).collect()
        assert got == []  # nothing contains that literal; no injection

    def test_sql_like_rejects_unsafe_patterns(self, docs):
        from solr_map_reduce_spark.extensions.sql import (
            SqlEngine, SqlSyntaxError,
        )

        eng = SqlEngine({"docs": docs})
        ok = {r["id"] for r in eng.sql(
            "SELECT id FROM docs WHERE text LIKE 'spar%'"
        ).collect()}
        assert ok == {"1", "3"}
        for bad in ("foo bar%", "x OR n:[1 TO *]", "lit*eral"):
            with pytest.raises(SqlSyntaxError, match="LIKE pattern"):
                eng.sql(f"SELECT id FROM docs WHERE text LIKE '{bad}'")

    def test_sql_in_on_analyzed_matches_like_equality(self, docs):
        from solr_map_reduce_spark.extensions.sql import (
            SqlEngine, SqlSyntaxError,
        )

        eng = SqlEngine({"docs": docs})
        eq = {r["id"] for r in eng.sql(
            "SELECT id FROM docs WHERE text = 'spark'").collect()}
        inn = {r["id"] for r in eng.sql(
            "SELECT id FROM docs WHERE text IN ('spark')").collect()}
        assert inn == eq == {"1", "3"}
        both = {r["id"] for r in eng.sql(
            "SELECT id FROM docs WHERE text IN ('spark', 'scan')"
        ).collect()}
        assert both == {"1", "2", "3"}
        with pytest.raises(SqlSyntaxError, match="BETWEEN"):
            eng.sql("SELECT id FROM docs WHERE text BETWEEN 'a' AND 'b'")

    def test_stream_quoted_escape_in_q(self, docs):
        from solr_map_reduce_spark.extensions.stream_expr import (
            StreamCompiler,
        )

        eng = StreamCompiler({"docs": docs})
        got = {r["id"] for r in eng.run(
            'search(docs, q="text:\\"spark join\\"", fl="id")'
        ).collect()}
        assert got == {"1"}  # the exact phrase, not mangled tokens

    def test_stream_unique_without_sort_is_loud(self, docs):
        from solr_map_reduce_spark.extensions.search import QuerySyntaxError
        from solr_map_reduce_spark.extensions.stream_expr import (
            StreamCompiler,
        )

        eng = StreamCompiler({"docs": docs})
        with pytest.raises(QuerySyntaxError, match="sorted input"):
            eng.run('unique(search(docs, q="*:*", fl="id,n"), over="n")')

    def test_stream_fetch_dedupes_collection_keys(self, spark, docs,
                                                  tmp_path):
        from solr_map_reduce_spark.extensions.stream_expr import (
            StreamCompiler,
        )

        # lookup collection with a DUPLICATE key (two rows k=5)
        lk = str(tmp_path / "lk")
        schema = IndexSchema(
            fields=(Field("lid", "string", required=True),
                    Field("k", "long"), Field("name", "string")),
            unique_key="lid",
        )
        IndexJob(IndexJobConfig(schema=schema, shards=1, dedup="none")).build(
            spark.createDataFrame(
                [("a", 5, "first"), ("b", 5, "second"), ("c", 7, "only")],
                "lid string, k long, name string"), lk)
        eng = StreamCompiler({"docs": docs,
                              "lk": SearchIndex.open(spark, lk)})
        rows = eng.run(
            'fetch(lk, search(docs, q="*:*", fl="id,n", '
            'sort="id asc"), on="n=k", fl="name")'
        ).collect()
        # Solr FetchStream: one output tuple per input tuple (map
        # semantics) — the duplicate k=5 must not multiply the stream
        assert len(rows) == 4
        by_id = {r["id"]: r["name"] for r in rows}
        assert by_id["1"] == "first"  # deterministic winner
        assert by_id["2"] == "only"

    def test_topic_failed_run_does_not_pend_checkpoint(self, spark,
                                                       tmp_path):
        import json, os

        from solr_map_reduce_spark.extensions.search import QuerySyntaxError
        from solr_map_reduce_spark.extensions.stream_expr import (
            StreamCompiler,
        )

        out = str(tmp_path / "vidx")
        schema = IndexSchema(
            fields=(Field("id", "string", required=True),
                    Field("text", "text_general")),
            unique_key="id",
        )
        IndexJob(IndexJobConfig(schema=schema, shards=1, dedup="none",
                                doc_versions=True)).build(
            spark.createDataFrame([(str(i), "w") for i in range(5)],
                                  "id string, text string"), out)
        ck = str(tmp_path / "ck")
        os.makedirs(ck)
        eng = StreamCompiler(
            {"c": SearchIndex.open(spark, out)}, checkpoint_dir=ck,
        )
        # a run whose OUTER decorator fails after topic() pulled
        with pytest.raises(QuerySyntaxError):
            eng.run('unique(topic(ckc, c, id=t1, q="*:*"))')  # no over=
        assert eng._pending_topics == []  # rolled back
        eng.commit_topics()  # must be a no-op
        # the never-delivered docs arrive on the next good pull
        got = eng.run('topic(ckc, c, id=t1, q="*:*")')
        assert got.count() == 5
        # and the id is sanitized against traversal
        with pytest.raises(QuerySyntaxError, match="plain name"):
            eng.run('topic(ckc, c, id=../../evil, q="*:*")')


class TestDedupFixes:
    """text_dedup/minhash_index review: NaN-jaccard empty docs, replay
    idempotence, simhash blocking bound, lsh banding validation."""

    def test_empty_docs_are_not_mutual_near_dups(self, spark):
        from solr_map_reduce_spark.extensions.text_dedup import minhash_dedup

        docs = spark.createDataFrame(
            [(1, "!!!"), (2, "???"), (3, ""), (4, "real words here today"),
             (5, "real words here today")],
            "doc_id long, text string",
        )
        pairs = minhash_dedup(docs, threshold=0.8).collect()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        # the true duplicate pair survives; the punctuation-only/empty
        # docs (identical zero signatures, 0/0 jaccard = NaN pre-fix,
        # and NaN >= 0.8 is TRUE under Spark's NaN-is-greatest) must not
        assert (4, 5) in got
        assert not any(a in (1, 2, 3) or b in (1, 2, 3) for a, b in got)

    def test_add_unique_replay_does_not_reindex(self, spark, tmp_path):
        from solr_map_reduce_spark.extensions.minhash_index import (
            MinHashIndex, MinHashParams,
        )

        idx = MinHashIndex.create(spark, str(tmp_path / "mh"),
                                  MinHashParams())
        batch = spark.createDataFrame(
            [(i, f"totally unique document number {i} with words {i*7}")
             for i in range(10)],
            "doc_id long, text string",
        )
        n1, _ = idx.add_unique(batch)
        assert n1 == 10
        # at-least-once replay of the SAME batch: nothing re-indexed
        n2, _ = idx.add_unique(batch)
        assert n2 == 0
        stored = spark.read.parquet(str(tmp_path / "mh" / "features"))
        assert stored.count() == 10  # no duplicate feature rows
        assert stored.select("doc_id").distinct().count() == 10

    def test_simhash_blocking_bound_is_loud(self, spark):
        import warnings

        from solr_map_reduce_spark.extensions.text_dedup import (
            simhash64, simhash_candidates,
        )

        docs = spark.createDataFrame(
            [(1, "a b c"), (2, "a b d")], "doc_id long, text string")
        sims = simhash64(docs)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            simhash_candidates(sims, max_hamming=4)
        assert any("pigeonhole" in str(x.message) for x in w)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            simhash_candidates(sims, max_hamming=3)
        assert not w  # complete blocking: no warning

    def test_lsh_candidates_validates_banding(self, spark):
        from solr_map_reduce_spark.extensions.text_dedup import (
            lsh_candidates, minhash_signatures,
        )

        docs = spark.createDataFrame(
            [(1, "one two three four"), (2, "five six seven eight")],
            "doc_id long, text string",
        )
        sigs = minhash_signatures(docs, num_perm=64)
        with pytest.raises(ValueError, match="divide"):
            lsh_candidates(sigs, bands=24)
        with pytest.raises(ValueError, match="divide"):
            lsh_candidates(sigs, bands=100)
