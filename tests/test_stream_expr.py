"""Solr streaming expressions (extensions/stream_expr.py): parser shapes
and the compiled DataFrame semantics of each decorator."""

import pyspark.sql.functions as F
import pytest

from solr_map_reduce_spark.extensions.search import QuerySyntaxError
from solr_map_reduce_spark.extensions.stream_expr import (
    Call,
    StreamCompiler,
    parse_stream_expr,
)


class TestParser:
    def test_nested_calls_and_kwargs(self):
        node = parse_stream_expr(
            'rollup(search(c1, q="a:b AND c", fl="x,y", sort="x asc"), '
            "over=x, count(*), sum(y))"
        )
        assert node.name == "rollup"
        assert node.kwargs == {"over": "x"}
        search, cnt, sm = node.args
        assert (search.name, cnt.name, sm.name) == ("search", "count", "sum")
        assert search.args == ["c1"]
        assert search.kwargs == {"q": "a:b AND c", "fl": "x,y", "sort": "x asc"}
        assert cnt.args == ["*"] and sm.args == ["y"]

    def test_quoted_values_keep_commas_and_equals(self):
        node = parse_stream_expr(
            'innerJoin(search(a), search(b), on="k1=k2, k3")'
        )
        assert node.kwargs["on"] == "k1=k2, k3"

    def test_kwarg_value_may_be_a_call(self):
        node = parse_stream_expr(
            "hashJoin(search(a), hashed=search(b), on=k)"
        )
        assert isinstance(node.kwargs["hashed"], Call)
        assert node.kwargs["hashed"].name == "search"

    def test_positional_alias_token(self):
        node = parse_stream_expr("select(search(a), id, x as y)")
        assert node.args[1:] == ["id", "x as y"]

    def test_errors_are_loud(self):
        for bad in ("", "rollup(", "rollup)", "search(a) trailing",
                    "search(a,)", "(x)"):
            with pytest.raises(QuerySyntaxError):
                parse_stream_expr(bad)


@pytest.fixture(scope="module")
def comp(spark):
    people = spark.createDataFrame(
        [(1, "ada", "eng"), (2, "bob", "eng"), (3, "cy", "ops"), (4, "dee", None)],
        "pid long, name string, dept string",
    )
    salaries = spark.createDataFrame(
        [(1, 100.0), (2, 120.0), (3, 90.0)],
        "person long, pay double",
    )
    depts = spark.createDataFrame(
        [("eng", "building-1"), ("ops", "building-2")],
        "dept string, site string",
    )
    return StreamCompiler(
        {"people": people, "salaries": salaries, "depts": depts}
    )


class TestCompile:
    def test_search_fl_projection(self, comp):
        df = comp.run('search(people, q="*:*", fl="pid,name", sort="pid asc")')
        assert df.columns == ["pid", "name"]
        assert [r["pid"] for r in df.collect()] == [1, 2, 3, 4]

    def test_search_q_needs_index(self, comp):
        with pytest.raises(QuerySyntaxError, match="SearchIndex"):
            comp.run('search(people, q="name:ada")')

    def test_select_alias(self, comp):
        rows = comp.run("select(search(people), pid, name as who)").collect()
        assert rows[0].asDict().keys() == {"pid", "who"}

    def test_select_evaluators(self, comp):
        rows = comp.run(
            "select(search(salaries), person, "
            "add(pay, 10) as bumped, "
            "if(gt(pay, 100), div(pay, 2), pay) as adjusted, "
            "mult(sub(pay, 90), 2) as spread)"
        ).collect()
        got = {r["person"]: (r["bumped"], r["adjusted"], r["spread"])
               for r in rows}
        assert got[1] == (110.0, 100.0, 20.0)
        assert got[2] == (130.0, 60.0, 60.0)
        assert got[3] == (100.0, 90.0, 0.0)

    def test_select_evaluator_requires_alias(self, comp):
        with pytest.raises(QuerySyntaxError, match="needs 'as"):
            comp.run("select(search(salaries), person, add(pay, 1))")

    def test_rollup(self, comp):
        got = {r["dept"]: (r["count(*)"], r["sum(pid)"])
               for r in comp.run(
                   "rollup(search(people), over=dept, count(*), sum(pid))"
               ).collect()}
        assert got == {"eng": (2, 3), "ops": (1, 3), None: (1, 4)}

    def test_unique_takes_first_in_sort_order(self, comp):
        rows = comp.run(
            'unique(search(people, sort="pid desc"), over=dept)'
        ).collect()
        got = {r["dept"]: r["pid"] for r in rows}
        # pid desc -> the FIRST tuple per dept is the highest pid
        assert got == {"eng": 2, "ops": 3, None: 4}

    def test_top(self, comp):
        rows = comp.run(
            'top(search(people), n=2, sort="pid desc")'
        ).collect()
        assert [r["pid"] for r in rows] == [4, 3]

    def test_having_and_or(self, comp):
        rows = comp.run(
            "having(rollup(search(people), over=dept, count(*)), "
            "and(gt(count(*), 1), lt(count(*), 3)))"
        ).collect()
        assert [r["dept"] for r in rows] == ["eng"]

    def test_inner_and_left_join(self, comp):
        inner = comp.run(
            'innerJoin(search(people), search(salaries), on="pid=person")'
        )
        assert sorted(r["pid"] for r in inner.collect()) == [1, 2, 3]
        assert "person" not in inner.columns  # right key drops
        left = comp.run(
            'leftOuterJoin(search(people), search(salaries), on="pid=person")'
        )
        got = {r["pid"]: r["pay"] for r in left.collect()}
        assert got[4] is None and got[1] == 100.0

    def test_hashjoin_broadcasts(self, comp):
        df = comp.run(
            'hashJoin(search(people), hashed=search(salaries), on="pid=person")'
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Broadcast" in plan
        assert sorted(r["pid"] for r in df.collect()) == [1, 2, 3]

    def test_merge_union_and_sort(self, comp):
        rows = comp.run(
            'merge(search(people, fl="pid"), search(salaries, fl="person"), '
            'on="pid asc")'
        ).collect()
        # unionByName with missing columns null-filled, sorted by pid
        assert len(rows) == 7

    def test_fetch_enrichment(self, comp):
        rows = comp.run(
            'fetch(depts, search(people, fl="pid,dept"), fl="site", '
            'on="dept=dept")'
        ).collect()
        got = {r["pid"]: r["site"] for r in rows}
        assert got[1] == "building-1" and got[4] is None

    def test_fetch_broadcasts_stream_keys_not_collection(self, comp):
        # Plan shape: the one broadcast hint must land on the STREAM's
        # bounded distinct-key side; the collection is restricted via a
        # left-semi join, never broadcast wholesale (broadcasting the
        # collection projection OOMs the driver at scale).
        df = comp.run(
            'fetch(depts, search(people, fl="pid,dept"), fl="site", '
            'on="dept=dept")'
        )
        analyzed = df._jdf.queryExecution().analyzed().toString()
        assert analyzed.count("ResolvedHint") == 1
        assert "LeftSemi" in analyzed
        lines = analyzed.splitlines()
        i = next(n for n, l in enumerate(lines) if "ResolvedHint" in l)
        # the hinted subtree is the deduplicated stream-key projection
        assert any("Deduplicate" in l for l in lines[i + 1 : i + 3])

    def test_facet_limit_deterministic_without_bucketsorts(self, comp):
        # bucketSizeLimit without bucketSorts uses Solr's documented
        # default count(*) desc (bucket keys asc tiebreak): ordered
        # before limiting, so two runs return the SAME buckets — never
        # an arbitrary subset of an unordered aggregate.
        expr = 'facet(people, buckets="dept", count(*), bucketSizeLimit=1)'
        a = [tuple(r) for r in comp.run(expr).collect()]
        b = [tuple(r) for r in comp.run(expr).collect()]
        assert a == b == [("eng", 2)]  # the highest-count bucket

    def test_facet_explicit_bucketsorts_on_metric(self, comp):
        rows = comp.run(
            'facet(salaries, buckets="person", sum(pay), '
            'bucketSorts="sum(pay) desc", bucketSizeLimit=2)'
        ).collect()
        assert [r["person"] for r in rows] == [2, 1]

    def test_intersect_and_complement(self, comp):
        inter = comp.run(
            'intersect(search(people, fl="pid,name"), search(salaries), '
            'on="pid=person")'
        )
        assert sorted(r["pid"] for r in inter.collect()) == [1, 2, 3]
        assert inter.columns == ["pid", "name"]  # semi: left cols only
        comp_ = comp.run(
            'complement(search(people, fl="pid,name"), search(salaries), '
            'on="pid=person")'
        )
        assert [r["pid"] for r in comp_.collect()] == [4]

    def test_stats_global_row(self, comp):
        row = comp.run(
            "stats(salaries, sum(pay), avg(pay), count(*))"
        ).collect()
        assert len(row) == 1
        assert row[0]["sum(pay)"] == 310.0
        assert row[0]["count(*)"] == 3

    def test_cartesian_product_explodes(self, spark):
        df = spark.createDataFrame(
            [(1, ["a", "b"]), (2, None)], "id long, tags array<string>"
        )
        c = StreamCompiler({"tagged": df})
        rows = c.run("cartesianProduct(search(tagged), tags)").collect()
        got = sorted((r["id"], r["tags"]) for r in rows)
        # explode_outer: the NULL-array tuple survives with a null value
        assert got == [(1, "a"), (1, "b"), (2, None)]

    def test_timeseries_buckets(self, spark):
        from datetime import datetime

        df = spark.createDataFrame(
            [(datetime(2024, 1, 1, 5), 1.0), (datetime(2024, 1, 1, 9), 3.0),
             (datetime(2024, 1, 2, 1), 10.0), (datetime(2024, 1, 5, 1), 99.0)],
            "ts timestamp, v double",
        )
        c = StreamCompiler({"ev": df})
        rows = c.run(
            'timeseries(ev, field=ts, gap="+1DAY", '
            'start="2024-01-01 00:00:00", end="2024-01-03 00:00:00", '
            "count(*), sum(v))"
        ).collect()
        got = {str(r["ts"]): (r["count(*)"], r["sum(v)"]) for r in rows}
        assert got == {"2024-01-01 00:00:00": (2, 4.0),
                       "2024-01-02 00:00:00": (1, 10.0)}
        # a multi-unit gap is anchored at start — it REQUIRES one
        with pytest.raises(QuerySyntaxError, match="needs start="):
            c.run('timeseries(ev, field=ts, gap="+7DAYS", count(*))')
        with pytest.raises(QuerySyntaxError, match="unsupported gap"):
            c.run('timeseries(ev, field=ts, gap="DAY", count(*))')

    def test_timeseries_multi_unit_gap_anchored(self, spark):
        from datetime import datetime

        df = spark.createDataFrame(
            [(datetime(2024, 1, 1, 5), 1.0), (datetime(2024, 1, 1, 9), 3.0),
             (datetime(2024, 1, 1, 13), 10.0), (datetime(2024, 1, 2, 2), 99.0)],
            "ts timestamp, v double",
        )
        c = StreamCompiler({"ev": df})
        rows = c.run(
            'timeseries(ev, field=ts, gap="+6HOURS", '
            'start="2024-01-01T00:00:00Z", end="2024-01-02T00:00:00Z", '
            "count(*))"
        ).collect()
        got = {str(r["ts"]): r["count(*)"] for r in rows}
        # 6h buckets anchored at midnight: [00,06) has 05h, [06,12) has
        # 09h, [12,18) has 13h; the 01-02 row is outside [start, end)
        assert got == {"2024-01-01 00:00:00": 1, "2024-01-01 06:00:00": 1,
                       "2024-01-01 12:00:00": 1}

    def test_timeseries_datemath_bounds_with_pinned_now(self, spark):
        from datetime import datetime

        df = spark.createDataFrame(
            [(datetime(2024, 3, 9, 12), 1.0), (datetime(2024, 3, 10, 6), 2.0),
             (datetime(2024, 3, 11, 1), 4.0)],
            "ts timestamp, v double",
        )
        c = StreamCompiler({"ev": df})
        rows = c.run(
            'timeseries(ev, field=ts, gap="+1DAY", start="NOW-2DAYS/DAY", '
            'end="NOW/DAY", now="2024-03-11T15:00:00Z", count(*))'
        ).collect()
        got = {str(r["ts"]): r["count(*)"] for r in rows}
        # NOW pinned at 03-11T15:00 -> window [03-09 00:00, 03-11 00:00)
        assert got == {"2024-03-09 00:00:00": 1, "2024-03-10 00:00:00": 1}

    def test_timeseries_month_gap(self, spark):
        from datetime import datetime

        df = spark.createDataFrame(
            [(datetime(2024, 1, 15), 1.0), (datetime(2024, 2, 20), 2.0),
             (datetime(2024, 3, 2), 4.0), (datetime(2024, 5, 2), 8.0)],
            "ts timestamp, v double",
        )
        c = StreamCompiler({"ev": df})
        rows = c.run(
            'timeseries(ev, field=ts, gap="+2MONTHS", '
            'start="2024-01-01T00:00:00Z", end="2024-07-01T00:00:00Z", '
            "sum(v))"
        ).collect()
        got = {str(r["ts"]): r["sum(v)"] for r in rows}
        # 2-month buckets from Jan 1: [Jan,Mar) = 1+2, [Mar,May) = 4,
        # [May,Jul) = 8
        assert got == {"2024-01-01 00:00:00": 3.0,
                       "2024-03-01 00:00:00": 4.0,
                       "2024-05-01 00:00:00": 8.0}
        with pytest.raises(QuerySyntaxError, match="month-aligned"):
            c.run(
                'timeseries(ev, field=ts, gap="+1MONTH", '
                'start="2024-01-15T00:00:00Z", end="2024-07-01T00:00:00Z", '
                "sum(v))"
            )

    def test_nodes_one_hop_and_nested(self, spark):
        people = spark.createDataFrame(
            [(1, "mgr1"), (2, "mgr1"), (3, "mgr2")], "pid long, mgr string"
        )
        mgrs = spark.createDataFrame(
            [("mgr1", "dirA"), ("mgr2", "dirB"), ("mgr3", "dirA")],
            "mid string, director string",
        )
        c = StreamCompiler({"people": people, "mgrs": mgrs})
        # hop: people's mgr values -> mgrs docs -> gather director
        got = [r["node"] for r in c.run(
            'nodes(mgrs, search(people), walk="mgr->mid", gather="director")'
        ).collect()]
        assert got == ["dirA", "dirB"]  # distinct, sorted; mgr3 unreached
        # with a metric: traversal counts per node
        rows = c.run(
            'nodes(mgrs, search(people), walk="mgr->mid", gather="director", '
            "count(*))"
        ).collect()
        assert {r["node"]: r["count(*)"] for r in rows} == {"dirA": 1, "dirB": 1}
        with pytest.raises(QuerySyntaxError, match="walk="):
            c.run('nodes(mgrs, search(people), gather="director")')

    def test_reduce_group(self, comp):
        # per-dept head tuple + top-n members under the group sort
        rows = comp.run(
            'reduce(search(people), by="dept", '
            'group(sort="pid desc", n=2))'
        ).collect()
        by = {r["dept"]: r for r in rows}
        assert set(by) == {"eng", "ops", None}
        eng = by["eng"]
        assert eng["pid"] == 2  # head = first under pid desc
        assert [m["pid"] for m in eng["group"]] == [2, 1]
        assert [m["name"] for m in eng["group"]] == ["bob", "ada"]
        assert by["ops"]["pid"] == 3 and len(by["ops"]["group"]) == 1
        # unbounded group(): every member kept
        rows = comp.run(
            'reduce(search(people), by="dept", group(sort="pid asc"))'
        ).collect()
        assert {r["dept"]: len(r["group"]) for r in rows} == {
            "eng": 2, "ops": 1, None: 1}
        with pytest.raises(QuerySyntaxError, match="by="):
            comp.run('reduce(search(people), group(sort="pid asc"))')
        with pytest.raises(QuerySyntaxError, match="group"):
            comp.run('reduce(search(people), by="dept")')
        with pytest.raises(QuerySyntaxError, match="not in the stream"):
            comp.run('reduce(search(people), by="ghost", '
                     'group(sort="pid asc"))')

    def test_drill_input(self, comp):
        # drill's inner rollup over input() == rollup over search —
        # Spark's partial-agg shuffle IS the pushed-down plan
        a = comp.run(
            'drill(people, q="*:*", fl="pid,dept", '
            'rollup(input(), over=dept, count(*)))'
        ).collect()
        b = comp.run(
            'rollup(search(people, fl="pid,dept"), over=dept, count(*))'
        ).collect()
        key = lambda t: tuple(str(x) for x in t)  # noqa: E731 (None dept)
        assert sorted(map(tuple, a), key=key) == sorted(
            map(tuple, b), key=key)
        with pytest.raises(QuerySyntaxError, match="inner expression"):
            comp.run("drill(people)")
        with pytest.raises(QuerySyntaxError, match="only valid inside"):
            comp.run("rollup(input(), over=dept, count(*))")

    def test_shuffle_aliases_search(self, comp):
        a = comp.run('search(people, fl="pid,name", sort="pid asc")')
        b = comp.run('shuffle(people, fl="pid,name", sort="pid asc")')
        assert [tuple(r) for r in a.collect()] == [
            tuple(r) for r in b.collect()]

    def test_outer_hash_join(self, comp):
        # left rows with no hashed match survive with nulls (vs hashJoin)
        rows = comp.run(
            'outerHashJoin(search(people), hashed=search(salaries), '
            'on="pid=person")'
        ).collect()
        by = {r["pid"]: r for r in rows}
        assert len(rows) == 4 and by[4]["pay"] is None
        inner = comp.run(
            'hashJoin(search(people), hashed=search(salaries), '
            'on="pid=person")'
        ).collect()
        assert len(inner) == 3
        # the hashed side carries the broadcast hint
        plan = comp.run(
            'outerHashJoin(search(people), hashed=search(salaries), '
            'on="pid=person")'
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_score_nodes(self, spark):
        import math

        people = spark.createDataFrame(
            [(1, "mgr1"), (2, "mgr1"), (3, "mgr2")], "pid long, mgr string"
        )
        mgrs = spark.createDataFrame(
            [("mgr1", "dirA"), ("mgr2", "dirB"), ("mgr3", "dirA")],
            "mid string, director string",
        )
        c = StreamCompiler({"people": people, "mgrs": mgrs})
        rows = c.run(
            'scoreNodes(nodes(mgrs, search(people), walk="mgr->mid", '
            'gather="director", count(*)))'
        ).collect()
        by = {r["node"]: r for r in rows}
        # numDocs=3; dirA in 2 mgr docs, dirB in 1 — the rarer node
        # outranks the common one at equal traversal counts
        assert by["dirA"]["docFreq"] == 2 and by["dirB"]["docFreq"] == 1
        assert by["dirA"]["nodeScore"] == pytest.approx(math.log(4 / 3))
        assert by["dirB"]["nodeScore"] == pytest.approx(math.log(4 / 2))
        assert [r["node"] for r in rows] == ["dirB", "dirA"]  # score desc
        # count(*)-less nodes() stream: counts default to 1
        rows = c.run(
            'scoreNodes(nodes(mgrs, search(people), walk="mgr->mid", '
            'gather="director"))'
        ).collect()
        assert all(r["count(*)"] == 1 for r in rows)
        # explicit collection=/field= when inference has nothing to see
        rows = c.run(
            'scoreNodes(sort(nodes(mgrs, search(people), walk="mgr->mid", '
            'gather="director"), by="node asc"), collection=mgrs, '
            "field=director)"
        ).collect()
        assert len(rows) == 2
        with pytest.raises(QuerySyntaxError, match="infer"):
            c.run("scoreNodes(search(people))")
        with pytest.raises(QuerySyntaxError, match="'node' column"):
            c.run("scoreNodes(search(people), collection=mgrs, "
                  "field=director)")
        # plan shape AFTER execution (AQE final): the docFreq
        # restriction and the enrich join broadcast the bounded node
        # side — no sort-merge join of the collection survives runtime
        # re-planning (nodes()'s frontier join is AQE-broadcast; the
        # scoreNodes joins carry explicit hints)
        df = c.run(
            'scoreNodes(nodes(mgrs, search(people), walk="mgr->mid", '
            'gather="director", count(*)))'
        )
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        # AQE's toString appends the pre-runtime "Initial Plan" section
        # — judge the FINAL plan only
        final = plan.split("Initial Plan", 1)[0]
        assert "SortMergeJoin" not in final
        assert "BroadcastHashJoin" in final and "LeftSemi" in final

    def test_shortest_path(self, spark):
        # a -> b -> d and a -> c -> d (two shortest), plus a longer
        # a -> e -> f -> d that must NOT be returned
        edges = spark.createDataFrame(
            [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
             ("a", "e"), ("e", "f"), ("f", "d")],
            "src string, dst string",
        )
        c = StreamCompiler({"g": edges})
        rows = c.run(
            'shortestPath(g, from="a", to="d", edge="src=dst", maxDepth=4)'
        ).collect()
        got = sorted(tuple(r["path"]) for r in rows)
        assert got == [("a", "b", "d"), ("a", "c", "d")]
        # no path within depth
        assert c.run(
            'shortestPath(g, from="d", to="a", edge="src=dst", maxDepth=3)'
        ).count() == 0
        # from == to: the trivial path
        triv = c.run(
            'shortestPath(g, from="a", to="a", edge="src=dst")'
        ).collect()
        assert [tuple(r["path"]) for r in triv] == [("a",)]
        with pytest.raises(QuerySyntaxError, match="needs from="):
            c.run('shortestPath(g, from="a", to="d")')

    def test_unknown_decorator_and_collection(self, comp):
        with pytest.raises(QuerySyntaxError, match="unknown stream decorator"):
            comp.run("nope(search(people))")
        with pytest.raises(QuerySyntaxError, match="unknown collection"):
            comp.run("search(ghosts)")


class TestSearchIndexSource:
    def test_q_rides_the_compiled_scan(self, spark, tmp_path):
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
            [("1", "spark shuffle", "a"), ("2", "spark scan", "b"),
             ("3", "other", "a")],
            "id string, text string, grp string",
        )
        out = str(tmp_path / "sidx")
        IndexJob(IndexJobConfig(schema=schema, shards=1, dedup="none")).build(df, out)
        comp = StreamCompiler({"docs": SearchIndex.open(spark, out)})
        rows = comp.run(
            'rollup(search(docs, q="spark"), over=grp, count(*))'
        ).collect()
        assert {r["grp"]: r["count(*)"] for r in rows} == {"a": 1, "b": 1}
        # fq composes as an extra predicate on the same scan
        rows = comp.run(
            'search(docs, q="spark", fq="grp:a", fl="id")'
        ).collect()
        assert [r["id"] for r in rows] == ["1"]

    def test_significant_terms(self, spark, tmp_path):
        from solr_map_reduce_spark.index_reader import SearchIndex
        from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
        from solr_map_reduce_spark.schema import Field, IndexSchema

        schema = IndexSchema(
            fields=(Field("id", "string", required=True),
                    Field("text", "text_general"),
                    Field("grp", "string")),
            unique_key="id",
        )
        # 'rare' appears in 2/2 foreground docs but 2/6 overall (high
        # lift); 'common' appears everywhere (lift 1)
        rows = [("1", "rare common", "fg"), ("2", "rare common", "fg"),
                ("3", "common", "bg"), ("4", "common", "bg"),
                ("5", "common", "bg"), ("6", "common", "bg")]
        df = spark.createDataFrame(rows, "id string, text string, grp string")
        out = str(tmp_path / "sig")
        IndexJob(IndexJobConfig(schema=schema, shards=1, dedup="none")).build(df, out)
        comp = StreamCompiler({"docs": SearchIndex.open(spark, out)})
        got = comp.run(
            'significantTerms(docs, q="grp:fg", limit=5, minDocFreq=1)'
        ).collect()
        assert got[0]["term"] == "rare"
        assert got[0]["foreground"] == 2 and got[0]["background"] == 2
        by_term = {r["term"]: r["score"] for r in got}
        assert by_term["rare"] > by_term["common"]
        with pytest.raises(QuerySyntaxError, match="SearchIndex source"):
            StreamCompiler({"plain": df}).run("significantTerms(plain)")
        # single-pass contract: COMPILING the expression runs no Spark
        # job (the old shape ran fg.count() eagerly — an extra scan per
        # query); the foreground doc count folds into the one rollup
        sc = spark.sparkContext
        sc.setJobGroup("sigterms_compile", "compile-only")
        try:
            comp.run('significantTerms(docs, q="grp:fg", limit=5, '
                     "minDocFreq=1)")
        finally:
            sc.setJobGroup("default", "")
        tracker = sc.statusTracker()
        assert tracker.getJobIdsForGroup("sigterms_compile") == []


class TestReviewFixesR8b:
    """End-of-session review regressions: repeated fq accumulates,
    un-runnable filters error instead of silently passing, timeseries
    honors q."""

    def test_duplicate_fq_accumulates(self, spark, tmp_path):
        from solr_map_reduce_spark.index_reader import SearchIndex
        from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
        from solr_map_reduce_spark.schema import Field, IndexSchema

        node = parse_stream_expr('search(c, fq="a:1", fq="b:2")')
        assert node.kwargs["fq"] == ["a:1", "b:2"]
        with pytest.raises(QuerySyntaxError, match="duplicate parameter"):
            parse_stream_expr('search(c, q="x", q="y")')

        schema = IndexSchema(
            fields=(Field("id", "string", required=True),
                    Field("text", "text_general"),
                    Field("grp", "string"), Field("lang", "string")),
            unique_key="id",
        )
        df = spark.createDataFrame(
            [("1", "spark", "a", "de"), ("2", "spark", "a", "en"),
             ("3", "spark", "b", "de")],
            "id string, text string, grp string, lang string",
        )
        out = str(tmp_path / "fq2")
        IndexJob(IndexJobConfig(schema=schema, shards=1, dedup="none")).build(df, out)
        comp = StreamCompiler({"docs": SearchIndex.open(spark, out)})
        rows = comp.run(
            'search(docs, q="spark", fq="grp:a", fq="lang:de", fl="id")'
        ).collect()
        assert [r["id"] for r in rows] == ["1"]  # BOTH filters applied

    def test_plain_source_fq_is_loud(self, comp):
        with pytest.raises(QuerySyntaxError, match="q=/fq="):
            comp.run('search(people, fq="dept:eng")')
        with pytest.raises(QuerySyntaxError, match="q=/fq="):
            comp.run('stats(salaries, q="pay:100", sum(pay))')

    def test_timeseries_honors_q(self, spark, tmp_path):
        from datetime import datetime

        from solr_map_reduce_spark.index_reader import SearchIndex
        from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
        from solr_map_reduce_spark.schema import Field, IndexSchema

        schema = IndexSchema(
            fields=(Field("id", "string", required=True),
                    Field("text", "text_general"),
                    Field("ts", "tdate")),
            unique_key="id",
        )
        df = spark.createDataFrame(
            [("1", "click event", datetime(2024, 1, 1, 5)),
             ("2", "view event", datetime(2024, 1, 1, 9)),
             ("3", "click event", datetime(2024, 1, 2, 1))],
            "id string, text string, ts timestamp",
        )
        out = str(tmp_path / "tsq")
        IndexJob(IndexJobConfig(schema=schema, shards=1, dedup="none")).build(df, out)
        comp = StreamCompiler({"ev": SearchIndex.open(spark, out)})
        rows = comp.run(
            'timeseries(ev, q="click", field=ts, gap="+1DAY", count(*))'
        ).collect()
        got = {str(r["ts"]): r["count(*)"] for r in rows}
        # only the two CLICK docs count — the view doc is filtered by q
        assert got == {"2024-01-01 00:00:00": 1, "2024-01-02 00:00:00": 1}


class TestAliasSource:
    def test_alias_collection_in_stream(self, spark, tmp_path):
        """A MultiIndex binds as a stream collection: q= fans out to each
        member's pruned scan (fq= is rejected — fold it into q)."""
        from solr_map_reduce_spark.index_reader import MultiIndex
        from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
        from solr_map_reduce_spark.schema import Field, IndexSchema

        schema = IndexSchema(
            fields=(Field("id", "string", required=True),
                    Field("text", "text_general"),
                    Field("grp", "string")),
            unique_key="id",
        )
        rows = [(str(i), "spark" if i % 2 else "other", "ab"[i % 2])
                for i in range(10)]
        df = spark.createDataFrame(rows, "id string, text string, grp string")
        paths = []
        for part in (0, 1):
            out = str(tmp_path / f"s{part}")
            IndexJob(IndexJobConfig(schema=schema, shards=1, dedup="none")).build(
                df.filter(F.col("id").cast("long") % 2 == part), out)
            paths.append(out)
        alias = MultiIndex.open(spark, paths)
        c = StreamCompiler({"docs": alias})
        got = c.run(
            'rollup(search(docs, q="spark"), over=grp, count(*))'
        ).collect()
        assert {r["grp"]: r["count(*)"] for r in got} == {"b": 5}
        with pytest.raises(QuerySyntaxError, match="alias"):
            c.run('search(docs, fq="grp:a")')


class TestAnalyzeEvaluator:
    def test_analyze_tokenizes_with_named_analyzer(self, spark):
        df = spark.createDataFrame(
            [(1, "Hello, World! Running fast")], "id long, text string"
        )
        c = StreamCompiler({"t": df})
        row = c.run(
            "select(search(t), id, analyze(text, text_general) as toks)"
        ).collect()[0]
        assert row["toks"] == ["hello", "world", "running", "fast"]
        with pytest.raises(QuerySyntaxError, match="unknown fieldType"):
            c.run("select(search(t), analyze(text, nope) as x)")
        with pytest.raises(QuerySyntaxError, match="takes \\(field"):
            c.run("select(search(t), analyze(text) as x)")


class TestLiteralStreams:
    def test_echo_and_tuple(self, comp):
        assert comp.run('echo("hello world")').collect()[0]["echo"] == "hello world"
        row = comp.run('tuple(id=7, name="x")').collect()[0]
        assert row["id"] == 7.0 and row["name"] == "x"
        # literal streams compose: join a tuple against a collection
        got = comp.run(
            'innerJoin(search(people), tuple(k="eng"), on="dept=k")'
        ).collect()
        assert sorted(r["pid"] for r in got) == [1, 2]
        with pytest.raises(QuerySyntaxError, match="key=value"):
            comp.run("tuple()")


class TestTopicUpdateDaemon:
    """The incremental-consumption tail of the DSL: topic() pulls only
    docs newer than its checkpoint, update() writes a stream into an
    artifact via merge_into, daemon() runs one iteration per run()."""

    @pytest.fixture()
    def setup(self, spark, tmp_path):
        from solr_map_reduce_spark.index_reader import SearchIndex
        from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
        from solr_map_reduce_spark.schema import Field, IndexSchema
        from solr_map_reduce_spark.extensions.stream_expr import StreamCompiler

        schema = IndexSchema(
            fields=(Field("id", "string", required=True),
                    Field("text", "text_general"),
                    Field("n", "long")),
            unique_key="id",
        )
        job = IndexJob(IndexJobConfig(
            schema=schema, shards=2, dedup="none", doc_versions=True,
        ))
        src_path = str(tmp_path / "src_idx")
        dst_path = str(tmp_path / "dst_idx")
        df = spark.createDataFrame(
            [("1", "alpha", 1), ("2", "beta", 2), ("3", "gamma", 3)],
            "id string, text string, n long",
        )
        job.build(df, src_path)
        job.build(df.limit(0), dst_path)

        def compiler():
            return StreamCompiler(
                {"src": SearchIndex.open(spark, src_path)},
                checkpoint_dir=str(tmp_path / "ckpts"),
                destinations={"dst": (job, dst_path)},
            )

        (tmp_path / "ckpts").mkdir()
        return spark, job, src_path, dst_path, compiler

    def test_topic_pull_commit_redelivery(self, setup):
        spark, job, src_path, _dst, compiler = setup
        c = compiler()
        expr = 'topic(ckpts, src, id="t1", fl="id")'
        first = c.run(expr)
        assert sorted(r["id"] for r in first.collect()) == ["1", "2", "3"]
        # NOT committed: a fresh compiler re-delivers (at-least-once)
        again = compiler().run(expr)
        assert again.count() == 3
        c.commit_topics()
        # committed: nothing new
        assert compiler().run(expr).count() == 0
        # merge a batch: only the merged docs re-deliver
        batch = spark.createDataFrame(
            [("2", "beta2", 2), ("4", "delta", 4)],
            "id string, text string, n long",
        )
        job.merge_into(batch, src_path)
        c2 = compiler()
        got = sorted(r["id"] for r in c2.run(expr).collect())
        assert got == ["2", "4"]
        c2.commit_topics()
        assert compiler().run(expr).count() == 0

    def test_update_writes_stream_into_destination(self, setup):
        spark, _job, _src, dst_path, compiler = setup
        from solr_map_reduce_spark.index_reader import SearchIndex

        c = compiler()
        row = c.run(
            'update(dst, search(src, fl="id,text,n"))'
        ).collect()
        assert row[0]["batchIndexed"] == 3
        dst = SearchIndex.open(spark, dst_path)
        assert dst.count() == 3

    def test_commit_wraps_update_as_passthrough(self, setup):
        # Solr's commit(dst, update(...)): our merge_into publishes
        # atomically, so commit() validates and passes through
        spark, job, src_path, dst_path, compiler = setup
        from solr_map_reduce_spark.index_reader import SearchIndex

        row = compiler().run(
            'commit(dst, update(dst, search(src, fl="id,text,n")), '
            'batchSize=100, waitFlush=true)'
        ).collect()
        assert row[0]["batchIndexed"] == 3
        assert SearchIndex.open(spark, dst_path).count() == 3
        with pytest.raises(QuerySyntaxError, match="unknown destination"):
            compiler().run('commit(nope, update(dst, search(src)))')

    def test_daemon_iteration_topic_to_update(self, setup):
        # the canonical Solr shape: daemon(update(dst, topic(...)))
        # — each run() is one pull->index iteration
        spark, job, src_path, dst_path, compiler = setup
        from solr_map_reduce_spark.index_reader import SearchIndex

        c = compiler()
        expr = ('daemon(update(dst, topic(ckpts, src, id="d1", '
                'fl="id,text,n")), id="d1", runInterval=1000)')
        assert c.run(expr).collect()[0]["batchIndexed"] == 3
        c.commit_topics()
        dst = SearchIndex.open(spark, dst_path)
        assert dst.count() == 3
        # second iteration: nothing new -> empty batch indexed
        c2 = compiler()
        assert c2.run(expr).collect()[0]["batchIndexed"] == 0
        c2.commit_topics()
        assert SearchIndex.open(spark, dst_path).count() == 3

    def test_errors_are_loud(self, setup, spark):
        from solr_map_reduce_spark.extensions.stream_expr import StreamCompiler

        _spark, _job, _src, _dst, compiler = setup
        c = compiler()
        with pytest.raises(QuerySyntaxError, match="checkpoint_dir"):
            StreamCompiler({"x": spark.range(1)}).run(
                'topic(ck, x, id="t")')
        with pytest.raises(QuerySyntaxError, match="needs id="):
            c.run("topic(ckpts, src)")
        with pytest.raises(QuerySyntaxError, match="SearchIndex collection"):
            StreamCompiler({"x": spark.range(1)}, checkpoint_dir="/tmp").run(
                'topic(ck, x, id="t")')
        with pytest.raises(QuerySyntaxError, match="destination"):
            c.run('update(nope, search(src))')
        with pytest.raises(QuerySyntaxError, match="daemon\\(\\) needs id="):
            c.run('daemon(search(src))')
        with pytest.raises(QuerySyntaxError, match="runInterval"):
            c.run('daemon(search(src), id="d", runInterval=fast)')


class TestStringEvaluators:
    def test_quoted_positional_args_are_literals(self):
        node = parse_stream_expr('concat(name, "-", dept)')
        from solr_map_reduce_spark.extensions.stream_expr import Quoted

        assert node.args[0] == "name" and not isinstance(node.args[0], Quoted)
        assert node.args[1] == "-" and isinstance(node.args[1], Quoted)
        # a quoted-then-more token still reads as one raw arg
        node2 = parse_stream_expr('f("a"b)')
        assert node2.args == ["ab"]

    def test_string_evaluators(self, comp):
        rows = comp.run(
            'select(search(people), pid, '
            'concat(upper(name), "-", dept) as tag, '
            "strlen(name) as nl, "
            "substring(name, 0, 2) as pre, "
            "trim(name) as t)"
        ).collect()
        got = {r["pid"]: (r["tag"], r["nl"], r["pre"]) for r in rows}
        assert got[1] == ("ADA-eng", 3, "ad")
        assert got[3] == ("CY-ops", 2, "cy")
        # dee has NULL dept: concat of a null is null (SQL semantics)
        assert got[4][0] is None

    def test_having_string_equality(self, comp):
        rows = comp.run(
            'having(search(people), eq(dept, "eng"))'
        ).collect()
        assert sorted(r["pid"] for r in rows) == [1, 2]

    def test_substring_validates(self, comp):
        with pytest.raises(QuerySyntaxError, match="integer literals"):
            comp.run('select(search(people), substring(name, x, 2) as s)')
        with pytest.raises(QuerySyntaxError, match="0 <= start"):
            comp.run('select(search(people), substring(name, 2, 1) as s)')


class TestRandomStream:
    def test_seeded_random_is_deterministic(self, comp):
        expr = 'random(people, fl="pid", rows=2, seed=42)'
        a = [r["pid"] for r in comp.run(expr).collect()]
        b = [r["pid"] for r in comp.run(expr).collect()]
        assert a == b and len(a) == 2
        # a different seed draws a different order (4 ids, md5-scrambled)
        c = [r["pid"] for r in comp.run(
            'random(people, fl="pid", rows=4, seed=43)').collect()]
        d = [r["pid"] for r in comp.run(
            'random(people, fl="pid", rows=4, seed=42)').collect()]
        assert sorted(c) == sorted(d) == [1, 2, 3, 4]
        assert c != d  # astronomically unlikely to collide

    def test_unseeded_respects_rows(self, comp):
        got = comp.run('random(people, fl="pid", rows=3)').collect()
        assert len(got) == 3


class TestParallelPassThrough:
    def test_parallel_wraps_and_sorts(self, comp):
        # Spark executes every stream distributed; parallel() is a
        # compatibility pass-through whose sort= becomes the merge order
        rows = comp.run(
            'parallel(workers, top(search(people), n=3, sort="pid asc"), '
            'workers=4, sort="pid desc")'
        ).collect()
        assert [r["pid"] for r in rows] == [3, 2, 1]
        with pytest.raises(QuerySyntaxError, match="workers must be"):
            comp.run('parallel(w, search(people), workers=many)')


class TestFacet2D:
    def test_top_x_then_top_y(self, spark):
        df = spark.createDataFrame(
            [("a", "p"), ("a", "p"), ("a", "q"), ("a", "r"),
             ("b", "p"), ("b", "q"), ("c", "p")],
            "x string, y string",
        )
        c = StreamCompiler({"t": df})
        rows = c.run(
            'facet2D(t, x="x", y="y", dimensions="2,1", count(*))'
        ).collect()
        got = [(r["x"], r["y"], r["count(*)"]) for r in rows]
        # top-2 x by count: a(4), b(2); top-1 y within each by count
        # desc then y asc: a->p(2), b->p(1)
        assert got == [("a", "p", 2), ("b", "p", 1)]

    def test_validates(self, spark):
        c = StreamCompiler({"t": spark.range(1)})
        with pytest.raises(QuerySyntaxError, match="x= and y="):
            c.run("facet2D(t, count(*))")
        with pytest.raises(QuerySyntaxError, match="dimensions"):
            c.run('facet2D(t, x="id", y="id", dimensions="3", count(*))')


class TestSearchNowParam:
    def test_search_q_date_math_pinned_by_now(self, spark, tmp_path):
        """now= on search() pins NOW for date-math range bounds in q=
        (Solr's NOW= request param through the /stream surface)."""
        from datetime import datetime

        from solr_map_reduce_spark.index_reader import SearchIndex
        from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
        from solr_map_reduce_spark.schema import Field, IndexSchema

        schema = IndexSchema(
            fields=(Field("id", "string", required=True),
                    Field("ts", "tdate")),
            unique_key="id",
        )
        df = spark.createDataFrame(
            [("old", datetime(2024, 3, 1)), ("mid", datetime(2024, 3, 9, 5)),
             ("new", datetime(2024, 3, 10, 12))],
            "id string, ts timestamp",
        )
        out = str(tmp_path / "tsidx")
        IndexJob(IndexJobConfig(schema=schema, shards=1, dedup="none")).build(df, out)
        c = StreamCompiler({"ev": SearchIndex.open(spark, out)})
        rows = c.run(
            'search(ev, q="ts:[NOW-2DAYS/DAY TO NOW]", fl="id", '
            'now="2024-03-10T18:00:00Z")'
        ).collect()
        # window [2024-03-08 00:00, 2024-03-10 18:00]: mid and new
        assert sorted(r["id"] for r in rows) == ["mid", "new"]


class TestHavingNullProbes:
    def test_isnull_notnull(self, comp):
        rows = comp.run('having(search(people), isNull(dept))').collect()
        assert [r["pid"] for r in rows] == [4]
        rows = comp.run('having(search(people), notNull(dept))').collect()
        assert sorted(r["pid"] for r in rows) == [1, 2, 3]
        with pytest.raises(QuerySyntaxError, match="one field arg"):
            comp.run('having(search(people), isNull(eq(pid, 1)))')


class TestListPlistNullKnn:
    def test_list_unions_streams_null_filling(self, comp):
        df = comp.run(
            'list(search(people, fl="pid,name"), '
            'search(salaries, fl="person,pay"))'
        )
        rows = df.collect()
        assert len(rows) == 7
        assert set(df.columns) == {"pid", "name", "person", "pay"}
        # tuples keep their own fields; the other stream's are null
        people_rows = [r for r in rows if r["pid"] is not None]
        assert all(r["pay"] is None for r in people_rows)

    def test_plist_is_the_same_plan(self, comp):
        a = comp.run('list(search(people, fl="pid"), search(salaries, '
                     'fl="person"))')
        b = comp.run('plist(search(people, fl="pid"), search(salaries, '
                     'fl="person"))')
        key = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
        assert (sorted(map(tuple, a.collect()), key=key)
                == sorted(map(tuple, b.collect()), key=key))

    def test_list_needs_two_streams(self, comp):
        with pytest.raises(QuerySyntaxError, match=">=2 streams"):
            comp.run("list(search(people))")

    def test_null_consumes_and_counts(self, comp):
        rows = comp.run("null(search(people))").collect()
        assert len(rows) == 1 and rows[0]["nullCount"] == 4

    def test_knn_search_mlt(self, spark, tmp_path):
        from solr_map_reduce_spark.index_reader import SearchIndex
        from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
        from solr_map_reduce_spark.schema import Field, IndexSchema

        schema = IndexSchema(
            fields=(Field("id", "string", required=True),
                    Field("text", "text_general")),
            unique_key="id",
        )
        rows = [("1", "spark shuffle exchange partition"),
                ("2", "spark shuffle exchange"),
                ("3", "spark scan parquet"),
                ("4", "gardening soil compost")]
        df = spark.createDataFrame(rows, "id string, text string")
        out = str(tmp_path / "knnidx")
        IndexJob(IndexJobConfig(schema=schema, shards=1, dedup="none")).build(
            df, out)
        comp = StreamCompiler({"docs": SearchIndex.open(spark, out)})
        got = comp.run('knnSearch(docs, id="1", k=2, fl="id")').collect()
        ids = [r["id"] for r in got]
        assert "1" not in ids          # source doc excluded
        assert ids and ids[0] == "2"   # nearest by shared distinctive terms
        with pytest.raises(QuerySyntaxError, match="needs id="):
            comp.run("knnSearch(docs, k=2)")
        with pytest.raises(QuerySyntaxError, match="SearchIndex source"):
            StreamCompiler({"plain": df}).run('knnSearch(plain, id="1")')


class TestExtendedMetrics:
    def test_countdist_std_per(self, comp):
        rows = comp.run(
            "rollup(search(people), over=dept, count(*), countDist(pid), "
            "std(pid), per(pid, 50))"
        ).collect()
        got = {r["dept"]: (r["countDist(pid)"], r["std(pid)"],
                           r["per(pid,50)"]) for r in rows}
        # eng: pids 1,2 -> dist 2, std ~0.707, median 1.5
        assert got["eng"][0] == 2
        assert abs(got["eng"][1] - 0.7071067811865476) < 1e-12
        assert got["eng"][2] == 1.5

    def test_stats_with_extended_metrics(self, comp):
        row = comp.run(
            "stats(salaries, per(pay, 50), std(pay), countDist(person))"
        ).collect()[0]
        assert row["per(pay,50)"] == 100.0   # 90,100,120 median
        assert row["countDist(person)"] == 3

    def test_per_errors(self, comp):
        with pytest.raises(QuerySyntaxError, match="0..100"):
            comp.run("stats(salaries, per(pay, 200))")
        with pytest.raises(QuerySyntaxError, match="field, percentile"):
            comp.run("stats(salaries, per(pay))")

    def test_approx_per(self, comp):
        # the corpus-scale sketch variant: exact on tiny data at this
        # accuracy, and the plan carries the approx aggregate
        row = comp.run(
            "stats(salaries, approxPer(pay, 50), per(pay, 50))"
        ).collect()[0]
        assert row["approxPer(pay,50)"] == 100.0
        assert row["per(pay,50)"] == 100.0
        df = comp.run("stats(salaries, approxPer(pay, 95))")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "approx_percentile" in plan or "percentile_approx" in plan
