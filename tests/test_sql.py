"""Solr Parallel SQL (the /sql handler dialect) over the engine:
parser unit tests, compiled-plan semantics against both a plain
DataFrame collection and a SearchIndex artifact (full-text predicate
mapping), and the documented error contract.

The dialect follows Solr's public "SQL Query Language" guide (the
reference repo itself has no SQL endpoint — beyond-reference surface).
"""

import pytest

from solr_map_reduce_spark.extensions.sql import (
    Agg,
    BoolOp,
    Cmp,
    Col,
    LikeOp,
    SqlEngine,
    SqlSyntaxError,
    parse_sql,
)
from solr_map_reduce_spark.index_reader import SearchIndex
from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
from solr_map_reduce_spark.schema import Field, IndexSchema


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        ("p1", "eng", 30, 100.0, "alice"),
        ("p2", "eng", 35, 200.0, "bob"),
        ("p3", "ops", 40, 150.0, "carol"),
        ("p4", "ops", 25, 50.0, "dave"),
        ("p5", "eng", 30, 300.0, None),
        ("p6", None, 20, 10.0, "eve"),
    ]
    return spark.createDataFrame(
        rows, "id string, dept string, age int, pay double, name string"
    )


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    schema = IndexSchema(
        fields=(Field("id", "string", required=True),
                Field("text", "text_general"),
                Field("dept", "string"),
                Field("n", "long")),
        unique_key="id",
    )
    rows = [
        ("d1", "spark shuffle join", "eng", 10),
        ("d2", "spark vector index", "eng", 20),
        ("d3", "hash table scan", "ops", 30),
        ("d4", "vector spark table", "ops", 40),
        ("d5", "plain prose here", "eng", 50),
    ]
    df = spark.createDataFrame(rows, "id string, text string, dept string, n long")
    out = str(tmp_path_factory.mktemp("sqlidx") / "idx")
    IndexJob(IndexJobConfig(schema=schema, shards=2, dedup="none",
                            term_blooms=True)).build(df, out)
    return SearchIndex.open(spark, out)


class TestParser:
    def test_basic_shape(self):
        s = parse_sql(
            "SELECT a, count(*) AS c FROM t WHERE x = 1 GROUP BY a "
            "HAVING count(*) > 2 ORDER BY c DESC, a LIMIT 5 OFFSET 2;"
        )
        assert s.table == "t"
        assert s.items[0] == (Col("a"), None)
        agg, alias = s.items[1]
        assert isinstance(agg, Agg) and agg.fn == "count" and alias == "c"
        assert isinstance(s.where, Cmp)
        assert [c.name for c in s.group_by] == ["a"]
        assert isinstance(s.having, Cmp) and isinstance(s.having.left, Agg)
        assert s.order_by[0][1] == "desc" and s.order_by[1][1] == "asc"
        assert s.limit == 5 and s.offset == 2

    def test_string_escapes_and_quoted_identifiers(self):
        s = parse_sql("""SELECT "odd name" FROM t WHERE a = 'it''s'""")
        assert s.items[0][0].name == "odd name"
        assert s.where.right.value == "it's"

    def test_predicate_grammar(self):
        s = parse_sql(
            "SELECT a FROM t WHERE (a LIKE 'x%' OR b IN (1, 2)) AND "
            "c BETWEEN 3 AND 4 AND d IS NOT NULL AND NOT e = 'q'"
        )
        top = s.where
        assert isinstance(top, BoolOp) and top.op == "and"
        assert isinstance(top.parts[0], BoolOp) and top.parts[0].op == "or"
        assert isinstance(top.parts[0].parts[0], LikeOp)

    def test_errors_are_loud(self):
        for bad in [
            "SELECT FROM t",
            "SELECT a t",                        # missing FROM
            "SELECT a FROM t WHERE a LIKE 5",
            "SELECT a FROM t ORDER BY a LIMIT x",
            "SELECT a FROM t LIMIT 5 OFFSET 2",  # offset without order
            "SELECT sum(*) FROM t",
            "SELECT a FROM t WHERE NOT",
            "SELECT a FROM t extra junk",
        ]:
            with pytest.raises(SqlSyntaxError):
                parse_sql(bad)


class TestDataFrameCollection:
    def eng(self, people):
        return SqlEngine({"people": people})

    def test_select_where_order_limit(self, people):
        got = self.eng(people).sql(
            "SELECT id, age FROM people WHERE age >= 30 AND dept = 'eng' "
            "ORDER BY age DESC, id LIMIT 2"
        ).collect()
        assert [(r.id, r.age) for r in got] == [("p2", 35), ("p1", 30)]

    def test_group_having(self, people):
        got = self.eng(people).sql(
            "SELECT dept, count(*) AS cnt, avg(pay) AS mu FROM people "
            "WHERE dept IS NOT NULL GROUP BY dept "
            "HAVING count(*) >= 2 ORDER BY cnt DESC, dept"
        ).collect()
        assert [(r.dept, r.cnt) for r in got] == [("eng", 3), ("ops", 2)]
        assert got[0].mu == pytest.approx(200.0)

    def test_global_aggregate_and_count_distinct(self, people):
        row = self.eng(people).sql(
            "SELECT count(*) AS n, count(distinct dept) AS d, "
            "min(age) AS lo, max(age) AS hi FROM people"
        ).collect()[0]
        assert (row.n, row.d, row.lo, row.hi) == (6, 2, 20, 40)

    def test_order_by_unselected_aggregate_stays_hidden(self, people):
        df = self.eng(people).sql(
            "SELECT dept FROM people WHERE dept IS NOT NULL "
            "GROUP BY dept ORDER BY sum(pay) DESC, dept"
        )
        assert df.columns == ["dept"]
        assert [r.dept for r in df.collect()] == ["eng", "ops"]

    def test_distinct(self, people):
        got = self.eng(people).sql(
            "SELECT DISTINCT dept FROM people WHERE dept IS NOT NULL "
            "ORDER BY dept"
        ).collect()
        assert [r.dept for r in got] == ["eng", "ops"]

    def test_in_between_like_null(self, people):
        e = self.eng(people)
        assert e.sql(
            "SELECT count(*) AS n FROM people WHERE id IN ('p1','p9')"
        ).collect()[0].n == 1
        assert e.sql(
            "SELECT count(*) AS n FROM people WHERE age BETWEEN 30 AND 35"
        ).collect()[0].n == 3
        assert e.sql(
            "SELECT count(*) AS n FROM people WHERE name LIKE 'a%'"
        ).collect()[0].n == 1
        assert e.sql(
            "SELECT count(*) AS n FROM people WHERE name IS NULL"
        ).collect()[0].n == 1
        assert e.sql(
            "SELECT count(*) AS n FROM people WHERE age NOT BETWEEN 21 AND 39"
        ).collect()[0].n == 2

    def test_offset_paging_is_deterministic(self, people):
        e = self.eng(people)
        all_ids = [r.id for r in e.sql(
            "SELECT id FROM people ORDER BY id"
        ).collect()]
        page2 = [r.id for r in e.sql(
            "SELECT id FROM people ORDER BY id LIMIT 2 OFFSET 2"
        ).collect()]
        assert page2 == all_ids[2:4]

    def test_star(self, people):
        df = SqlEngine({"people": people}).sql(
            "SELECT * FROM people ORDER BY id LIMIT 1"
        )
        assert df.columns == ["id", "dept", "age", "pay", "name"]

    def test_semantic_errors(self, people):
        e = self.eng(people)
        with pytest.raises(SqlSyntaxError, match="GROUP BY"):
            e.sql("SELECT dept, age FROM people GROUP BY dept")
        with pytest.raises(SqlSyntaxError, match="HAVING"):
            e.sql("SELECT id FROM people HAVING count(*) > 1")
        with pytest.raises(SqlSyntaxError, match="unknown collection"):
            e.sql("SELECT a FROM nope")


class TestIndexCollection:
    def test_text_equality_is_full_text_match(self, idx):
        eng = SqlEngine({"docs": idx})
        got = {r.id for r in eng.sql(
            "SELECT id FROM docs WHERE text = 'spark'"
        ).collect()}
        native = {r["id"] for r in idx.query("text:spark").collect()}
        assert got == native == {"d1", "d2", "d4"}

    def test_multi_term_literal_is_a_phrase(self, idx):
        eng = SqlEngine({"docs": idx})
        got = {r.id for r in eng.sql(
            "SELECT id FROM docs WHERE text = 'hash table'"
        ).collect()}
        assert got == {"d3"}  # d4 has table but not the phrase

    def test_text_inequality_negates(self, idx):
        eng = SqlEngine({"docs": idx})
        got = {r.id for r in eng.sql(
            "SELECT id FROM docs WHERE text <> 'spark'"
        ).collect()}
        assert got == {"d3", "d5"}

    def test_like_is_wildcard_on_analyzed_field(self, idx):
        eng = SqlEngine({"docs": idx})
        got = {r.id for r in eng.sql(
            "SELECT id FROM docs WHERE text LIKE 'vect%'"
        ).collect()}
        assert got == {"d2", "d4"}

    def test_mixed_text_and_column_predicates(self, idx):
        eng = SqlEngine({"docs": idx})
        got = {r.id for r in eng.sql(
            "SELECT id FROM docs WHERE text = 'spark' AND dept = 'eng' "
            "AND n < 15"
        ).collect()}
        assert got == {"d1"}

    def test_aggregate_over_text_match(self, idx):
        eng = SqlEngine({"docs": idx})
        got = {(r.dept, r.cnt) for r in eng.sql(
            "SELECT dept, count(*) AS cnt FROM docs WHERE text = 'spark' "
            "GROUP BY dept ORDER BY cnt DESC, dept"
        ).collect()}
        assert got == {("eng", 2), ("ops", 1)}

    def test_star_hides_internal_columns(self, idx):
        df = SqlEngine({"docs": idx}).sql(
            "SELECT * FROM docs ORDER BY id LIMIT 1"
        )
        assert df.columns == ["id", "text", "dept", "n"]

    def test_bloom_pruning_engages_on_conjunctive_text(self, idx):
        # the pure-AND text predicate shape must route through the
        # Bloom-pruned scan — same result set either way (no false
        # negatives), but the pruning path is the 100 TB serving story
        eng = SqlEngine({"docs": idx})
        df = eng.sql("SELECT id FROM docs WHERE text = 'spark' AND n > 0")
        full = idx.df().count()
        assert df.count() == 3 and full == 5

    def test_or_over_text_still_correct(self, idx):
        eng = SqlEngine({"docs": idx})
        got = {r.id for r in eng.sql(
            "SELECT id FROM docs WHERE text = 'prose' OR text = 'hash'"
        ).collect()}
        assert got == {"d3", "d5"}


class TestCli:
    def test_sql_subcommand_over_parquet_and_artifact(
        self, spark, people, idx, tmp_path, capsys
    ):
        import json

        from solr_map_reduce_spark import cli

        p = str(tmp_path / "people.parquet")
        people.write.parquet(p)
        rc = cli.main([
            "sql", "--stmt",
            "SELECT dept, count(*) AS cnt FROM people "
            "WHERE dept IS NOT NULL GROUP BY dept ORDER BY cnt DESC, dept",
            "--collection", f"people={p}",
        ])
        assert rc == 0
        rows = [json.loads(l) for l in
                capsys.readouterr().out.strip().splitlines()]
        assert rows == [{"dept": "eng", "cnt": 3}, {"dept": "ops", "cnt": 2}]

        rc = cli.main([
            "sql", "--stmt",
            "SELECT id FROM docs WHERE text = 'spark' ORDER BY id",
            "--collection", f"docs={idx.path}",
        ])
        assert rc == 0
        ids = [json.loads(l)["id"] for l in
               capsys.readouterr().out.strip().splitlines()]
        assert ids == ["d1", "d2", "d4"]


class TestPlanShape:
    def test_order_limit_is_take_ordered(self, people):
        df = SqlEngine({"people": people}).sql(
            "SELECT id FROM people ORDER BY age DESC, id LIMIT 3"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan

    def test_group_by_is_partial_agg(self, people):
        df = SqlEngine({"people": people}).sql(
            "SELECT dept, count(*) AS c FROM people GROUP BY dept"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("HashAggregate") >= 2  # partial + final

    def test_column_filter_pushes_down(self, people, tmp_path):
        # through parquet the WHERE lands in PushedFilters
        p = str(tmp_path / "people.parquet")
        people.write.parquet(p)
        pq = people.sparkSession.read.parquet(p)
        df = SqlEngine({"people": pq}).sql(
            "SELECT id FROM people WHERE age > 30"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "age" in plan.split(
            "PushedFilters"
        )[1][:200]
