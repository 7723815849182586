"""SearchIndex.json_facet — the Solr JSON Facet API subset, rendered
relationally (one row per innermost bucket)."""

import pytest

from solr_map_reduce_spark.index_reader import SearchIndex
from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
from solr_map_reduce_spark.schema import Field, IndexSchema


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    schema = IndexSchema(
        fields=(Field("id", "string", required=True),
                Field("text", "text_general"),
                Field("grp", "string"),
                Field("src", "string"),
                Field("n", "long")),
        unique_key="id",
    )
    rows = [
        ("1", "spark rows", "a", "web", 10),
        ("2", "spark cols", "a", "web", 20),
        ("3", "spark sql", "a", "pdf", 30),
        ("4", "other", "b", "web", 40),
        ("5", "other", "b", "pdf", 50),
        ("6", "misc", "c", "web", 60),
    ]
    df = spark.createDataFrame(
        rows, "id string, text string, grp string, src string, n long"
    )
    out = str(tmp_path_factory.mktemp("jf") / "idx")
    IndexJob(IndexJobConfig(schema=schema, shards=1, dedup="none")).build(df, out)
    return SearchIndex.open(spark, out)


class TestJsonFacet:
    def test_terms_with_stats_and_query_subfacet(self, idx):
        rows = idx.json_facet({
            "type": "terms", "field": "grp", "limit": 2,
            "facet": {
                "max_n": "max(n)",
                "uniq_src": "unique(src)",
                "sparky": {"type": "query", "q": "spark"},
            },
        }).collect()
        got = {r["grp"]: (r["count"], r["max_n"], r["uniq_src"], r["sparky"])
               for r in rows}
        # count desc, grp asc tiebreak: a(3), b(2) — c truncated
        assert got == {"a": (3, 30, 2, 3), "b": (2, 50, 2, 0)}

    def test_index_sort_and_mincount(self, idx):
        rows = idx.json_facet({
            "type": "terms", "field": "grp", "sort": "index asc",
            "mincount": 2,
        }).collect()
        assert [r["grp"] for r in rows] == ["a", "b"]  # c: count 1 < 2

    def test_sort_by_stat_subfacet(self, idx):
        rows = idx.json_facet({
            "type": "terms", "field": "grp", "sort": "max_n desc",
            "facet": {"max_n": "max(n)"},
        }).collect()
        assert [r["grp"] for r in rows] == ["c", "b", "a"]

    def test_nested_terms_flattens_with_parent_stats(self, idx):
        rows = idx.json_facet({
            "type": "terms", "field": "grp", "limit": 1,
            "facet": {
                "max_n": "max(n)",
                "by_src": {"type": "terms", "field": "src", "limit": 1},
            },
        }).collect()
        # top grp: a (count 3, max 30); its top src by count: web (2)
        assert len(rows) == 1
        r = rows[0]
        assert (r["grp"], r["count"], r["max_n"]) == ("a", 3, 30)
        assert (r["src"], r["by_src_count"]) == ("web", 2)

    def test_q_scopes_the_domain(self, idx):
        rows = idx.json_facet(
            {"type": "terms", "field": "grp"}, q="spark"
        ).collect()
        assert {r["grp"]: r["count"] for r in rows} == {"a": 3}

    def test_errors_are_loud(self, idx):
        with pytest.raises(ValueError, match="type=terms"):
            idx.json_facet({"type": "range", "field": "n"})
        with pytest.raises(ValueError, match="needs field"):
            idx.json_facet({"type": "terms"})
        with pytest.raises(ValueError, match="sum\\|avg"):
            idx.json_facet({"type": "terms", "field": "grp",
                            "facet": {"x": "median(n)"}})
        with pytest.raises(ValueError, match="one nested terms"):
            idx.json_facet({
                "type": "terms", "field": "grp",
                "facet": {
                    "a": {"type": "terms", "field": "src"},
                    "b": {"type": "terms", "field": "src"},
                },
            })
        with pytest.raises(ValueError, match="one nesting level"):
            idx.json_facet({
                "type": "terms", "field": "grp",
                "facet": {"a": {"type": "terms", "field": "src",
                                "facet": {"b": {"type": "terms",
                                                "field": "id"}}}},
            })
        with pytest.raises(ValueError, match="unknown key"):
            idx.json_facet({"type": "terms", "field": "grp",
                            "sort": "nope desc"})
