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

    def test_percentile_stddev_sumsq_countvals(self, idx):
        rows = idx.json_facet({
            "type": "terms", "field": "grp", "sort": "index asc",
            "facet": {
                "p50": "percentile(n, 50)",
                "sd": "stddev(n)",
                "ss": "sumsq(n)",
                "nv": "countvals(n)",
            },
        }).collect()
        a = next(r for r in rows if r["grp"] == "a")
        assert a["p50"] == pytest.approx(20.0)  # 10,20,30 interpolated
        assert a["sd"] == pytest.approx(10.0)   # sample stddev
        assert a["ss"] == 100 + 400 + 900
        assert a["nv"] == 3

    def test_offset_pages_buckets(self, idx):
        rows = idx.json_facet({
            "type": "terms", "field": "grp", "sort": "index asc",
            "offset": 1, "limit": 1,
        }).collect()
        assert [r["grp"] for r in rows] == ["b"]

    def test_prefix_restricts_buckets(self, idx):
        rows = idx.json_facet({
            "type": "terms", "field": "src", "prefix": "w",
        }).collect()
        assert [r["src"] for r in rows] == ["web"]

    def test_num_and_all_buckets_columns(self, idx):
        rows = idx.json_facet({
            "type": "terms", "field": "grp", "limit": 1,
            "numBuckets": True, "allBuckets": True,
        }).collect()
        assert len(rows) == 1  # limit truncates rows, not the metadata
        r = rows[0]
        assert (r["grp"], r["count"]) == ("a", 3)
        assert r["numBuckets"] == 3       # a, b, c survive mincount
        assert r["allBuckets_count"] == 6  # all docs across all buckets

    def test_domain_filter_restricts_scan(self, idx):
        rows = idx.json_facet({
            "type": "terms", "field": "grp",
            "domain": {"filter": "src:web"},
        }).collect()
        assert {r["grp"]: r["count"] for r in rows} == {
            "a": 2, "b": 1, "c": 1
        }

    def test_range_facet_with_stats(self, idx):
        rows = idx.json_facet({
            "type": "range", "field": "n", "start": 0, "end": 80,
            "gap": 20,
            "facet": {
                "avg_n": "avg(n)",
                "webs": {"type": "query", "q": "src:web"},
            },
        }).collect()
        assert [r["bucket_start"] for r in rows] == [0.0, 20.0, 40.0, 60.0]
        # Solr range buckets are [lower, upper): 10 | 20,30 | 40,50 | 60
        assert [r["count"] for r in rows] == [1, 2, 2, 1]
        assert rows[0]["avg_n"] == pytest.approx(10.0)
        assert rows[1]["avg_n"] == pytest.approx(25.0)
        # web docs: n=10,20,40,60 -> buckets 0,1,2,3
        assert [r["webs"] for r in rows] == [1, 1, 1, 1]

    def test_range_facet_empty_bucket_zero_filled(self, idx):
        rows = idx.json_facet({
            "type": "range", "field": "n", "start": 0, "end": 200,
            "gap": 100,
            "facet": {"avg_n": "avg(n)"},
        }).collect()
        assert [r["count"] for r in rows] == [6, 0]
        assert rows[1]["avg_n"] is None  # empty bucket: stats NULL

    def test_range_facet_mincount_drops_empties(self, idx):
        rows = idx.json_facet({
            "type": "range", "field": "n", "start": 0, "end": 200,
            "gap": 100, "mincount": 1,
        }).collect()
        assert [r["bucket_start"] for r in rows] == [0.0]

    def test_errors_are_loud(self, idx):
        with pytest.raises(ValueError, match="needs start"):
            idx.json_facet({"type": "range", "field": "n"})
        with pytest.raises(ValueError, match="one nesting level"):
            idx.json_facet({
                "type": "range", "field": "n", "start": 0, "end": 10,
                "gap": 5,
                "facet": {"x": {"type": "terms", "field": "grp",
                                "facet": {"y": {"type": "terms",
                                                "field": "src"}}}},
            })
        with pytest.raises(ValueError, match="domain supports"):
            idx.json_facet({"type": "terms", "field": "grp",
                            "domain": {"query": "x"}})
        with pytest.raises(ValueError, match="not with a nested"):
            idx.json_facet({
                "type": "terms", "field": "grp", "numBuckets": True,
                "facet": {"by": {"type": "terms", "field": "src"}},
            })
        with pytest.raises(ValueError, match="p must be in 0..100"):
            idx.json_facet({"type": "terms", "field": "grp",
                            "facet": {"x": "percentile(n, 200)"}})
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


@pytest.fixture(scope="module")
def idx_nulls(spark, tmp_path_factory):
    schema = IndexSchema(
        fields=(Field("id", "string", required=True),
                Field("grp", "string"),
                Field("n", "long")),
        unique_key="id",
    )
    rows = [("1", "a", 10), ("2", "a", 20), ("3", "b", 30),
            ("4", None, 40), ("5", None, None)]
    df = spark.createDataFrame(rows, "id string, grp string, n long")
    out = str(tmp_path_factory.mktemp("jfn") / "idx")
    IndexJob(IndexJobConfig(schema=schema, shards=1, dedup="none")).build(df, out)
    return SearchIndex.open(spark, out)


class TestJsonFacetMissing:
    def test_missing_bucket_appended_last_with_stats(self, idx_nulls):
        rows = idx_nulls.json_facet({
            "type": "terms", "field": "grp", "missing": True,
            "facet": {"mx": "max(n)", "nv": "countvals(n)"},
        }).collect()
        # value buckets in sort order, then ONE null-bucket row
        assert [r["grp"] for r in rows] == ["a", "b", None]
        m = rows[-1]
        assert (m["count"], m["mx"], m["nv"]) == (2, 40, 1)

    def test_null_key_never_a_value_bucket(self, idx_nulls):
        rows = idx_nulls.json_facet({
            "type": "terms", "field": "grp",
        }).collect()
        assert [r["grp"] for r in rows] == ["a", "b"]

    def test_missing_with_metadata_columns(self, idx_nulls):
        rows = idx_nulls.json_facet({
            "type": "terms", "field": "grp", "missing": True,
            "numBuckets": True, "allBuckets": True,
        }).collect()
        assert rows[0]["numBuckets"] == 2
        assert rows[0]["allBuckets_count"] == 3  # null-keyed docs excluded
        assert rows[-1]["grp"] is None
        assert rows[-1]["numBuckets"] is None

    def test_missing_agg_counts_nulls_per_bucket(self, idx_nulls):
        rows = idx_nulls.json_facet({
            "type": "terms", "field": "grp", "missing": True,
            "facet": {"n_null": "missing(n)"},
        }).collect()
        got = {r["grp"]: r["n_null"] for r in rows}
        assert got == {"a": 0, "b": 0, None: 1}


class TestJsonFacetMultiselect:
    def test_exclude_tags_widens_own_facet(self, idx):
        # the user selected src=web (tagged by its filter key); faceting
        # src with that tag excluded still shows every src option — the
        # other filters (grp=a) keep applying
        rows = idx.json_facet(
            {"type": "terms", "field": "src", "sort": "index asc",
             "domain": {"excludeTags": "src"}},
            filters={"src": "web", "grp": "a"},
        ).collect()
        # grp a docs: web(1,2), pdf(3)
        assert {(r["src"], r["count"]) for r in rows} == {
            ("pdf", 1), ("web", 2)}

    def test_filters_apply_without_exclude(self, idx):
        rows = idx.json_facet(
            {"type": "terms", "field": "src", "sort": "index asc"},
            filters={"src": "web"},
        ).collect()
        assert [(r["src"], r["count"]) for r in rows] == [("web", 4)]

    def test_filter_value_lists_are_in_predicates(self, idx):
        rows = idx.json_facet(
            {"type": "terms", "field": "grp", "sort": "index asc"},
            filters={"grp": ["a", "c"]},
        ).collect()
        assert [(r["grp"], r["count"]) for r in rows] == [("a", 3), ("c", 1)]

    def test_exclude_unknown_key_raises(self, idx):
        with pytest.raises(ValueError, match="unknown filter keys"):
            idx.json_facet(
                {"type": "terms", "field": "src",
                 "domain": {"excludeTags": ["typo"]}},
                filters={"src": "web"},
            )

    def test_hll_estimates_distinct(self, idx):
        # HLL++ is exact at tiny cardinality; the point here is the
        # grammar + column wiring (unique() remains the exact stat)
        rows = idx.json_facet({
            "type": "terms", "field": "grp", "sort": "index asc",
            "facet": {"h": "hll(src)", "u": "unique(src)"},
        }).collect()
        assert all(r["h"] == r["u"] for r in rows)


class TestJsonFacetQueryType:
    def test_query_facet_one_row(self, idx):
        rows = idx.json_facet({
            "type": "query", "q": "src:web",
            "facet": {"mx": "max(n)", "pdfish": {"type": "query",
                                                 "q": "grp:a"}},
        }).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["count"], r["mx"], r["pdfish"]) == (4, 60, 2)

    def test_query_facet_with_nested_terms(self, idx):
        rows = idx.json_facet({
            "type": "query", "q": "src:web",
            "facet": {
                "mx": "max(n)",
                "by_grp": {"type": "terms", "field": "grp",
                           "sort": "index asc", "limit": 10},
            },
        }).collect()
        # parent stats repeated on every child bucket row
        assert [(r["grp"], r["by_grp_count"], r["count"], r["mx"])
                for r in rows] == [("a", 2, 4, 60), ("b", 1, 4, 60),
                                   ("c", 1, 4, 60)]

    def test_query_facet_needs_q(self, idx):
        with pytest.raises(ValueError, match="query spec needs q="):
            idx.json_facet({"type": "query"})


class TestRelatedness:
    def test_skg_score_hand_computed(self, idx):
        import math

        rows = idx.json_facet({
            "type": "terms", "field": "grp", "sort": "index asc",
            "facet": {"r": {"type": "relatedness", "fore": "src:web"}},
        }).collect()
        got = {r["grp"]: r["r"] for r in rows}

        def skg(fg, fgsz, bg, bgsz):
            fgp, bgp = fg / fgsz, bg / bgsz
            z = (fgp - bgp) / math.sqrt(bgp * (1 - bgp) / fgsz)
            return z / (1 + abs(z))

        # domain 6 docs, 4 web; a: fg 2/bg 3, b: fg 1/bg 2, c: fg 1/bg 1
        assert got["a"] == pytest.approx(skg(2, 4, 3, 6))
        assert got["b"] == pytest.approx(skg(1, 4, 2, 6))
        assert got["c"] == pytest.approx(skg(1, 4, 1, 6))
        assert got["c"] > got["a"] > got["b"]  # web over-represented in c

    def test_sortable_by_relatedness(self, idx):
        rows = idx.json_facet({
            "type": "terms", "field": "grp", "sort": "r desc",
            "facet": {"r": {"type": "relatedness", "fore": "src:web"}},
        }).collect()
        assert [r["grp"] for r in rows] == ["c", "a", "b"]

    def test_degenerate_background_scores_zero(self, idx):
        # back matches everything AND fore==back per bucket -> bg_prob
        # of 1 has no variance; guarded to 0, never NaN/inf
        rows = idx.json_facet({
            "type": "terms", "field": "grp",
            "facet": {"r": {"type": "relatedness", "fore": "src:web",
                            "back": "src:nope"}},
        }).collect()
        assert all(r["r"] == 0.0 for r in rows)

    def test_query_facet_relatedness(self, idx):
        import math

        rows = idx.json_facet({
            "type": "query", "q": "grp:a",
            "facet": {"r": {"type": "relatedness", "fore": "src:web"}},
        }).collect()
        assert len(rows) == 1
        fgp, bgp = 2 / 4, 3 / 6
        assert rows[0]["r"] == pytest.approx(0.0)  # z = 0 exactly

    def test_errors(self, idx):
        with pytest.raises(ValueError, match="needs fore="):
            idx.json_facet({
                "type": "terms", "field": "grp",
                "facet": {"r": {"type": "relatedness"}},
            })
        with pytest.raises(ValueError, match="top terms/query level"):
            idx.json_facet({
                "type": "terms", "field": "grp",
                "facet": {"by": {"type": "terms", "field": "src",
                                 "facet": {"r": {"type": "relatedness",
                                                 "fore": "src:web"}}}},
            })
        with pytest.raises(ValueError, match="top terms/query level"):
            idx.json_facet({
                "type": "range", "field": "n", "start": 0, "end": 10,
                "gap": 5,
                "facet": {"r": {"type": "relatedness", "fore": "src:web"}},
            })


class TestRangeNestedTerms:
    def test_terms_inside_range_buckets(self, idx):
        rows = idx.json_facet({
            "type": "range", "field": "n", "start": 0, "end": 80,
            "gap": 40,
            "facet": {
                "mx": "max(n)",
                "by_src": {"type": "terms", "field": "src",
                           "sort": "index asc", "limit": 10},
            },
        }).collect()
        # [0,40): 10,20,30 -> web 2, pdf 1; [40,80): 40,50,60 -> web 2, pdf 1
        got = [(r["bucket_start"], r["src"], r["by_src_count"], r["count"],
                r["mx"]) for r in rows]
        assert got == [
            (0.0, "pdf", 1, 3, 30), (0.0, "web", 2, 3, 30),
            (40.0, "pdf", 1, 3, 60), (40.0, "web", 2, 3, 60),
        ]

    def test_nested_limit_truncates_per_bucket(self, idx):
        rows = idx.json_facet({
            "type": "range", "field": "n", "start": 0, "end": 80,
            "gap": 40,
            "facet": {"by_src": {"type": "terms", "field": "src",
                                 "limit": 1}},
        }).collect()
        # count desc, src asc tiebreak: web wins in both buckets
        assert [(r["bucket_start"], r["src"]) for r in rows] == [
            (0.0, "web"), (40.0, "web")]

    def test_empty_buckets_absent_with_nested(self, idx):
        rows = idx.json_facet({
            "type": "range", "field": "n", "start": 0, "end": 200,
            "gap": 100,
            "facet": {"by_src": {"type": "terms", "field": "src"}},
        }).collect()
        # bucket [100,200) is empty -> no child rows to render
        assert {r["bucket_start"] for r in rows} == {0.0}


@pytest.fixture(scope="module")
def idx_mv(spark, tmp_path_factory):
    schema = IndexSchema(
        fields=(Field("id", "string", required=True),
                Field("text", "text_general"),
                Field("tags", "string", multi_valued=True),
                Field("n", "long")),
        unique_key="id",
    )
    rows = [
        ("1", "alpha", ["red", "blue"], 10),
        ("2", "beta", ["red", "red"], 20),   # dup value: doc counts ONCE
        ("3", "gamma", ["blue"], 30),
        ("4", "delta", [], 40),              # no values -> missing only
        ("5", "omega", None, 50),
    ]
    df = spark.createDataFrame(
        rows, "id string, text string, tags array<string>, n long"
    )
    out = str(tmp_path_factory.mktemp("jfmv") / "idx")
    IndexJob(IndexJobConfig(schema=schema, shards=1, dedup="none")).build(
        df, out)
    return SearchIndex.open(spark, out)


class TestMultivaluedFacet:
    def test_terms_facet_counts_per_value(self, idx_mv):
        rows = idx_mv.json_facet({
            "type": "terms", "field": "tags", "sort": "index asc",
        }).collect()
        # red: docs 1,2 (dup in 2 counts once); blue: docs 1,3
        assert [(r["tags"], r["count"]) for r in rows] == [
            ("blue", 2), ("red", 2)]

    def test_missing_bucket_is_docs_without_values(self, idx_mv):
        rows = idx_mv.json_facet({
            "type": "terms", "field": "tags", "missing": True,
            "sort": "index asc",
        }).collect()
        # docs 4 (empty array) and 5 (null) have no values
        assert rows[-1]["tags"] is None and rows[-1]["count"] == 2

    def test_stats_aggregate_per_bucket_docs(self, idx_mv):
        rows = idx_mv.json_facet({
            "type": "terms", "field": "tags", "sort": "index asc",
            "facet": {"mx": "max(n)"},
        }).collect()
        got = {r["tags"]: r["mx"] for r in rows}
        assert got == {"blue": 30, "red": 20}

    def test_plain_facet_method_explodes_too(self, idx_mv):
        rows = idx_mv.facet("tags", sort="index").collect()
        assert [(r["tags"], r["cnt"]) for r in rows] == [
            ("blue", 2), ("red", 2)]

    def test_relatedness_sizes_count_docs_not_values(self, idx_mv):
        import math

        rows = idx_mv.json_facet({
            "type": "terms", "field": "tags", "sort": "index asc",
            "facet": {"r": {"type": "relatedness", "fore": "n:[20 TO *]"}},
        }).collect()
        got = {r["tags"]: r["r"] for r in rows}

        def skg(fg, fgsz, bg, bgsz):
            fgp, bgp = fg / fgsz, bg / bgsz
            if bg == 0 or bg == bgsz:
                return 0.0
            z = (fgp - bgp) / math.sqrt(bgp * (1 - bgp) / fgsz)
            return z / (1 + abs(z))

        # DOC domain: 5 docs, fore (n>=20): docs 2,3,4,5 -> fgsz 4, bgsz 5
        # blue bucket: docs 1,3 -> fg 1, bg 2; red: docs 1,2 -> fg 1, bg 2
        assert got["blue"] == pytest.approx(skg(1, 4, 2, 5))
        assert got["red"] == pytest.approx(skg(1, 4, 2, 5))


class TestMultivaluedAllBuckets:
    def test_all_buckets_is_doc_union_not_value_sum(self, idx_mv):
        rows = idx_mv.json_facet({
            "type": "terms", "field": "tags", "sort": "index asc",
            "allBuckets": True,
        }).collect()
        # 3 docs have >=1 tag (1,2,3); bucket counts sum to 4 values —
        # allBuckets must report the DOC union (Solr's docset), not 4
        assert all(r["allBuckets_count"] == 3 for r in rows)


class TestRangesListForm:
    def test_arbitrary_overlapping_ranges(self, idx):
        rows = idx.json_facet({
            "type": "range", "field": "n",
            "ranges": [
                {"from": 0, "to": 30},                  # [0,30): 10,20
                {"range": "[20,50]"},                   # 20,30,40,50
                {"from": 45, "inclusive_from": False},  # (45,*]: 50,60
            ],
            "facet": {"avg_n": "avg(n)",
                      "webs": {"type": "query", "q": "src:web"}},
        }).collect()
        got = [(r["range"], r["count"], r["avg_n"], r["webs"])
               for r in rows]
        assert got == [
            ("[0,30)", 2, 15.0, 2),    # 10(web), 20(web)
            ("[20,50]", 4, 35.0, 2),   # webs: 20, 40
            ("(45,*)", 2, 55.0, 1),    # 50 is pdf, 60 is web
        ]

    def test_range_labels_and_bounds(self, idx):
        rows = idx.json_facet({
            "type": "range", "field": "n",
            "ranges": [{"from": 10, "to": 10, "inclusive_to": True}],
        }).collect()
        assert [(r["range"], r["count"]) for r in rows] == [("[10,10]", 1)]

    def test_empty_range_reports_zero(self, idx):
        rows = idx.json_facet(
            {"type": "range", "field": "n",
             "ranges": [{"from": 1000, "to": 2000}],
             "facet": {"mx": "max(n)"}},
            q="spark",
        ).collect()
        assert rows[0]["count"] == 0 and rows[0]["mx"] is None

    def test_single_pass_plan(self, idx):
        df = idx.json_facet({
            "type": "range", "field": "n",
            "ranges": [{"from": 0, "to": 30}, {"range": "[20,50]"},
                       {"from": 45}],
            "facet": {"s": "sum(n)"},
        })
        plan = df._jdf.queryExecution().executedPlan().toString()
        # one aggregate over one scan, however many ranges
        assert plan.count("Scan parquet") == 1

    def test_errors(self, idx):
        with pytest.raises(ValueError, match="mutually exclusive"):
            idx.json_facet({"type": "range", "field": "n", "start": 0,
                            "end": 1, "gap": 1, "ranges": [{"from": 0}]})
        with pytest.raises(ValueError, match="non-empty list"):
            idx.json_facet({"type": "range", "field": "n", "ranges": []})
        with pytest.raises(ValueError, match="interval syntax"):
            idx.json_facet({"type": "range", "field": "n",
                            "ranges": [{"range": "0 to 5"}]})
        with pytest.raises(ValueError, match="stat/query subfacets only"):
            idx.json_facet({
                "type": "range", "field": "n",
                "ranges": [{"from": 0}],
                "facet": {"x": {"type": "terms", "field": "grp"}},
            })


class TestRangesDateBounds:
    def test_date_math_bounds(self, spark, tmp_path_factory):
        from datetime import datetime

        from solr_map_reduce_spark.functions.datemath import fixed_now

        schema = IndexSchema(
            fields=(Field("id", "string", required=True),
                    Field("ts", "tdate")),
            unique_key="id",
        )
        rows = [("1", datetime(2024, 1, 18)), ("2", datetime(2024, 1, 19)),
                ("3", datetime(2024, 1, 20)), ("4", datetime(2024, 1, 5))]
        df = spark.createDataFrame(rows, "id string, ts timestamp")
        out = str(tmp_path_factory.mktemp("jfd") / "idx")
        IndexJob(IndexJobConfig(schema=schema, shards=1,
                                dedup="none")).build(df, out)
        idx = SearchIndex.open(spark, out)
        with fixed_now(datetime(2024, 1, 20, 12)):
            got = idx.json_facet({
                "type": "range", "field": "ts",
                "ranges": [{"from": "NOW-7DAYS/DAY", "to": "NOW/DAY"},
                           {"from": "2024-01-01T00:00:00Z",
                            "to": "NOW-10DAYS"}],
            }).collect()
        # [Jan 13, Jan 20): docs 1,2; [Jan 1, Jan 10 12:00): doc 4
        assert [(r["range"], r["count"]) for r in got] == [
            ("[NOW-7DAYS/DAY,NOW/DAY)", 2),
            ("[2024-01-01T00:00:00Z,NOW-10DAYS)", 1),
        ]


class TestAliasJsonFacet:
    def test_alias_facets_the_member_union(self, spark, tmp_path):
        from solr_map_reduce_spark.index_reader import MultiIndex

        schema = IndexSchema(
            fields=(Field("id", "string", required=True),
                    Field("text", "text_general"),
                    Field("grp", "string"),
                    Field("n", "long")),
            unique_key="id",
        )
        slices = [
            [("a1", "spark x", "g1", 10), ("a2", "other", "g2", 20)],
            [("b1", "spark y", "g1", 30), ("b2", "spark z", "g3", 40)],
        ]
        paths = []
        for i, rows in enumerate(slices):
            df = spark.createDataFrame(
                rows, "id string, text string, grp string, n long")
            out = str(tmp_path / f"jm{i}")
            IndexJob(IndexJobConfig(schema=schema, shards=1,
                                    dedup="none")).build(df, out)
            paths.append(out)
        alias = MultiIndex.open(spark, paths)
        rows = alias.json_facet(
            {"type": "terms", "field": "grp", "sort": "index asc",
             "facet": {"mx": "max(n)"}},
            q="spark",
        ).collect()
        # spark docs: a1(g1,10), b1(g1,30), b2(g3,40) — g1 spans members
        assert [(r["grp"], r["count"], r["mx"]) for r in rows] == [
            ("g1", 2, 30), ("g3", 1, 40)]
