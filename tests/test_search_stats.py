"""Stored BM25 statistics (search_stats.py): scores must be bit-identical
to the computed-stats path, the stored plan must skip the stats pass, and
mutations must invalidate or refresh."""

import pyspark.sql.functions as F
import pytest

from solr_map_reduce_spark.index_reader import SearchIndex
from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
from solr_map_reduce_spark.schema import Field, IndexSchema
from solr_map_reduce_spark.search_stats import (
    load_search_stats,
    term_dfs,
    write_search_stats,
)

SCHEMA = IndexSchema(
    fields=(
        Field("id", "string", required=True),
        Field("text", "text_general"),
    ),
    unique_key="id",
)


def _cfg(**kw):
    return IndexJobConfig(
        schema=SCHEMA, shards=4, dedup="none", routing="native",
        term_blooms=True, search_stats=True, **kw,
    )


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    rows = [
        (str(i), f"alpha beta common word{i % 7} " + ("target " * (i % 3)))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    path = str(tmp_path_factory.mktemp("statsidx") / "index")
    IndexJob(_cfg()).build(df, path)
    return path


def test_stats_sidecar_contents(spark, built):
    stats = load_search_stats(spark, built)
    assert stats["text"]["n_docs"] == 120
    assert stats["text"]["n_dl"] == 120
    assert stats["text"]["sum_dl"] > 0
    dfs = term_dfs(spark, built, "text", ["alpha", "target", "missingterm"])
    assert dfs["alpha"] == 120
    assert dfs["target"] == 80  # i % 3 != 0
    assert dfs["missingterm"] == 0


def test_bm25_scores_identical_stored_vs_computed(spark, built, tmp_path):
    import shutil

    idx = SearchIndex.open(spark, built)
    stored = idx.bm25(["target", "alpha"], k=10, exact_sum=True).collect()

    # same artifact without the sidecars -> computed path
    bare = str(tmp_path / "bare")
    shutil.copytree(built, bare)
    import os

    os.remove(os.path.join(bare, "_SEARCH_STATS.json"))
    shutil.rmtree(os.path.join(bare, "_vocab"))
    os.remove(os.path.join(bare, "_TERM_BLOOMS.json"))
    computed = SearchIndex.open(spark, bare).bm25(
        ["target", "alpha"], k=10, exact_sum=True
    ).collect()

    assert [(r["id"], r["score"]) for r in stored] == [
        (r["id"], r["score"]) for r in computed
    ]


def test_stored_plan_is_single_pass(spark, built):
    idx = SearchIndex.open(spark, built)
    plan = (
        idx.bm25(["target"], k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the computed path checkpoints the compact table; the stored path must
    # not (no scan of an RDD checkpoint, one FileScan of the artifact)
    assert "ExistingRDD" not in plan and "Scan ExistingRDD" not in plan
    assert plan.count("FileScan parquet") == 1
    assert "TakeOrderedAndProject" in plan


def test_merge_into_refreshes_stats(spark, built, tmp_path):
    import shutil

    path = str(tmp_path / "index")
    shutil.copytree(built, path)
    add = spark.createDataFrame(
        [("new-1", "alpha target target freshterm")], "id string, text string"
    )
    IndexJob(_cfg()).merge_into(add, path)
    stats = load_search_stats(spark, path)
    assert stats["text"]["n_docs"] == 121
    assert term_dfs(spark, path, "text", ["freshterm"])["freshterm"] == 1


def test_delete_where_delta_maintains_stats(spark, built, tmp_path):
    """r5: deletes delta-maintain the stats sidecar (previously they
    invalidated it) — stats stay equal to a full rebuild and BM25 keeps
    serving from stored structures."""
    import shutil

    path = str(tmp_path / "index")
    shutil.copytree(built, path)
    job = IndexJob(_cfg())
    n = job.delete_where(spark, path, F.col("id") == "5")
    assert n == 1
    delta_stats = load_search_stats(spark, path)
    assert delta_stats is not None and delta_stats["text"]["n_docs"] == 119
    delta_vocab = {
        r["term"]: r["df"]
        for r in spark.read.parquet(path + "/_vocab/text").collect()
    }
    rebuilt = write_search_stats(spark, path)
    full_vocab = {
        r["term"]: r["df"]
        for r in spark.read.parquet(path + "/_vocab/text").collect()
    }
    assert delta_stats == rebuilt
    assert delta_vocab == full_vocab
    idx = SearchIndex.open(spark, path)
    assert len(idx.bm25(["target"], k=5).collect()) == 5


def test_term_facet_from_vocab(spark, built):
    idx = SearchIndex.open(spark, built)
    top = idx.term_facet(top=3).collect()
    assert top[0]["df"] == 120  # alpha/beta/common all hit every doc
    assert {r["term"] for r in top} <= {"alpha", "beta", "common"}
    plan = idx.term_facet(top=3)._jdf.queryExecution().executedPlan().toString()
    assert "_vocab" in plan  # served from the dictionary, not the corpus


def test_term_facet_fallback_without_vocab(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "x y"), ("b", "x z")], "id string, text string"
    )
    path = str(tmp_path / "novocab")
    IndexJob(
        IndexJobConfig(schema=SCHEMA, shards=2, dedup="none", routing="native")
    ).build(df, path)
    top = {r["term"]: r["df"] for r in SearchIndex.open(spark, path).term_facet(top=10).collect()}
    assert top == {"x": 2, "y": 1, "z": 1}


def test_suggest_from_vocab(spark, built):
    idx = SearchIndex.open(spark, built)
    got = idx.suggest("al", top=5).collect()
    assert got and got[0]["term"] == "alpha" and got[0]["df"] == 120
    assert all(r["term"].startswith("al") for r in got)
    plan = idx.suggest("al", top=5)._jdf.queryExecution().executedPlan().toString()
    assert "_vocab" in plan and "StartsWith" in plan  # pushdown dictionary scan


def test_suggest_fallback_without_vocab(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "xray xylo"), ("b", "xray zed")], "id string, text string"
    )
    path = str(tmp_path / "novocab_sg")
    IndexJob(
        IndexJobConfig(schema=SCHEMA, shards=2, dedup="none", routing="native")
    ).build(df, path)
    got = {r["term"]: r["df"] for r in SearchIndex.open(spark, path).suggest("x").collect()}
    assert got == {"xray": 2, "xylo": 1}


def test_highlight_snippets(spark, built):
    idx = SearchIndex.open(spark, built)
    rows = idx.highlight(["target"], window=4).collect()
    assert rows  # 80 docs contain it
    for r in rows[:5]:
        assert "<em>target</em>" in r["snippet"]


def test_more_like_this(spark, built):
    idx = SearchIndex.open(spark, built)
    # doc "1": "alpha beta common word1 target" — similar docs share word1/target
    got = idx.more_like_this("1", k=5).collect()
    ids = [r["id"] for r in got]
    assert "1" not in ids and len(ids) == 5
    # word1 appears in docs i % 7 == 1 — the top hits should be from that set
    # or target-heavy docs; assert overlap with the word1 family
    word1_family = {str(i) for i in range(120) if i % 7 == 1}
    assert set(ids) & word1_family


def test_more_like_this_missing_key_raises(spark, built):
    idx = SearchIndex.open(spark, built)
    with pytest.raises(KeyError):
        idx.more_like_this("no-such-doc")


class TestIncrementalStatsDelta:
    """r5: merge_into delta-maintains the stats sidecar in O(touched) —
    proven equal to a full rebuild, and proven NOT to scan untouched
    shards (tamper test)."""

    def test_delta_equals_full_rebuild(self, spark, built, tmp_path):
        import shutil

        path = str(tmp_path / "index")
        shutil.copytree(built, path)
        add = spark.createDataFrame(
            [
                ("new-1", "alpha target target freshterm"),
                ("new-2", "beta common freshterm othernew"),
                ("7", "alpha replaced entirely"),  # same key (dedup=none: appends)
            ],
            "id string, text string",
        )
        IndexJob(_cfg()).merge_into(add, path)
        delta_stats = load_search_stats(spark, path)
        delta_vocab = {
            r["term"]: r["df"]
            for r in spark.read.parquet(path + "/_vocab/text").collect()
        }
        # ground truth: full rebuild over the merged artifact
        rebuilt = write_search_stats(spark, path)
        full_vocab = {
            r["term"]: r["df"]
            for r in spark.read.parquet(path + "/_vocab/text").collect()
        }
        assert delta_stats == rebuilt
        assert delta_vocab == full_vocab
        assert delta_stats["text"]["n_docs"] == 123  # 120 + 3 (dedup=none)

    def test_merge_never_scans_untouched_shards(self, spark, built, tmp_path):
        """Tamper test: every parquet file in the shards the batch does NOT
        route to is replaced by a VALID zero-row file (same schema — valid
        so Spark's footer sampling for schema inference stays
        deterministic).  If ANY part of merge_into (union, stats delta,
        bloom/key-range refresh) scanned an untouched shard it would see
        zero docs there and the resulting statistics would diverge from
        the pre-tamper expectation below."""
        import os
        import shutil

        import pyarrow.parquet as pq

        path = str(tmp_path / "index")
        shutil.copytree(built, path)
        job = IndexJob(_cfg())
        add = spark.createDataFrame(
            [("tamper-new", "alpha target freshterm")], "id string, text string"
        )
        routed = job.route(add).select("shard").distinct().collect()
        touched = {int(r["shard"]) for r in routed}
        assert len(touched) == 1
        untouched = [
            d for d in os.listdir(path)
            if d.startswith("shard=") and int(d.split("=")[1]) not in touched
        ]
        assert untouched  # the fixture has 4 shards
        emptied = 0
        for d in untouched:
            for f in os.listdir(os.path.join(path, d)):
                if f.endswith(".parquet"):
                    full = os.path.join(path, d, f)
                    table = pq.read_table(full)
                    pq.write_table(table.slice(0, 0), full)  # valid, 0 rows
                    emptied += 1
        assert emptied
        before = load_search_stats(spark, path)
        IndexJob(_cfg()).merge_into(add, path)  # must not read tampered files
        after = load_search_stats(spark, path)
        # stats reflect the PRE-tamper corpus + the 1-doc batch: any scan of
        # the emptied untouched shards would have subtracted their docs
        assert after["text"]["n_docs"] == before["text"]["n_docs"] + 1
        assert term_dfs(spark, path, "text", ["freshterm"])["freshterm"] == 1

    def test_delta_handles_term_disappearing(self, spark, tmp_path):
        """A term whose every occurrence is replaced drops out of the
        dictionary (df reaches 0) — the full-outer delta must remove it,
        not leave df=0 rows behind."""
        df = spark.createDataFrame(
            [("a", "unique singleton"), ("b", "other words")],
            "id string, text string",
        )
        path = str(tmp_path / "vanish")
        job = IndexJob(
            IndexJobConfig(
                schema=SCHEMA, shards=1, dedup="retain_most_recent",
                routing="native", term_blooms=True, search_stats=True,
            )
        )
        job.build(df, path)
        assert term_dfs(spark, path, "text", ["singleton"])["singleton"] == 1
        job.merge_into(
            spark.createDataFrame([("a", "replaced now")], "id string, text string"),
            path,
        )
        vocab = {
            r["term"]: r["df"]
            for r in spark.read.parquet(path + "/_vocab/text").collect()
        }
        assert "singleton" not in vocab
        assert vocab == {
            "other": 1, "words": 1, "replaced": 1, "now": 1,
        }
        stats = load_search_stats(spark, path)
        assert stats["text"] == {"n_docs": 2, "sum_dl": 4, "n_dl": 2}

    def test_bm25_scores_after_delta_match_computed(self, spark, built, tmp_path):
        """Serving equality end to end: after an incremental merge, stored-
        stats BM25 must equal the computed-stats path on the same corpus."""
        import os
        import shutil

        path = str(tmp_path / "index")
        shutil.copytree(built, path)
        add = spark.createDataFrame(
            [("new-1", "alpha target target freshterm")], "id string, text string"
        )
        IndexJob(_cfg()).merge_into(add, path)
        stored = SearchIndex.open(spark, path).bm25(
            ["target", "alpha"], k=10, exact_sum=True
        ).collect()
        bare = str(tmp_path / "bare")
        shutil.copytree(path, bare)
        os.remove(os.path.join(bare, "_SEARCH_STATS.json"))
        shutil.rmtree(os.path.join(bare, "_vocab"))
        os.remove(os.path.join(bare, "_TERM_BLOOMS.json"))
        computed = SearchIndex.open(spark, bare).bm25(
            ["target", "alpha"], k=10, exact_sum=True
        ).collect()
        assert [(r["id"], r["score"]) for r in stored] == [
            (r["id"], r["score"]) for r in computed
        ]


def test_compact_preserves_stats_sidecar(spark, built, tmp_path):
    """Compaction rewrites files but not content: the stats sidecar (and
    its _vocab/ dictionary) must survive and keep serving."""
    import shutil

    from solr_map_reduce_spark.indexing import compact

    path = str(tmp_path / "index")
    shutil.copytree(built, path)
    before = load_search_stats(spark, path)
    compact(spark, path, max_segments=1)
    after = load_search_stats(spark, path)
    assert after == before
    idx = SearchIndex.open(spark, path)
    plan = idx.bm25(["target"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "_vocab" not in plan  # dfs come from the dictionary lookup, plan
    assert plan.count("FileScan parquet") == 1  # still the stored-stats shape
    assert len(idx.bm25(["target"], k=5).collect()) == 5


def test_reader_delete_where_carries_serving_structures(spark, built, tmp_path):
    """SearchIndex.delete_where writes a NEW artifact: the source's term
    blooms (still a correct superset under deletion) and BM25 stats must
    follow it — previously the result silently lost stored-stats serving."""
    import os

    idx = SearchIndex.open(spark, built)
    out = str(tmp_path / "deleted")
    res = idx.delete_where(F.col("id") == "5", out)
    assert os.path.exists(os.path.join(out, "_TERM_BLOOMS.json"))
    stats = load_search_stats(spark, out)
    assert stats is not None and stats["text"]["n_docs"] == 119
    rebuilt = write_search_stats(spark, out)
    assert stats == rebuilt
    plan = res.bm25(["target"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1  # stored-stats single-pass shape
