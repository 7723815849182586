"""SearchIndex: the C1-C7 query surface over a built artifact."""

import pyspark.sql.functions as F
import pytest

from solr_map_reduce_spark.index_reader import SearchIndex
from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
from solr_map_reduce_spark.schema import Field, IndexSchema

SCHEMA = IndexSchema(
    fields=(
        Field("id", "string", required=True),
        Field("text", "text_en"),
        Field("lang", "string"),
        Field("source", "string"),
        Field("n_chars", "long"),
    ),
    unique_key="id",
)


@pytest.fixture(scope="module")
def index(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sidx") / "docs")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "id", F.col("doc_id").cast("string")
    )
    IndexJob(
        IndexJobConfig(schema=SCHEMA, shards=4, micro_shards=16, dedup="none")
    ).build(docs, out)
    return SearchIndex.open(spark, out), docs


def test_count(index):
    idx, docs = index
    assert idx.count() == docs.count()


def test_point_lookup_prunes(index):
    idx, docs = index
    some = docs.orderBy("id").first()
    hit = idx.get(some["id"])
    rows = hit.collect()
    assert len(rows) == 1 and rows[0]["text"] == some["text"]
    plan = hit._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard" in plan  # pruned scan


def test_get_many(index):
    idx, docs = index
    keys = [r["id"] for r in docs.orderBy("id").limit(5).collect()]
    assert idx.get_many(keys).count() == 5


def test_search_filter_sort_page(index):
    idx, _ = index
    out = idx.search(
        filters={"lang": "en"},
        sort=[("n_chars", "desc")],
        limit=5,
        select=["id", "n_chars"],
    ).collect()
    assert len(out) <= 5
    lens = [r["n_chars"] for r in out]
    assert lens == sorted(lens, reverse=True)


def test_facet(index):
    idx, docs = index
    got = {r["lang"]: r["cnt"] for r in idx.facet("lang").collect()}
    want = {
        r["lang"]: r["cnt"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert got == want


def test_delete_where_rewrite(index, tmp_path):
    idx, docs = index
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    victim = langs[0]
    kept = idx.delete_where(F.col("lang") == victim, str(tmp_path / "after_delete"))
    assert kept.count() == idx.count() - docs.filter(F.col("lang") == victim).count()
    assert kept.df().filter(F.col("lang") == victim).count() == 0
    # layout preserved: same shard dirs, still openable
    assert sorted(kept.segment_counts()) == sorted(idx.segment_counts())


def test_routing_agrees_with_artifact(index):
    """C8: SearchIndex's computed shard matches where the writer put rows."""
    idx, _ = index
    sample = idx.df().select("id", "shard").limit(100).collect()
    for r in sample:
        assert idx._router.micro_shard_of(r["id"]) == r["shard"]
