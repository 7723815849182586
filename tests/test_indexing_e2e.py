"""End-to-end index build on the sf0.001 documents table — the Milestone-1
slice (SURVEY §7): ingest → key → sanitize → route → dedup → sorted sharded
write → read back → C1/C2/C7 checks."""

import pyspark.sql.functions as F
import pytest

from solr_map_reduce_spark.indexing import (
    IndexJob,
    IndexJobConfig,
    compact,
    read_index,
    segment_counts,
)
from solr_map_reduce_spark.operators.routing import ShardRouter
from solr_map_reduce_spark.schema import Field, IndexSchema

DOC_SCHEMA = IndexSchema(
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
def built(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("index") / "docs_index")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "id", F.col("doc_id").cast("string")
    )
    job = IndexJob(
        IndexJobConfig(schema=DOC_SCHEMA, shards=4, micro_shards=16, dedup="retain_most_recent",
                       order_field="n_chars", tiebreak=("id",))
    )
    manifest = job.build(docs, out)
    return out, manifest, docs


def test_artifact_layout(built):
    out, manifest, _ = built
    counts = segment_counts(out)
    assert sorted(counts) == [f"shard={i}" for i in range(4)]
    assert manifest["shards"] == 4


def test_count_matches_input(spark, built):
    out, _, docs = built
    # doc_id is unique in the fixture → dedup keeps everything (C1)
    assert read_index(spark, out).count() == docs.count()


def test_point_lookup_prunes_to_one_shard(spark, built):
    out, _, docs = built
    some_id = docs.select("id").orderBy("id").first()["id"]
    router = ShardRouter(shards=4, num_partitions=16)
    expected_shard = router.micro_shard_of(some_id) // 4
    idx = read_index(spark, out)
    hit = idx.filter(F.col("id") == some_id)
    rows = hit.collect()
    assert len(rows) == 1
    assert rows[0]["shard"] == expected_shard
    # partition pruning visible in the physical plan
    plan = hit._jdf.queryExecution().executedPlan().toString()
    assert "shard" in plan


def test_routing_placement_matches_router(spark, built):
    out, _, _ = built
    router = ShardRouter(shards=4, num_partitions=16)
    sample = read_index(spark, out).select("id", "shard").limit(200).collect()
    for r in sample:
        assert router.micro_shard_of(r["id"]) // 4 == r["shard"], r["id"]


def test_dedup_on_rebuild_upsert(spark, built, tmp_path):
    """C6 upsert: re-adding docs with same id replaces (retain-most-recent)."""
    out, _, docs = built
    updated = docs.withColumn("n_chars", F.col("n_chars") + 1_000_000).withColumn(
        "text", F.lit("updated")
    )
    both = docs.unionByName(updated)
    job = IndexJob(
        IndexJobConfig(schema=DOC_SCHEMA, shards=2, dedup="retain_most_recent",
                       order_field="n_chars", tiebreak=("id",))
    )
    out2 = str(tmp_path / "upsert_index")
    job.build(both, out2)
    idx = read_index(spark, out2)
    assert idx.count() == docs.count()
    assert idx.filter(F.col("text") != "updated").count() == 0


def test_sorted_within_shard(spark, built):
    out, _, _ = built
    import glob
    import pyarrow.parquet as pq

    files = glob.glob(f"{out}/shard=0/*.parquet")
    assert files
    ids = pq.read_table(files[0], columns=["id"])["id"].to_pylist()
    assert ids == sorted(ids)


def test_compact_to_single_segment(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "id", F.col("doc_id").cast("string")
    )
    out = str(tmp_path / "compact_index")
    job = IndexJob(IndexJobConfig(schema=DOC_SCHEMA, shards=2, dedup="none",
                                  max_records_per_file=100))
    job.build(docs, out)
    before = segment_counts(out)
    assert max(before.values()) > 1
    compact(spark, out, max_segments=1)
    after = segment_counts(out)
    assert set(after.values()) == {1}
    assert read_index(spark, out).count() == docs.count()


def test_merge_driver_iterative_resume(spark, sf_dir, tmp_path, monkeypatch):
    """A29: iterative fanout compaction with _ITERATION checkpointing and
    crash-resume (SolrMergeDriverTest.testRetryMerge analog)."""
    import os

    from solr_map_reduce_spark import indexing
    from solr_map_reduce_spark.indexing import ITERATION_FILE, merge_driver

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "id", F.col("doc_id").cast("string")
    )
    out = str(tmp_path / "merge_index")
    job = IndexJob(IndexJobConfig(schema=DOC_SCHEMA, shards=2, dedup="none",
                                  max_records_per_file=25))
    job.build(docs, out)
    before = segment_counts(out)
    assert max(before.values()) > 4
    ckpt = os.path.join(out, ITERATION_FILE)

    # crash after the first successful iteration
    real_compact = indexing.compact
    calls = {"n": 0}

    def flaky_compact(*a, **kw):
        if calls["n"] >= 1:
            raise RuntimeError("injected crash")
        calls["n"] += 1
        return real_compact(*a, **kw)

    monkeypatch.setattr(indexing, "compact", flaky_compact)
    with pytest.raises(RuntimeError):
        merge_driver(spark, out, max_segments=1, fanout=4)
    assert open(ckpt).read().strip() == "1"  # checkpoint survived the crash
    assert 1 < max(segment_counts(out).values()) <= 4  # partial progress kept

    # resume from the checkpoint and converge
    monkeypatch.setattr(indexing, "compact", real_compact)
    ran = merge_driver(spark, out, max_segments=1, fanout=4)
    assert ran >= 1
    assert set(segment_counts(out).values()) == {1}
    assert not os.path.exists(ckpt)
    assert read_index(spark, out).count() == docs.count()


def test_publish_atomic_swap(spark, sf_dir, tmp_path):
    """A21/A22: staged artifact promoted to live path; old version replaced."""
    import os

    from solr_map_reduce_spark.indexing import publish

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "id", F.col("doc_id").cast("string")
    )
    job = IndexJob(IndexJobConfig(schema=DOC_SCHEMA, shards=2, dedup="none"))
    live = str(tmp_path / "live")

    stage1 = str(tmp_path / "staging1")
    job.build(docs.limit(100), stage1)
    publish(stage1, live)
    assert read_index(spark, live).count() == 100
    assert os.path.exists(os.path.join(live, "_SUCCESS_PUBLISH"))

    stage2 = str(tmp_path / "staging2")
    job.build(docs, stage2)
    publish(stage2, live)
    assert read_index(spark, live).count() == docs.count()
    assert not os.path.exists(stage2)


def test_native_routing_build(spark, sf_dir, tmp_path):
    """routing='native': JVM-side hash placement — same artifact contract,
    no murmur3-parity UDF in the plan."""
    import pyspark.sql.functions as F2

    from solr_map_reduce_spark.index_reader import SearchIndex

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "id", F.col("doc_id").cast("string")
    )
    out = str(tmp_path / "native_idx")
    job = IndexJob(
        IndexJobConfig(schema=DOC_SCHEMA, shards=4, micro_shards=16,
                       dedup="none", routing="native")
    )
    job.build(docs, out)
    idx = SearchIndex.open(spark, out)
    assert idx.routing == "native"
    assert idx.count() == docs.count()
    # placement matches Spark's builtin hash
    sample = idx.df().select("id", "shard").limit(100).collect()
    expect = {
        r["id"]: r["s"]
        for r in docs.select(
            "id", (F2.pmod(F2.hash("id"), F2.lit(16)) / 4).cast("int").alias("s")
        ).collect()
    }
    for r in sample:
        assert expect[r["id"]] == r["shard"]
    # lookups still correct without driver-side shard math
    some = docs.orderBy("id").first()["id"]
    assert idx.get(some).count() == 1


def test_invalid_routing_rejected():
    with pytest.raises(ValueError, match="routing"):
        IndexJobConfig(schema=DOC_SCHEMA, shards=2, routing="bogus")


def test_empty_input_build(spark, tmp_path):
    """Building from zero rows must produce a valid, openable artifact."""
    from solr_map_reduce_spark.index_reader import SearchIndex

    empty = spark.createDataFrame(
        [], "id string, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "empty_idx")
    job = IndexJob(IndexJobConfig(schema=DOC_SCHEMA, shards=2, dedup="retain_most_recent",
                                  order_field="n_chars"))
    job.build(empty, out)
    idx = SearchIndex.open(spark, out)
    assert idx.count() == 0
    assert idx.get("nope").count() == 0
    assert idx.facet("lang").count() == 0
