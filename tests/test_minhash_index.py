"""Incremental MinHash index: per-batch dedup must agree with the one-shot
pipeline (same seed ⇒ same signatures ⇒ same candidates ⇒ same verified
pairs), and the dedup-ingest pattern must drop exactly the duplicates."""

import pyspark.sql.functions as F
import pytest

from solr_map_reduce_spark.extensions.minhash_index import MinHashIndex, MinHashParams
from solr_map_reduce_spark.extensions.text_dedup import minhash_dedup


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    copies = d.filter(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    return d.unionByName(copies).localCheckpoint(eager=True)


def test_incremental_match_equals_one_shot(spark, corpus, tmp_path):
    half_a = corpus.filter(F.col("doc_id") % 2 == 0)
    half_b = corpus.filter(F.col("doc_id") % 2 == 1)
    a_ids = {r["doc_id"] for r in half_a.select("doc_id").collect()}

    idx = MinHashIndex.create(spark, str(tmp_path / "mhidx"))
    idx.add(half_a)
    got_pairs = {
        frozenset((r["id_a"], r["id_b"]))
        for r in idx.match(half_b, threshold=0.5).collect()
    }

    one_shot = {
        frozenset((r["id_a"], r["id_b"]))
        for r in minhash_dedup(corpus, threshold=0.5).collect()
    }
    # match(B) sees intra-B and A↔B pairs; A-internal pairs are history
    want = {p for p in one_shot if not p <= a_ids}
    assert got_pairs == want
    assert want, "fixture must produce cross/intra-batch duplicate pairs"


def test_match_kinds_and_reopen(spark, corpus, tmp_path):
    path = str(tmp_path / "mhidx2")
    half_a = corpus.filter(F.col("doc_id") % 2 == 0)
    half_b = corpus.filter(F.col("doc_id") % 2 == 1)
    MinHashIndex.create(spark, path).add(half_a)
    # reopen from the manifest — params persist
    idx = MinHashIndex.open(spark, path)
    assert idx.params == MinHashParams()
    pairs = idx.match(half_b, threshold=0.5)
    kinds = {r["match_kind"] for r in pairs.select("match_kind").distinct().collect()}
    assert kinds <= {"intra", "corpus"}
    b_ids = {r["doc_id"] for r in half_b.select("doc_id").collect()}
    for r in pairs.collect():
        assert r["id_a"] in b_ids
        if r["match_kind"] == "corpus":
            assert r["id_b"] not in b_ids
        else:
            assert r["id_b"] in b_ids and r["id_a"] < r["id_b"]


def test_add_unique_drops_duplicates(spark, corpus, tmp_path):
    idx = MinHashIndex.create(spark, str(tmp_path / "mhidx3"))
    base = corpus.filter(F.col("doc_id") < 1_000_000)
    n1, pairs1 = idx.add_unique(base, threshold=0.9)
    # greedy min-id-wins within the batch: survivors = all minus the ids
    # that lose (appear as the larger id) in some one-shot near-dup pair
    losers = {
        r["id_b"] for r in minhash_dedup(base, threshold=0.9).collect()
    }
    assert n1 == base.count() - len(losers)

    # re-ingesting exact copies under new ids indexes NOTHING new
    copies = base.withColumn("doc_id", F.col("doc_id") + F.lit(5_000_000))
    n2, pairs2 = idx.add_unique(copies, threshold=0.9)
    assert n2 == 0
    assert pairs2.filter(F.col("match_kind") == "corpus").count() >= base.count()


def test_empty_index_matches_nothing_cross(spark, corpus, tmp_path):
    idx = MinHashIndex.create(spark, str(tmp_path / "mhidx4"))
    pairs = idx.match(corpus.limit(50), threshold=0.5)
    assert pairs.filter(F.col("match_kind") == "corpus").count() == 0


def test_ivf_index_save_load_search_stored(spark, sf_dir, tmp_path):
    """Persisted IVF index: stored search partition-prunes to the probed
    buckets and, with all buckets probed, equals brute-force top-k."""
    from solr_map_reduce_spark.extensions.similarity import IvfIndex, cosine_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = e.orderBy("vec_id").select("embedding").first()["embedding"]
    idx = IvfIndex.fit(e, n_centroids=8)
    path = str(tmp_path / "ivf")
    idx.save(path, assigned=idx.assign(e))

    reloaded = IvfIndex.load(spark, path)
    assert reloaded.centroids.shape == idx.centroids.shape

    # all buckets probed == exact brute force
    got = [r["vec_id"] for r in
           reloaded.search_stored(spark, path, qvec, k=10, nprobe=8).collect()]
    want = [r["vec_id"] for r in cosine_topk(e, qvec, k=10).collect()]
    assert got == want

    # pruned probe reads only the probed bucket directories
    pruned = reloaded.search_stored(spark, path, qvec, k=10, nprobe=2)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    assert len(pruned.collect()) == 10


def test_match_string_ids_empty_index(spark, tmp_path):
    """Empty-index match keeps the caller's id type (not hard-coded long),
    so later unions/joins against it resolve."""
    idx = MinHashIndex.create(spark, str(tmp_path / "mhidx5"))
    docs = spark.createDataFrame(
        [("a", "one two three"), ("b", "four five six")], "doc_id string, text string"
    )
    pairs = idx.match(docs, include_intra_batch=False)
    assert pairs.count() == 0
    assert pairs.schema["id_a"].dataType.typeName() == "string"
    # unions with a non-empty later match
    idx.add(docs)
    more = idx.match(docs.limit(1), threshold=0.9)
    assert pairs.unionByName(more).count() == more.count()


def test_rematch_of_indexed_batch_one_row_per_pair(spark, sf_dir, tmp_path):
    """Ingest retry: re-matching a batch that is already indexed must not
    multiply pair rows through duplicated feature rows."""
    idx = MinHashIndex.create(spark, str(tmp_path / "mhidx6"))
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    batch = d.limit(60).unionByName(
        d.limit(10).withColumn("doc_id", F.col("doc_id") + F.lit(900_000))
    )
    idx.add(batch)
    pairs = idx.match(batch, threshold=0.9)
    rows = pairs.select("id_a", "id_b").collect()
    assert len(rows) == len({(r["id_a"], r["id_b"]) for r in rows})
    # the injected copies are found against the stored corpus
    assert pairs.filter(F.col("match_kind") == "corpus").count() >= 10


def test_create_refuses_existing_index(spark, tmp_path):
    """create() on a path that already holds an index must refuse: replacing
    only the manifest would leave bands/features computed under incompatible
    parameters silently in place."""
    path = str(tmp_path / "mhidx7")
    idx = MinHashIndex.create(spark, path)
    docs = spark.createDataFrame(
        [("a", "one two three four five")], "doc_id string, text string"
    )
    idx.add(docs)
    with pytest.raises(FileExistsError):
        MinHashIndex.create(spark, path, params=MinHashParams(num_perm=64))
    # overwrite=True wipes bands/features along with the manifest
    idx2 = MinHashIndex.create(
        spark, path, params=MinHashParams(num_perm=64), overwrite=True
    )
    assert idx2.params.num_perm == 64
    assert idx2.match(docs, include_intra_batch=False).count() == 0


def test_retry_pair_reported_once_across_orientations(spark, tmp_path):
    """Ingest retry where the SMALLER-id batch doc is already indexed: the
    pair surfaces intra as (min,max) and corpus as (batch_id, stored_id) —
    one unordered pair, so exactly one output row (corpus orientation wins)."""
    idx = MinHashIndex.create(spark, str(tmp_path / "mhidx8"))
    text = "alpha beta gamma delta epsilon zeta eta theta"
    stored = spark.createDataFrame([(1, text)], "doc_id long, text string")
    idx.add(stored)
    batch = spark.createDataFrame([(1, text), (2, text)], "doc_id long, text string")
    pairs = idx.match(batch, threshold=0.9).collect()
    unordered = {frozenset((r["id_a"], r["id_b"])) for r in pairs}
    assert len(pairs) == len(unordered), "same unordered pair reported twice"
    by_pair = {frozenset((r["id_a"], r["id_b"])): r for r in pairs}
    hit = by_pair[frozenset((1, 2))]
    assert hit["match_kind"] == "corpus"
    assert (hit["id_a"], hit["id_b"]) == (2, 1)  # (batch, stored) orientation
