"""Golden tests for the round-4 similarity/dedup additions: broadcast kNN
join, product quantization (PQ) ANN, and passage-level corpus dedup."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from solr_map_reduce_spark.extensions.similarity import (
    PqCodec,
    cosine_topk,
    knn_join,
)
from solr_map_reduce_spark.extensions.text_dedup import dedup_passages
from tests.conftest import load


# ---------------------------------------------------------------------------
# knn_join
# ---------------------------------------------------------------------------

def test_knn_join_matches_per_query_bruteforce(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("label") == 0).limit(5)
    corpus = emb.filter(F.col("label") != 0)
    got = {
        (r["query_id"], r["knn_rank"]): r["neighbor_id"]
        for r in knn_join(queries, corpus, k=3).collect()
    }
    q_rows = queries.collect()
    assert len(got) == 3 * len(q_rows)
    for q in q_rows:
        expect = [
            r["vec_id"]
            for r in cosine_topk(corpus, q["embedding"], k=3).collect()
        ]
        assert [got[(q["vec_id"], i + 1)] for i in range(3)] == expect


def test_knn_join_rank_is_dense_per_query(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    out = knn_join(
        emb.filter(F.col("label") == 0),
        emb.filter(F.col("label") != 0),
        k=5,
    )
    counts = out.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("knn_rank").alias("lo"),
        F.max("knn_rank").alias("hi"),
    )
    bad = counts.filter(
        (F.col("n") != 5) | (F.col("lo") != 1) | (F.col("hi") != 5)
    )
    assert bad.count() == 0


# ---------------------------------------------------------------------------
# PqCodec
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pq(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    return emb, PqCodec.fit(emb, m=8, ksub=16, seed=42)


def test_pq_code_shape_and_range(pq):
    emb, codec = pq
    assert (codec.m, codec.ksub, codec.dsub) == (8, 16, 8)
    rows = codec.encode(emb).select("pq_code").limit(20).collect()
    for r in rows:
        code = r["pq_code"]
        assert len(code) == 8
        assert all(0 <= c < 16 for c in code)


def test_pq_fit_is_deterministic(pq):
    emb, codec = pq
    again = PqCodec.fit(emb, m=8, ksub=16, seed=42)
    assert np.array_equal(codec.codebooks, again.codebooks)


def test_pq_topk_recall_vs_exact(pq):
    emb, codec = pq
    encoded = codec.encode(emb).select("vec_id", "pq_code").cache()
    hits = total = 0
    for q in emb.orderBy("vec_id").limit(5).collect():
        query = q["embedding"]
        exact = {r["vec_id"] for r in cosine_topk(emb, query, k=10).collect()}
        approx = {r["vec_id"] for r in codec.topk(encoded, query, k=10).collect()}
        hits += len(exact & approx)
        total += len(exact)
    # 32x-compressed codes on random synthetic vectors: coarse but must
    # beat chance by a wide margin (chance recall at 500 rows is 10/500)
    assert hits / total >= 0.3
    encoded.unpersist()


def test_pq_self_neighbor_rank(pq):
    # the encoded vector itself should score near the top for its own query
    emb, codec = pq
    encoded = codec.encode(emb)
    q = emb.orderBy("vec_id").limit(1).collect()[0]
    top = [r["vec_id"] for r in codec.topk(encoded, q["embedding"], k=10).collect()]
    assert q["vec_id"] in top


# ---------------------------------------------------------------------------
# dedup_passages
# ---------------------------------------------------------------------------

def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_passage_dedup_removes_later_duplicates(spark):
    docs = _mk_docs(
        spark,
        [
            (1, "a b c d"),
            (2, "a b c d e f"),  # chunk "a b c d" duplicates doc 1's
            (3, "x y"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in dedup_passages(docs, chunk_words=4).collect()
    }
    assert out[1]["dedup_text"] == "a b c d"
    assert out[1]["n_kept"] == 1 and out[1]["n_total"] == 1
    # doc 2 loses its first chunk but keeps its tail chunk
    assert out[2]["dedup_text"] == "e f"
    assert (out[2]["n_kept"], out[2]["n_total"]) == (1, 2)
    assert out[3]["dedup_text"] == "x y"


def test_passage_dedup_fully_duplicated_doc_comes_back_empty(spark):
    docs = _mk_docs(spark, [(1, "a b"), (2, "a b")])
    out = {r["doc_id"]: r for r in dedup_passages(docs, chunk_words=4).collect()}
    assert out[2]["dedup_text"] == ""
    assert out[2]["n_kept"] == 0 and out[2]["n_total"] == 1


def test_passage_dedup_preserves_within_doc_order(spark):
    docs = _mk_docs(spark, [(1, "a a b b c c")])
    out = dedup_passages(docs, chunk_words=2).collect()[0]
    assert out["dedup_text"] == "a a b b c c"
    assert out["n_kept"] == 3


def test_passage_dedup_dedupes_within_one_doc(spark):
    docs = _mk_docs(spark, [(1, "a b a b c d")])
    out = dedup_passages(docs, chunk_words=2).collect()[0]
    assert out["dedup_text"] == "a b c d"
    assert (out["n_kept"], out["n_total"]) == (2, 3)


# ---------------------------------------------------------------------------
# IvfPqIndex
# ---------------------------------------------------------------------------

def test_ivfpq_build_load_search_and_pruning(spark, sf_dir, tmp_path):
    from solr_map_reduce_spark.extensions.similarity import IvfPqIndex

    emb = load(spark, sf_dir, "embeddings")
    idx = IvfPqIndex.fit(emb, n_centroids=8, m=8, ksub=16, seed=42)
    path = str(tmp_path / "ivfpq")
    idx.build(emb, path)

    # stored table holds only (id, code) + the bucket partition column
    codes = spark.read.parquet(f"{path}/codes")
    assert set(codes.columns) == {"vec_id", "pq_code", "bucket"}

    q = emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    reloaded = IvfPqIndex.load(spark, path)
    got = reloaded.search_stored(spark, path, q, k=10, nprobe=3)
    plan = got._jdf.queryExecution().executedPlan().toString()
    # bucket filter must hit the partition column, not a post-scan filter
    assert "PartitionFilters" in plan and "bucket" in plan
    rows = got.collect()
    assert len(rows) == 10

    # coarse recall sanity vs exact over 3 queries: compressed + pruned
    # search must still land a solid fraction of the true top-10
    hits = total = 0
    for qr in emb.orderBy("vec_id").limit(3).collect():
        exact = {r["vec_id"] for r in cosine_topk(emb, qr["embedding"], k=10).collect()}
        approx = {
            r["vec_id"]
            for r in reloaded.search_stored(spark, path, qr["embedding"], k=10, nprobe=4).collect()
        }
        hits += len(exact & approx)
        total += len(exact)
    assert hits / total >= 0.2


def test_ivfpq_matches_fit_params_roundtrip(spark, sf_dir, tmp_path):
    from solr_map_reduce_spark.extensions.similarity import IvfPqIndex

    emb = load(spark, sf_dir, "embeddings")
    idx = IvfPqIndex.fit(emb, n_centroids=4, m=4, ksub=8, seed=7)
    path = str(tmp_path / "ivfpq2")
    idx.build(emb, path)
    re = IvfPqIndex.load(spark, path)
    assert np.array_equal(re.ivf.centroids, idx.ivf.centroids)
    assert np.array_equal(re.pq.codebooks, idx.pq.codebooks)


# ---------------------------------------------------------------------------
# knn_classify
# ---------------------------------------------------------------------------

def test_knn_classify_majority_with_ties_to_smallest_label(spark, sf_dir):
    from solr_map_reduce_spark.extensions.similarity import knn_classify, knn_join

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("label") == 0).limit(8)
    corpus = emb.filter(F.col("label") != 0)
    got = {
        r["query_id"]: (r["predicted_label"], r["votes"])
        for r in knn_classify(queries, corpus, k=5).collect()
    }
    assert len(got) == queries.count()
    # recompute the expectation from knn_join + driver-side counting
    labels = {r["vec_id"]: r["label"] for r in corpus.select("vec_id", "label").collect()}
    from collections import Counter, defaultdict

    nbrs = defaultdict(list)
    for r in knn_join(queries, corpus, k=5).collect():
        nbrs[r["query_id"]].append(labels[r["neighbor_id"]])
    for qid, lab_list in nbrs.items():
        counts = Counter(lab_list)
        best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
        assert got[qid] == (best[0], best[1]), qid


def test_knn_classify_one_row_per_query(spark, sf_dir):
    from solr_map_reduce_spark.extensions.similarity import knn_classify

    emb = load(spark, sf_dir, "embeddings")
    out = knn_classify(
        emb.filter(F.col("label") == 0), emb.filter(F.col("label") != 0), k=3
    )
    n_q = emb.filter(F.col("label") == 0).count()
    assert out.count() == n_q
    assert out.select("query_id").distinct().count() == n_q


# ---------------------------------------------------------------------------
# cap_per_group
# ---------------------------------------------------------------------------

def test_cap_per_group_deterministic_top_n(spark):
    from solr_map_reduce_spark.extensions.text_analysis import cap_per_group

    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 30), ("a", 3, 30), ("a", 4, 20), ("b", 5, 1)],
        "src string, id long, score long",
    )
    out = cap_per_group(df, "src", "score", 2, tiebreak_col="id")
    got = sorted((r["src"], r["id"]) for r in out.collect())
    # a: score-30 rows win, tie broken by smaller id (2 then 3); b keeps its one
    assert got == [("a", 2), ("a", 3), ("b", 5)]


# ---------------------------------------------------------------------------
# knn_join query-side guard (r4 advice: the small-query contract is enforced)
# ---------------------------------------------------------------------------

def test_knn_join_rejects_oversized_query_side(spark):
    import pyspark.sql.functions as F

    big = spark.range(0, 50).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(seed=1), F.rand(seed=2)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="max_queries"):
        knn_join(big, big, k=2, max_queries=10)
    # explicit raise of the cap restores the old behavior
    out = knn_join(big.limit(12), big, k=2, max_queries=12)
    assert out.count() == 24


# ---------------------------------------------------------------------------
# IvfIndex.add — incremental ANN ingest (r5)
# ---------------------------------------------------------------------------

def test_ivf_incremental_add_equals_one_shot(spark, sf_dir, tmp_path):
    """Append-ingesting the second half of the corpus must yield the SAME
    stored-search results as assigning everything at once (same centroids),
    and must not rewrite any existing bucket file (O(batch) proof)."""
    import os

    from solr_map_reduce_spark.extensions.similarity import IvfIndex

    emb = load(spark, sf_dir, "embeddings")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)
    ivf = IvfIndex.fit(first, n_centroids=8)

    inc_path = str(tmp_path / "ivf_inc")
    ivf.save(inc_path, assigned=ivf.assign(first))
    vec_dir = os.path.join(inc_path, "vectors")
    before = {
        os.path.join(b, f)
        for b in os.listdir(vec_dir)
        if b.startswith("bucket=")
        for f in os.listdir(os.path.join(vec_dir, b))
        if f.endswith(".parquet")
    }
    ivf.add(second, inc_path)
    after = {
        os.path.join(b, f)
        for b in os.listdir(vec_dir)
        if b.startswith("bucket=")
        for f in os.listdir(os.path.join(vec_dir, b))
        if f.endswith(".parquet")
    }
    assert before <= after and len(after) > len(before)  # pure append

    one_path = str(tmp_path / "ivf_one")
    ivf.save(one_path, assigned=ivf.assign(emb))

    q = emb.filter(F.col("vec_id") == 3).select("embedding").collect()[0][0]
    inc = [
        (r["vec_id"], round(r["score"], 9))
        for r in IvfIndex.load(spark, inc_path)
        .search_stored(spark, inc_path, q, k=8, nprobe=3)
        .collect()
    ]
    one = [
        (r["vec_id"], round(r["score"], 9))
        for r in IvfIndex.load(spark, one_path)
        .search_stored(spark, one_path, q, k=8, nprobe=3)
        .collect()
    ]
    assert inc == one and len(inc) == 8


def test_ivfpq_incremental_add_equals_one_shot(spark, sf_dir, tmp_path):
    """Appending the second half into a built IVF-PQ index must produce the
    same ADC search results as building over the full corpus with the same
    centroids+codebooks."""
    from solr_map_reduce_spark.extensions.similarity import IvfPqIndex

    emb = load(spark, sf_dir, "embeddings")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)
    idx = IvfPqIndex.fit(first, n_centroids=8, m=8, ksub=16)

    inc_path = str(tmp_path / "ivfpq_inc")
    idx.build(first, inc_path)
    idx.add(second, inc_path)
    one_path = str(tmp_path / "ivfpq_one")
    idx.build(emb, one_path)

    q = emb.filter(F.col("vec_id") == 3).select("embedding").collect()[0][0]
    inc = [
        (r["vec_id"], round(r["score"], 9))
        for r in IvfPqIndex.load(spark, inc_path)
        .search_stored(spark, inc_path, q, k=8, nprobe=3)
        .collect()
    ]
    one = [
        (r["vec_id"], round(r["score"], 9))
        for r in IvfPqIndex.load(spark, one_path)
        .search_stored(spark, one_path, q, k=8, nprobe=3)
        .collect()
    ]
    assert inc == one and len(inc) == 8


def test_ivf_batch_tag_replay_idempotent(spark, sf_dir, tmp_path):
    """Re-delivering the same tagged batch (the foreachBatch at-least-once
    contract, including a partial first attempt) must leave exactly one
    copy of every vector."""
    from solr_map_reduce_spark.extensions.similarity import IvfIndex

    emb = load(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 100)
    batch = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 150))
    ivf = IvfIndex.fit(base, n_centroids=4)
    path = str(tmp_path / "ivf")
    ivf.save(path, assigned=ivf.assign(base))
    ivf.add(batch, path, batch_tag="7")
    ivf.add(batch, path, batch_tag="7")  # replay: must not duplicate
    stored = spark.read.parquet(path + "/vectors")
    assert stored.count() == 150
    assert stored.groupBy("vec_id").count().filter("count > 1").count() == 0


def test_ivf_replay_sweep_touches_only_batch_buckets(spark, sf_dir, tmp_path):
    """ADVICE r5: the replay-idempotence sweep must be O(batch) — it
    visits only the buckets this batch stages into (plus buckets a
    crashed attempt's staging dir recorded), never the whole index.
    Proven behaviorally: a tag-prefixed decoy in an unrelated bucket
    survives, while a partial file in a bucket the stale staging dir
    recorded is swept."""
    import os

    from solr_map_reduce_spark.extensions.similarity import IvfIndex

    emb = load(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 100)
    batch = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 105))
    ivf = IvfIndex.fit(base, n_centroids=8)
    path = str(tmp_path / "ivf")
    ivf.save(path, assigned=ivf.assign(base))

    staged = {
        r["bucket"] for r in ivf.assign(batch).select("bucket").distinct().collect()
    }
    unused = sorted(set(range(8)) - staged - {0})[-2:]
    assert len(unused) == 2  # tiny batch cannot cover every bucket id
    decoy_b, crashed_b = unused
    vec_dir = os.path.join(path, "vectors")
    # decoy: tag-prefixed file in a bucket NEITHER staged NOR recorded by
    # a prior attempt — an O(index) sweep would delete it; O(batch) must
    # never even visit that bucket
    os.makedirs(os.path.join(vec_dir, f"bucket={decoy_b}"), exist_ok=True)
    decoy = os.path.join(vec_dir, f"bucket={decoy_b}", "b7-decoy.parquet")
    with open(decoy, "w") as f:
        f.write("x")
    # crashed earlier attempt of tag 7: its staging dir recorded a bucket
    # and a partial tag-prefixed file landed there
    os.makedirs(os.path.join(path, "_ingest_7", f"bucket={crashed_b}"))
    os.makedirs(os.path.join(vec_dir, f"bucket={crashed_b}"), exist_ok=True)
    partial = os.path.join(vec_dir, f"bucket={crashed_b}", "b7-part.parquet")
    with open(partial, "w") as f:
        f.write("y")

    ivf.add(batch, path, batch_tag="7")
    assert os.path.exists(decoy)  # unrelated bucket never visited
    assert not os.path.exists(partial)  # recorded crash bucket swept
    assert not os.path.exists(os.path.join(path, "_ingest_7"))


def test_stream_ivf_ingest_end_to_end(spark, sf_dir, tmp_path):
    from solr_map_reduce_spark.extensions.similarity import IvfIndex
    from solr_map_reduce_spark.streaming.ingest import stream_ivf_ingest

    emb = load(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 100)
    ivf = IvfIndex.fit(base, n_centroids=4)
    path = str(tmp_path / "ivf")
    ivf.save(path, assigned=ivf.assign(base))
    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 160)).write.parquet(inp)
    stream_ivf_ingest(spark, inp, emb.schema, path, ckpt).awaitTermination(120)
    # second drain with more files: only the new ones ingest (checkpoint)
    emb.filter((F.col("vec_id") >= 160) & (F.col("vec_id") < 200)).write.mode(
        "append"
    ).parquet(inp)
    stream_ivf_ingest(spark, inp, emb.schema, path, ckpt).awaitTermination(120)
    stored = spark.read.parquet(path + "/vectors")
    assert stored.count() == 200
    assert stored.groupBy("vec_id").count().filter("count > 1").count() == 0
    # a streamed vector is findable through the stored probe
    q = emb.filter(F.col("vec_id") == 180).select("embedding").collect()[0][0]
    got = [
        r["vec_id"]
        for r in IvfIndex.load(spark, path)
        .search_stored(spark, path, q, k=3, nprobe=4)
        .collect()
    ]
    assert 180 in got


def test_ivf_compact_preserves_results_and_replay_idempotence(spark, sf_dir, tmp_path):
    """Round-6: bucket compaction for a streaming-aged index — file count
    drops to ~one per bucket, search results are identical, and a LATE
    REPLAY of an absorbed batch tag is a no-op (exactly-once survives
    compaction)."""
    import os

    from solr_map_reduce_spark.extensions.similarity import IvfIndex

    emb = load(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 100)
    ivf = IvfIndex.fit(base, n_centroids=4)
    path = str(tmp_path / "ivf")
    ivf.save(path, assigned=ivf.assign(base))
    # age the index: several tagged micro-batches
    for tag, lo in (("10", 100), ("11", 130), ("12", 160)):
        batch = emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 30))
        ivf.add(batch, path, batch_tag=tag)
    q = emb.filter(F.col("vec_id") == 3).select("embedding").collect()[0][0]
    before = [
        (r["vec_id"], round(r["score"], 9))
        for r in ivf.search_stored(spark, path, q, k=8, nprobe=4).collect()
    ]
    vec_dir = os.path.join(path, "vectors")

    def count_files():
        return sum(
            1
            for b in os.listdir(vec_dir)
            if b.startswith("bucket=")
            for f in os.listdir(os.path.join(vec_dir, b))
            if f.endswith(".parquet")
        )

    n_buckets = sum(1 for b in os.listdir(vec_dir) if b.startswith("bucket="))
    assert count_files() > n_buckets  # the batches really did accumulate
    removed = ivf.compact(spark, path)
    assert removed > 0
    assert count_files() == n_buckets  # ~one file per bucket
    after = [
        (r["vec_id"], round(r["score"], 9))
        for r in ivf.search_stored(spark, path, q, k=8, nprobe=4).collect()
    ]
    assert after == before  # identical results
    # late replay of an absorbed tag: must NOT re-append
    replay = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 130))
    ivf.add(replay, path, batch_tag="10")
    stored = spark.read.parquet(vec_dir)
    assert stored.count() == 190
    assert stored.groupBy("vec_id").count().filter("count > 1").count() == 0
    # a genuinely NEW tag still appends normally after compaction
    ivf.add(emb.filter((F.col("vec_id") >= 190) & (F.col("vec_id") < 200)), path, batch_tag="13")
    assert spark.read.parquet(vec_dir).count() == 200


def test_ivf_compact_refuses_inflight_staging_and_takes_lock(spark, sf_dir, tmp_path):
    """Second self-review: compact must refuse while a crashed/in-flight
    ingest staging dir survives (absorbing its tag would turn the replay
    into a data-losing no-op), and must hold the artifact mutation lock."""
    import os

    import pytest as _pytest

    from solr_map_reduce_spark.extensions.similarity import IvfIndex
    from solr_map_reduce_spark.indexing import ArtifactLockedError

    emb = load(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 100)
    ivf = IvfIndex.fit(base, n_centroids=4)
    path = str(tmp_path / "ivf")
    ivf.save(path, assigned=ivf.assign(base))
    ivf.add(emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 130)),
            path, batch_tag="7")
    # simulate a crashed mid-move attempt: surviving staging dir
    os.makedirs(os.path.join(path, "_ingest_8", "bucket=0"))
    with _pytest.raises(RuntimeError, match="staging"):
        ivf.compact(spark, path)
    import shutil

    shutil.rmtree(os.path.join(path, "_ingest_8"))
    # a held mutation lock blocks compaction
    with open(os.path.join(path, "_MUTATION_LOCK"), "w") as f:
        f.write('{"op": "x", "pid": 1}')
    with _pytest.raises(ArtifactLockedError):
        ivf.compact(spark, path)
    os.remove(os.path.join(path, "_MUTATION_LOCK"))
    assert ivf.compact(spark, path) > 0  # clean state compacts fine


def test_ivf_compact_recovers_interrupted_swap(spark, sf_dir, tmp_path):
    """Round-7 (ADVICE r6): a crash BETWEEN the two swap renames leaves no
    live vectors/ dir — a compact rerun must roll the swap forward from
    the completed stage (or back to the old dir), not die in listdir."""
    import os
    import shutil

    from solr_map_reduce_spark.extensions.similarity import IvfIndex

    emb = load(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 100)
    ivf = IvfIndex.fit(base, n_centroids=4)
    path = str(tmp_path / "ivf_crash")
    ivf.save(path, assigned=ivf.assign(base))
    ivf.add(emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 130)),
            path, batch_tag="t1")
    q = emb.filter(F.col("vec_id") == 3).select("embedding").collect()[0][0]
    want = [(r["vec_id"], round(r["score"], 9))
            for r in ivf.search_stored(spark, path, q, k=8, nprobe=4).collect()]
    vec = os.path.join(path, "vectors")

    # crash state A: vectors renamed aside, stage complete, swap-in missed
    shutil.copytree(vec, os.path.join(path, "vectors__compact"))
    os.rename(vec, os.path.join(path, "vectors__old"))
    removed = ivf.compact(spark, path)  # must self-heal, then compact
    assert removed >= 0 and os.path.isdir(vec)
    assert not os.path.exists(os.path.join(path, "vectors__old"))
    assert not os.path.exists(os.path.join(path, "vectors__compact"))
    got = [(r["vec_id"], round(r["score"], 9))
           for r in ivf.search_stored(spark, path, q, k=8, nprobe=4).collect()]
    assert got == want

    # crash state B: only the renamed-aside old dir survives (no stage)
    os.rename(vec, os.path.join(path, "vectors__old"))
    removed = ivf.compact(spark, path)
    assert os.path.isdir(vec)
    got = [(r["vec_id"], round(r["score"], 9))
           for r in ivf.search_stored(spark, path, q, k=8, nprobe=4).collect()]
    assert got == want

    # crash state C: stale stage beside a LIVE store is junk — dropped
    shutil.copytree(vec, os.path.join(path, "vectors__compact"))
    ivf.compact(spark, path)
    assert not os.path.exists(os.path.join(path, "vectors__compact"))
    got = [(r["vec_id"], round(r["score"], 9))
           for r in ivf.search_stored(spark, path, q, k=8, nprobe=4).collect()]
    assert got == want


class TestScalarQuantization:
    """int8 SQ: code error bound, recall vs the exact dot-product scan,
    clamping of out-of-range serve-time values, degenerate corpus."""

    def _vecs(self, n=200, d=16, seed=7):
        import numpy as np

        rng = np.random.default_rng(seed)
        return rng.normal(size=(n, d)).astype("float32")

    def test_code_error_bound_and_roundtrip(self, spark):
        import numpy as np

        from solr_map_reduce_spark.extensions.similarity import (
            sq_code_col, sq_fit, _sq_scale,
        )
        import pyspark.sql.functions as F

        v = self._vecs()
        df = spark.createDataFrame(
            [(i, row.tolist()) for i, row in enumerate(v)],
            "vec_id long, embedding array<float>",
        )
        mn, mx = sq_fit(df)
        assert mn == float(v.min()) and mx == float(v.max())
        scale = _sq_scale(mn, mx, 8)
        rows = df.select(
            "vec_id", sq_code_col(F.col("embedding"), mn, mx).alias("c"),
            F.col("embedding").cast("array<double>").alias("e"),
        ).collect()
        for r in rows:
            assert all(-127 <= c <= 127 for c in r["c"])
            decoded = np.array(r["c"]) * scale
            assert np.abs(decoded - np.array(r["e"])).max() <= scale / 2 + 1e-12

    def test_recall_vs_exact_dot(self, spark):
        import numpy as np

        from solr_map_reduce_spark.extensions.similarity import sq_fit, sq_topk

        v = self._vecs()
        df = spark.createDataFrame(
            [(i, row.tolist()) for i, row in enumerate(v)],
            "vec_id long, embedding array<float>",
        )
        q = v[0]
        exact = set(np.argsort(-(v.astype("float64") @ q.astype("float64")))[:10].tolist())
        mn, mx = sq_fit(df)
        got = {r["vec_id"] for r in sq_topk(df, q.tolist(), k=10, mn=mn, mx=mx).collect()}
        assert len(got & exact) >= 8  # 8-bit codes: near-perfect recall

    def test_out_of_range_query_clamps(self, spark):
        from solr_map_reduce_spark.extensions.similarity import sq_encode_query

        assert sq_encode_query([-99.0, 99.0, 0.0], mn=-1.0, mx=1.0) == [-127, 127, 0]

    def test_degenerate_constant_corpus(self, spark):
        from solr_map_reduce_spark.extensions.similarity import sq_topk

        df = spark.createDataFrame(
            [(i, [1.0, 1.0]) for i in range(5)],
            "vec_id long, embedding array<float>",
        )
        out = sq_topk(df, [1.0, 1.0], k=3).collect()
        assert [r["vec_id"] for r in out] == [0, 1, 2]  # ties -> id order


class TestMmrRerank:
    """MMR diversification: the near-duplicate of the top hit is demoted,
    lam=1 degenerates to pure relevance, guards are loud."""

    def _df(self, spark):
        # v0: query direction; v1: near-duplicate of v0; v2: relevant but
        # diverse; v3: orthogonal filler
        rows = [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0]),
            (2, [0.8, 0.0, 0.6]),
            (3, [0.0, 1.0, 0.0]),
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_matches_reference_greedy_and_diversifies(self, spark):
        import numpy as np

        from solr_map_reduce_spark.extensions.similarity import mmr_rerank

        rng = np.random.default_rng(11)
        v = rng.normal(size=(20, 8)).astype("float32")
        df = spark.createDataFrame(
            [(i, row.tolist()) for i, row in enumerate(v)],
            "vec_id long, embedding array<float>",
        )
        q = v[0].tolist()
        got = [
            r["vec_id"]
            for r in mmr_rerank(df, q, k=5, pool=20, lam=0.5)
            .orderBy("mmr_rank").collect()
        ]

        # 10-line reference greedy in float64
        vd = v.astype("float64")
        qd = np.asarray(q, dtype="float64")
        rel = vd @ qd / (np.linalg.norm(vd, axis=1) * np.linalg.norm(qd))
        sims = (vd @ vd.T) / np.outer(
            np.linalg.norm(vd, axis=1), np.linalg.norm(vd, axis=1)
        )
        sel = [int(np.lexsort((np.arange(20), -rel))[0])]
        while len(sel) < 5:
            best, best_s = None, None
            for c in range(20):
                if c in sel:
                    continue
                s = 0.5 * rel[c] - 0.5 * max(sims[c][j] for j in sel)
                if best_s is None or s > best_s + 1e-12:
                    best, best_s = c, s
            sel.append(best)
        assert got == sel
        # and the diversity term actually reorders vs pure relevance
        pure = np.lexsort((np.arange(20), -rel))[:5].tolist()
        assert got != pure

    def test_lam_one_is_pure_relevance(self, spark):
        from solr_map_reduce_spark.extensions.similarity import (
            cosine_topk, mmr_rerank,
        )

        df = self._df(spark)
        want = [r["vec_id"] for r in cosine_topk(df, [1.0, 0.0, 0.0], k=3).collect()]
        got = [
            r["vec_id"]
            for r in mmr_rerank(df, [1.0, 0.0, 0.0], k=3, pool=4, lam=1.0)
            .orderBy("mmr_rank").collect()
        ]
        assert got == want

    def test_guards(self, spark):
        import pytest

        from solr_map_reduce_spark.extensions.similarity import mmr_rerank

        df = self._df(spark)
        with pytest.raises(ValueError, match="cannot exceed"):
            mmr_rerank(df, [1.0, 0.0, 0.0], k=5, pool=4)
        with pytest.raises(ValueError, match="lam"):
            mmr_rerank(df, [1.0, 0.0, 0.0], k=2, pool=4, lam=1.5)

    def test_small_pool_returns_all(self, spark):
        from solr_map_reduce_spark.extensions.similarity import mmr_rerank

        out = mmr_rerank(self._df(spark), [1.0, 0.0, 0.0], k=4, pool=4).collect()
        assert len(out) == 4
        assert sorted(r["mmr_rank"] for r in out) == [1, 2, 3, 4]


# ---------------------------------------------------------------------------
# residual-encoded IVF-PQ (r11: the standard Jégou formulation)
# ---------------------------------------------------------------------------

def test_ivfpq_residual_flag_roundtrips(spark, sf_dir, tmp_path):
    from solr_map_reduce_spark.extensions.similarity import IvfPqIndex

    emb = load(spark, sf_dir, "embeddings")
    idx = IvfPqIndex.fit(emb, n_centroids=4, m=8, ksub=16, seed=42)
    assert idx.pq.coarse is not None  # fit() residual-encodes by default
    path = str(tmp_path / "res")
    idx.build(emb, path)
    reloaded = IvfPqIndex.load(spark, path)
    assert reloaded.pq.coarse is not None
    # the residual space is the UNIT-normalized centroids (PqCodec's
    # space contract), reconstructed identically by load()
    from solr_map_reduce_spark.extensions.similarity import _unit_rows

    assert np.allclose(reloaded.pq.coarse, _unit_rows(idx.ivf.centroids))
    assert np.allclose(reloaded.pq.coarse, idx.pq.coarse)
    # a pre-r11 manifest (no residual flag) loads as a plain-v̂ codec
    import json
    mpath = f"{path}/{IvfPqIndex.MANIFEST}"
    m = json.loads(open(mpath).read())
    del m["residual"]
    open(mpath, "w").write(json.dumps(m))
    legacy = IvfPqIndex.load(spark, path)
    assert legacy.pq.coarse is None


def test_residual_codec_requires_bucket(spark, sf_dir):
    from solr_map_reduce_spark.extensions.similarity import IvfIndex, PqCodec

    emb = load(spark, sf_dir, "embeddings")
    ivf = IvfIndex.fit(emb, n_centroids=4, seed=42)
    codec = PqCodec.fit(emb, m=8, ksub=16, seed=42, coarse=ivf.centroids)
    with pytest.raises(ValueError, match="bucket_col"):
        codec.encode(emb)
    assigned = ivf.assign(emb)
    enc = codec.encode(assigned, bucket_col="bucket")
    with pytest.raises(ValueError, match="bucket_col"):
        codec.topk(enc, emb.first()["embedding"], k=5)


def test_residual_beats_plain_on_clustered_corpus(spark):
    # the point of residual encoding: on a clustered corpus (IVF's
    # target shape) quantizing v̂ − c_bucket spends the code budget on
    # the WITHIN-bucket structure — measurably better ADC recall than
    # quantizing v̂ at identical (m, ksub).  Deterministic fixture
    # (seeded numpy, seeded fits); the 200k-vector measurement is in
    # SCALING.md (plain 0.07 → residual 0.205 recall@10 at 20k,
    # m=8/ksub=256/nprobe=4).
    from solr_map_reduce_spark.extensions.similarity import (
        IvfIndex, IvfPqIndex, PqCodec,
    )

    rng = np.random.RandomState(11)
    ncl, dim, n = 8, 32, 2000
    centers = rng.randn(ncl, dim) * 3.0
    assign = rng.randint(0, ncl, size=n)
    X = centers[assign] + rng.randn(n, dim)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(x) for x in Xn[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).cache()
    df.count()
    ivf = IvfIndex.fit(df, n_centroids=ncl, seed=42)
    scores = {}
    for name, coarse in (("plain", None), ("residual", ivf.centroids)):
        pq = PqCodec.fit(df, m=8, ksub=64, seed=42, coarse=coarse)
        enc = pq.encode(
            ivf.assign(df), bucket_col="bucket" if coarse is not None else None
        ).select("vec_id", "bucket", "pq_code").cache()
        enc.count()
        hits = 0
        for qi in range(0, n, n // 10):
            q = Xn[qi]
            exact = set(np.argsort(-(Xn @ q))[:10].tolist())
            got = {
                r["vec_id"]
                for r in pq.topk(
                    enc, list(q), k=10,
                    bucket_col="bucket" if coarse is not None else None,
                ).collect()
            }
            hits += len(exact & got)
        enc.unpersist()
        scores[name] = hits
    df.unpersist()
    assert scores["residual"] > scores["plain"], scores


def test_residual_on_raw_corpus_stays_sane(spark):
    # the space contract: IvfPqIndex normalizes its coarse centroids
    # into the codec's unit space, so residual encoding on a RAW
    # (non-unit) corpus — where the IVF layout is fit on raw vectors —
    # must not collapse below the plain codec (a raw-space centroid
    # subtracted from a unit vector would leave ~||c||-sized residuals)
    from solr_map_reduce_spark.extensions.similarity import IvfPqIndex

    rng = np.random.RandomState(13)
    ncl, dim, n = 4, 32, 1200
    centers = rng.randn(ncl, dim) * 5.0
    X = centers[rng.randint(0, ncl, size=n)] + rng.randn(n, dim)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).cache()
    df.count()
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    idx = IvfPqIndex.fit(df, n_centroids=ncl, m=8, ksub=64, seed=42)
    assert idx.pq.coarse is not None
    # every stored coarse row is unit-norm (the contract)
    assert np.allclose(np.linalg.norm(idx.pq.coarse, axis=1), 1.0)

    from solr_map_reduce_spark.extensions.similarity import PqCodec

    def _hits(pq, with_bucket):
        enc = pq.encode(
            idx.ivf.assign(df),
            bucket_col="bucket" if with_bucket else None,
        ).select("vec_id", "bucket", "pq_code").cache()
        enc.count()
        hits = 0
        for qi in range(0, n, n // 8):
            q = Xn[qi]
            exact = set(np.argsort(-(Xn @ q))[:10].tolist())
            got = {r["vec_id"] for r in pq.topk(
                enc, list(q), k=10,
                bucket_col="bucket" if with_bucket else None,
            ).collect()}
            hits += len(exact & got)
        enc.unpersist()
        return hits

    plain = PqCodec.fit(df, m=8, ksub=64, seed=42)
    h_res = _hits(idx.pq, True)
    h_plain = _hits(plain, False)
    df.unpersist()
    # measured on this seeded fixture: plain 13/80, unit-residual 20/80,
    # raw-space residual (the pre-fix bug) 10/80 — the contract under
    # test is residual >= plain on a raw clustered corpus
    assert h_res >= h_plain, (h_res, h_plain)


def test_ivf_distinct_stream_tags_do_not_collide(spark, sf_dir, tmp_path):
    """Two ingestion streams (or one restarted with a fresh checkpoint)
    both start their Structured Streaming batch ids at 0 — the per-stream
    tag component must keep their sweeps apart, or stream B's batch 0
    deletes stream A's batch-0 vectors (the r11 review finding;
    stream_ivf_ingest now tags with <checkpoint-hash>-<batch id>)."""
    from solr_map_reduce_spark.extensions.similarity import IvfIndex

    emb = load(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 100)
    a = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 150))
    b = emb.filter((F.col("vec_id") >= 150) & (F.col("vec_id") < 200))
    ivf = IvfIndex.fit(base, n_centroids=4)
    path = str(tmp_path / "ivf")
    ivf.save(path, assigned=ivf.assign(base))
    ivf.add(a, path, batch_tag="streamA-0")
    ivf.add(b, path, batch_tag="streamB-0")  # same batch id, other stream
    stored = spark.read.parquet(path + "/vectors")
    assert stored.count() == 200  # stream A's batch-0 vectors survived
    # and a true replay of stream B's batch 0 still dedups itself
    ivf.add(b, path, batch_tag="streamB-0")
    assert spark.read.parquet(path + "/vectors").count() == 200
