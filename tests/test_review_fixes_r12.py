"""Regression tests for the r12 adversarial review of the ANN serving
tier (MIPS routing, adaptive nprobe, score finiteness).

The headline finding: Spark sorts NaN as the GREATEST double, so a
zero-norm vector (cosine 0/0 → NaN) or a NaN/Inf component survived
into every ranked page — and TOPPED it — on the exact scan, the
routed probe, the alias merge, and the DSL path alike.  Lucene
rejects non-finite vectors at index time; the serving-side contract
here is exclusion (same as NULL vectors).  Reference parity: Lucene
KnnFloatVectorField/VectorUtil reject NaN/Inf at index time."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from solr_map_reduce_spark.index_reader import SearchIndex
from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
from solr_map_reduce_spark.schema import Field, IndexSchema

N, DIM, NC = 120, 8, 4

rng = np.random.RandomState(31)
VECS = rng.randn(N, DIM).astype(np.float64)


def _lit(q):
    return "[" + ", ".join(f"{x:.8f}" for x in q) + "]"


def _build(spark, out, extra_rows=()):
    schema = IndexSchema(
        fields=(Field("vec_id", "long", required=True),
                Field("embedding", "array<double>")),
        unique_key="vec_id",
    )
    rows = [(i, [float(x) for x in VECS[i]]) for i in range(N)]
    rows += list(extra_rows)
    IndexJob(IndexJobConfig(schema=schema, shards=2, dedup="none")).build(
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        out)
    return SearchIndex.open(spark, out)


def _exact_cos_ids(q, k):
    cos = (VECS @ q) / (np.linalg.norm(VECS, axis=1) * np.linalg.norm(q))
    return [i for i in sorted(range(N), key=lambda i: (-cos[i], i))[:k]]


class TestFiniteScores:
    def test_zero_vector_never_tops_exact_page(self, spark, tmp_path):
        # a zero-norm vector scores cosine 0/0 = NaN; NaN sorts
        # GREATEST under desc, so it used to TOP every exact page
        idx = _build(spark, str(tmp_path / "z"),
                     extra_rows=[(999, [0.0] * DIM)])
        q = VECS[3]
        got = [r["vec_id"] for r in idx.query(
            f"{{!knn f=embedding topK=5 exact=true}}{_lit(q)}"
        ).collect()]
        assert 999 not in got
        assert got == _exact_cos_ids(q, 5)

    def test_nan_vector_excluded_from_routed_page(self, spark, tmp_path):
        idx = _build(spark, str(tmp_path / "n"),
                     extra_rows=[(998, [float("nan")] * DIM)])
        idx.build_ann("embedding", kind="ivf", n_centroids=NC, nprobe=NC)
        q = VECS[7]
        got = [r["vec_id"] for r in idx.query(
            f"{{!knn f=embedding topK=5 nprobe={NC}}}{_lit(q)}"
        ).collect()]
        assert 998 not in got
        assert got == _exact_cos_ids(q, 5)

    def test_nan_vector_excluded_from_routed_dot_page(self, spark, tmp_path):
        idx = _build(spark, str(tmp_path / "nd"),
                     extra_rows=[(997, [float("inf")] * DIM)])
        idx.build_ann("embedding", kind="ivf", n_centroids=NC, nprobe=NC)
        q = VECS[11]
        dots = VECS @ q
        want = [i for i in sorted(range(N), key=lambda i: (-dots[i], i))[:5]]
        got = [r["vec_id"] for r in idx.query(
            f"{{!knn f=embedding topK=5 similarity=dot nprobe={NC}}}{_lit(q)}"
        ).collect()]
        assert 997 not in got
        assert got == want

    def test_dsl_knn_excludes_zero_vector(self, spark, tmp_path):
        idx = _build(spark, str(tmp_path / "d"),
                     extra_rows=[(996, [0.0] * DIM)])
        got = [r["vec_id"] for r in idx.knn(VECS[2], k=5).collect()]
        assert 996 not in got
        assert got == _exact_cos_ids(VECS[2], 5)

    def test_upsert_nan_vector_keeps_mips_stats_finite(
        self, spark, tmp_path
    ):
        import json
        idx = _build(spark, str(tmp_path / "s"))
        side = idx.build_ann("embedding", kind="ivf", n_centroids=NC,
                             nprobe=NC)
        job = IndexJob(IndexJobConfig(
            schema=IndexSchema(
                fields=(Field("vec_id", "long", required=True),
                        Field("embedding", "array<double>")),
                unique_key="vec_id",
            ), shards=2, dedup="retain_most_recent",
        ))
        batch = spark.createDataFrame(
            [(995, [float("nan")] * DIM)],
            "vec_id long, embedding array<double>",
        )
        job.merge_into(batch, idx.path)
        meta = json.loads(open(os.path.join(side, "_ANN_META.json")).read())
        dr = meta["dot_route"]
        # one poisoned vector must not NaN the SUM stats (it would
        # silently degrade EVERY later MIPS probe ranking)
        assert all(np.isfinite(x) for x in dr["sum_nrm2"])
        assert np.isfinite(dr["max_norm"])
        # and dot still serves exact-correct at full probe
        q = VECS[5]
        dots = VECS @ q
        want = [i for i in sorted(range(N), key=lambda i: (-dots[i], i))[:5]]
        got = [r["vec_id"] for r in idx.query(
            f"{{!knn f=embedding topK=5 similarity=dot nprobe={NC}}}{_lit(q)}"
        ).collect()]
        assert got == want


class TestNonFiniteQueryVectors:
    def test_qparser_rejects_nan_query(self, spark, tmp_path):
        from solr_map_reduce_spark.extensions.search import QuerySyntaxError
        idx = _build(spark, str(tmp_path / "q"))
        # float('nan') PARSES — the numeric-literal check alone let a
        # NaN query through to NaN every score silently
        with pytest.raises(QuerySyntaxError, match="non-finite"):
            idx.query("{!knn f=embedding topK=5}[nan, 1, 1, 1, 1, 1, 1, 1]")
        with pytest.raises(QuerySyntaxError, match="non-finite"):
            idx.query("{!knn f=embedding topK=5}[inf, 1, 1, 1, 1, 1, 1, 1]")

    def test_dsl_knn_rejects_nan_query(self, spark, tmp_path):
        idx = _build(spark, str(tmp_path / "q2"))
        with pytest.raises(ValueError, match="non-finite"):
            idx.knn([float("nan")] * DIM, k=3)


class TestMipsPreFilterComposition:
    """similarity=dot composes with preFilter= on the routed MIPS
    path: the key-set semi-join applies BEFORE the top-k, and the
    widening loop still guarantees the page when the filter thins the
    probed buckets."""

    def _nonunit(self, spark, out):
        schema = IndexSchema(
            fields=(Field("vec_id", "long", required=True),
                    Field("grp", "long"),
                    Field("embedding", "array<double>")),
            unique_key="vec_id",
        )
        rows = [(i, i % 10, [float(x) for x in VECS[i]]) for i in range(N)]
        IndexJob(IndexJobConfig(schema=schema, shards=2, dedup="none")).build(
            spark.createDataFrame(
                rows, "vec_id long, grp long, embedding array<double>"
            ), out)
        return SearchIndex.open(spark, out)

    def test_dot_prefilter_full_probe_equals_exact(self, spark, tmp_path):
        idx = self._nonunit(spark, str(tmp_path / "pf"))
        idx.build_ann("embedding", kind="ivf", n_centroids=NC, nprobe=NC)
        q = VECS[9]
        dots = VECS @ q
        pool = [i for i in range(N) if i % 10 == 3]
        want = sorted(pool, key=lambda i: (-dots[i], i))[:5]
        got = [r["vec_id"] for r in idx.query(
            f"{{!knn f=embedding topK=5 similarity=dot nprobe={NC} "
            f"preFilter='grp:3'}}{_lit(q)}"
        ).collect()]
        assert got == want

    def test_dot_prefilter_underfill_widens(self, spark, tmp_path):
        idx = self._nonunit(spark, str(tmp_path / "pw"))
        idx.build_ann("embedding", kind="ivf", n_centroids=NC, nprobe=NC)
        q = VECS[13]
        dots = VECS @ q
        # a 4-key filter: at nprobe=1 the probed bucket almost surely
        # lacks most of them — the page must widen and return ALL 4
        keys = [2, 31, 67, 103]
        want = sorted(keys, key=lambda i: (-dots[i], i))
        got = [r["vec_id"] for r in idx.query(
            "{!knn f=embedding topK=4 similarity=dot nprobe=1 "
            "preFilter='vec_id:(" + " OR ".join(map(str, keys)) + ")'}"
            + _lit(q)
        ).collect()]
        assert got == want


class TestOperatorReviewFixes:
    """r12 review pass over operators/ and functions/ (surfaces last
    reviewed before r8)."""

    def test_asof_attaches_the_latest_row_atomically(self, spark):
        # a NULL payload cell in the LATEST right row must stay NULL —
        # per-column last(ignorenulls) back-filled it from an OLDER
        # right row, a frankenstein match no real as-of join produces
        from solr_map_reduce_spark.operators.asof import asof_join
        left = spark.createDataFrame(
            [("k", 6)], "k string, ts long"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        right = spark.createDataFrame(
            [("k", 1, 1, 2), ("k", 5, 9, None)],
            "k string, ts long, a long, b long",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = asof_join(left, right, on="k").collect()[0]
        assert got["a_r"] == 9
        assert got["b_r"] is None  # NOT 2 (the older row's value)

    def test_asof_no_match_and_tolerance(self, spark):
        from solr_map_reduce_spark.operators.asof import asof_join
        left = spark.createDataFrame(
            [("k", 100), ("q", 5)], "k string, ts long"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        right = spark.createDataFrame(
            [("k", 10, 7)], "k string, ts long, a long"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        rows = {r["k"]: r for r in asof_join(
            left, right, on="k", tolerance_seconds=30
        ).collect()}
        assert rows["q"]["a_r"] is None  # no right row at all
        assert rows["k"]["a_r"] is None  # match exists but is stale (90s)
        rows2 = {r["k"]: r for r in asof_join(
            left, right, on="k", tolerance_seconds=200
        ).collect()}
        assert rows2["k"]["a_r"] == 7  # inside tolerance

    def test_salted_join_refuses_small_side_outer(self, spark):
        # the small side is replicated once per salt: a right/full join
        # would emit each unmatched small row `buckets` times
        from solr_map_reduce_spark.operators.skew import salted_join
        df = spark.createDataFrame([("k", 1)], "k string, v long")
        with pytest.raises(ValueError, match="salt the other side"):
            salted_join(df, df, on="k", how="right")
        with pytest.raises(ValueError, match="salt the other side"):
            salted_join(df, df, on="k", how="full")
        # left stays allowed (each big row carries exactly one salt)
        assert salted_join(df, df, on="k", how="left").count() == 1

    def test_range_join_refuses_outer(self, spark):
        from solr_map_reduce_spark.operators.range_join import range_join
        df = spark.createDataFrame([("k", 1)], "k string, ts long")
        with pytest.raises(ValueError, match="inner"):
            range_join(df, df, ts="ts", start="ts", end="ts", how="left")

    def test_chunk_documents_rejects_negative_overlap(self, spark):
        from solr_map_reduce_spark.extensions.text_analysis import (
            chunk_documents,
        )
        df = spark.createDataFrame([("a", "x y z")], "doc_id string, text string")
        with pytest.raises(ValueError, match=">= 0"):
            chunk_documents(df, chunk_tokens=4, overlap=-2)

    def test_unpack_corrupt_zip_passes_through(self, spark):
        # a truncated zip raised BadZipFile UNCAUGHT (task death); a tar
        # failing mid-read emitted partial entries PLUS the passthrough
        # row — both must fall back to one passthrough record atomically
        import io
        import zipfile
        from solr_map_reduce_spark.sources.binary import unpack
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("a.txt", b"hello")
            zf.writestr("b.txt", b"world")
        good = buf.getvalue()
        corrupt = good[: len(good) // 2]  # keeps the PK magic, breaks the dir
        df = spark.createDataFrame(
            [("good", bytearray(good)), ("bad", bytearray(corrupt))],
            "path string, content binary",
        )
        rows = unpack(df, id_cols=("path",)).collect()
        by_path = {}
        for r in rows:
            by_path.setdefault(r["path"], []).append(r)
        assert sorted(e["entry_name"] for e in by_path["good"]) == [
            "a.txt", "b.txt"
        ]
        assert len(by_path["bad"]) == 1
        assert by_path["bad"][0]["entry_name"] is None
        assert bytes(by_path["bad"][0]["entry_content"]) == corrupt

    def test_stopword_removal_preserves_duplicates(self, spark):
        # array_except DEDUPLICATED the survivors ("hello world hello"
        # -> [hello, world]), corrupting every frequency consumer
        from solr_map_reduce_spark.functions.analyzers import (
            tokenize_text_general,
        )
        df = spark.createDataFrame(
            [("the hello world hello",)], "t string"
        )
        got = df.select(
            tokenize_text_general(F.col("t"), remove_stopwords=True)
            .alias("toks")
        ).first()["toks"]
        assert got == ["hello", "world", "hello"]


def test_ltr_nan_scores_rank_last(spark):
    # a sqrt(-x)-style feature yields NaN, which is NOT NULL (the
    # feature default coalesce passes it through) and sorts GREATEST
    # under desc — one bad feature value topped every rescored page
    from solr_map_reduce_spark.extensions.ltr import (
        Feature, LinearModel, ltr_rescore,
    )
    pool = spark.createDataFrame(
        [("a", 4.0), ("b", 9.0), ("c", -1.0)], "id string, x double"
    )
    got = ltr_rescore(
        pool,
        LinearModel({"f": 1.0}),
        {"f": Feature("sqrt(x)")},
        tiebreak="id",
    ).collect()
    assert [r["id"] for r in got] == ["b", "a", "c"]  # NaN last, not first
    import math
    assert math.isnan(got[-1]["ltr_score"])  # raw score still observable


def test_fit_sample_is_run_deterministic(spark):
    # sample(seed).limit(n) took whichever partitions returned first, so
    # two identical fits produced different centroids despite the seed;
    # the sorted bounded sample makes refits bit-identical
    from solr_map_reduce_spark.extensions.similarity import IvfIndex
    rows = [(i, [float(x) for x in VECS[i % N]]) for i in range(N)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(8)
    c1 = IvfIndex.fit(df, n_centroids=NC).centroids
    c2 = IvfIndex.fit(df, n_centroids=NC).centroids
    assert np.array_equal(c1, c2)


def test_hocon_duplicate_object_keys_merge():
    # HOCON spec: duplicate keys with object values MERGE field-by-field
    # (later wins per leaf); plain replacement silently dropped every
    # earlier field of a re-opened block
    from solr_map_reduce_spark.plans.hocon import parse_hocon

    cfg = parse_hocon(
        """
        solr {
          host : "a"
          port : 8983
        }
        solr {
          port : 9999
          zk {
            quorum : "q1"
          }
        }
        solr {
          zk {
            timeout : 5
          }
        }
        scalar : 1
        scalar : 2
        """
    )
    assert cfg["solr"] == {
        "host": "a", "port": 9999, "zk": {"quorum": "q1", "timeout": 5},
    }
    assert cfg["scalar"] == 2  # non-object duplicates: last wins


def test_local_write_text_is_atomic_on_crash(tmp_path, monkeypatch):
    # markers/meta files are the engine's commit points: a crash during
    # write_text must leave the OLD complete text, never a torn file
    # that crashes readers with a JSON error instead of their designed
    # marker-absent fallback
    from solr_map_reduce_spark import fs as fsmod

    f = fsmod.LocalFS()
    p = str(tmp_path / "marker.json")
    f.write_text(p, '{"state": "old"}')

    def boom(*_a, **_k):
        raise OSError("simulated crash at the replace boundary")

    monkeypatch.setattr(fsmod.os, "replace", boom)
    with pytest.raises(OSError):
        f.write_text(p, '{"state": "new"}')
    with open(p, encoding="utf-8") as fh:
        assert fh.read() == '{"state": "old"}'


def test_probe_topk_mips_without_stats_is_loud(spark, tmp_path):
    # a direct probe_topk(metric='dot') call on a legacy sidecar whose
    # meta lacks the MIPS stats must be a clean error, not a KeyError
    import json
    from solr_map_reduce_spark.extensions import ann_sidecar
    from solr_map_reduce_spark.extensions.similarity import IvfIndex

    idx = _build(spark, str(tmp_path / "p"))
    side = idx.build_ann("embedding", kind="ivf", n_centroids=NC, nprobe=NC)
    mpath = os.path.join(side, "_ANN_META.json")
    meta = json.loads(open(mpath).read())
    del meta["dot_route"]
    index = IvfIndex.load(spark, side)
    with pytest.raises(ValueError, match="dot_route"):
        ann_sidecar.probe_topk(
            spark, side, meta, index, list(VECS[0]), k=3, nprobe=1,
            metric="dot",
        )
