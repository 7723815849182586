"""Doc versions (_version_ = writing generation) and the Topic
checkpointed-pull consumer (Solr TopicStream analog)."""

import pyspark.sql.functions as F
import pytest

from solr_map_reduce_spark.index_reader import SearchIndex, Topic
from solr_map_reduce_spark.indexing import (
    IndexJob,
    IndexJobConfig,
    compact,
    read_index,
)
from solr_map_reduce_spark.schema import Field, IndexSchema


SCHEMA = IndexSchema(
    fields=(Field("id", "string", required=True),
            Field("text", "text_general"),
            Field("rank", "long")),
    unique_key="id",
)


def _job(**kw):
    return IndexJob(IndexJobConfig(schema=SCHEMA, shards=2, dedup="none",
                                   doc_versions=True, **kw))


def _versions(spark, path):
    return {r["id"]: r["_version_"]
            for r in read_index(spark, path).collect()}


class TestDocVersions:
    def test_build_stamps_generation_one(self, spark, tmp_path):
        path = str(tmp_path / "v")
        _job().build(spark.createDataFrame(
            [("1", "alpha", 1), ("2", "beta", 2)],
            "id string, text string, rank long"), path)
        assert _versions(spark, path) == {"1": 1, "2": 1}

    def test_merge_stamps_only_the_batch(self, spark, tmp_path):
        path = str(tmp_path / "vm")
        job = _job()
        job.build(spark.createDataFrame(
            [("1", "alpha", 1), ("2", "beta", 2)],
            "id string, text string, rank long"), path)
        # replace doc 2, add doc 3: both take gen 2; doc 1 keeps gen 1
        job.merge_into(spark.createDataFrame(
            [("2", "beta prime", 20), ("3", "gamma", 3)],
            "id string, text string, rank long"), path)
        assert _versions(spark, path) == {"1": 1, "2": 2, "3": 2}

    def test_update_bumps_matched_and_inserts(self, spark, tmp_path):
        path = str(tmp_path / "vu")
        job = _job()
        job.build(spark.createDataFrame(
            [("1", "alpha", 1), ("2", "beta", 2)],
            "id string, text string, rank long"), path)
        job.update_fields(
            spark.createDataFrame([("1", 100), ("9", 900)],
                                  "id string, rank long"),
            path, missing="insert",
        )
        got = _versions(spark, path)
        assert got["1"] == 2 and got["9"] == 2 and got["2"] == 1

    def test_compact_preserves_versions(self, spark, tmp_path):
        path = str(tmp_path / "vc")
        job = _job(micro_shards=4)
        job.build(spark.createDataFrame(
            [(str(i), f"doc {i}", i) for i in range(20)],
            "id string, text string, rank long"), path)
        job.merge_into(spark.createDataFrame(
            [("5", "five prime", 50)], "id string, text string, rank long"),
            path)
        before = _versions(spark, path)
        compact(spark, path, max_segments=1)
        assert _versions(spark, path) == before  # rewrite, no re-stamp


class TestTopic:
    def test_pull_commit_cycle(self, spark, tmp_path):
        path = str(tmp_path / "t")
        ckpt = str(tmp_path / "ckpt.json")
        job = _job()
        job.build(spark.createDataFrame(
            [("1", "spark alpha", 1), ("2", "other beta", 2)],
            "id string, text string, rank long"), path)
        topic = Topic(spark, path, ckpt)
        batch, wm = topic.pull()
        assert sorted(r["id"] for r in batch.collect()) == ["1", "2"]
        topic.commit(wm)
        # nothing new: empty pull
        batch2, wm2 = topic.pull()
        assert batch2.count() == 0 and wm2 == wm
        # merge adds/replaces: only those re-deliver
        job.merge_into(spark.createDataFrame(
            [("2", "other beta prime", 20), ("3", "spark gamma", 3)],
            "id string, text string, rank long"), path)
        batch3, wm3 = topic.pull()
        assert sorted(r["id"] for r in batch3.collect()) == ["2", "3"]
        assert wm3 > wm
        # uncommitted crash: the SAME batch re-delivers (at-least-once)
        batch4, _ = topic.pull()
        assert sorted(r["id"] for r in batch4.collect()) == ["2", "3"]
        topic.commit(wm3)
        assert topic.pull()[0].count() == 0

    def test_query_scoped_topic(self, spark, tmp_path):
        path = str(tmp_path / "tq")
        ckpt = str(tmp_path / "ckpt2.json")
        job = _job()
        job.build(spark.createDataFrame(
            [("1", "spark alpha", 1), ("2", "other beta", 2)],
            "id string, text string, rank long"), path)
        topic = Topic(spark, path, ckpt, q="spark")
        batch, wm = topic.pull()
        assert [r["id"] for r in batch.collect()] == ["1"]
        topic.commit(wm)
        job.merge_into(spark.createDataFrame(
            [("3", "spark gamma", 3), ("4", "noise", 4)],
            "id string, text string, rank long"), path)
        batch2, _ = topic.pull()
        assert [r["id"] for r in batch2.collect()] == ["3"]

    def test_unversioned_artifact_is_loud(self, spark, tmp_path):
        path = str(tmp_path / "tu")
        IndexJob(IndexJobConfig(schema=SCHEMA, shards=1, dedup="none")).build(
            spark.createDataFrame([("1", "x", 1)],
                                  "id string, text string, rank long"), path)
        with pytest.raises(ValueError, match="doc_versions=True"):
            Topic(spark, path, str(tmp_path / "c.json")).pull()[0].count()


class TestVersionRaceGuard:
    def test_stale_stamp_aborts_merge(self, spark, tmp_path, monkeypatch):
        """A mutation that commits between our version stamp and our lock
        must abort the merge loudly (writing would strand the batch
        below Topic checkpoints)."""
        path = str(tmp_path / "race")
        job = _job()
        job.build(spark.createDataFrame(
            [("1", "alpha", 1)], "id string, text string, rank long"), path)
        real = IndexJob._next_generation
        calls = {"n": 0}

        def racy(self, p, mode="append"):
            calls["n"] += 1
            v = real(self, p, mode)
            # the SECOND call happens under the lock: pretend another
            # mutation committed in between
            return v + 1 if calls["n"] > 1 else v

        monkeypatch.setattr(IndexJob, "_next_generation", racy)
        with pytest.raises(RuntimeError, match="concurrent mutation"):
            job.merge_into(spark.createDataFrame(
                [("2", "beta", 2)], "id string, text string, rank long"),
                path)

    def test_unreadable_manifest_is_loud(self, spark, tmp_path):
        """_next_generation must RAISE on a torn manifest — falling back
        to generation 1 would stamp docs below existing checkpoints."""
        path = str(tmp_path / "torn")
        job = _job()
        job.build(spark.createDataFrame(
            [("1", "alpha", 1)], "id string, text string, rank long"), path)
        import os
        with open(os.path.join(path, "_INDEX_MANIFEST.json"), "w") as f:
            f.write("{torn")
        with pytest.raises(Exception):
            job._next_generation(path)
