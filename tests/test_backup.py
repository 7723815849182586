"""backup()/restore(): consistent point-in-time artifact copies under
the mutation lock, atomic promote-back, backup left intact."""

import json
import os

import pyspark.sql.functions as F
import pytest

from solr_map_reduce_spark.indexing import (
    BACKUP_META,
    IndexJob,
    IndexJobConfig,
    MUTATION_LOCK,
    backup,
    read_index,
    restore,
)
from solr_map_reduce_spark.index_reader import SearchIndex
from solr_map_reduce_spark.schema import Field, IndexSchema


SCHEMA = IndexSchema(
    fields=(Field("id", "string", required=True),
            Field("text", "text_general"),
            Field("rank", "long")),
    unique_key="id",
)


def _build(spark, path, **cfg):
    job = IndexJob(IndexJobConfig(schema=SCHEMA, shards=2, dedup="none",
                                  term_blooms=True, search_stats=True, **cfg))
    df = spark.createDataFrame(
        [(str(i), f"doc number {i} spark", i) for i in range(30)],
        "id string, text string, rank long",
    )
    job.build(df, path)
    return job


class TestBackupRestore:
    def test_roundtrip_with_sidecars(self, spark, tmp_path):
        path = str(tmp_path / "live")
        dest = str(tmp_path / "bak")
        job = _build(spark, path)
        meta = backup(path, dest)
        assert meta["files"] > 0 and meta["generation"] == 1
        assert os.path.exists(os.path.join(dest, BACKUP_META))
        assert not os.path.exists(os.path.join(dest, MUTATION_LOCK))
        # the backup is itself a readable artifact (sidecars included)
        bidx = SearchIndex.open(spark, dest)
        assert bidx.count() == 30
        assert bidx.query("spark").count() == 30
        # mutate live, then restore: live returns to the snapshot
        job.merge_into(spark.createDataFrame(
            [("999", "added later", 999)],
            "id string, text string, rank long"), path)
        assert read_index(spark, path).count() == 31
        rmeta = restore(dest, path)
        assert rmeta["generation"] == 1
        assert read_index(spark, path).count() == 30
        # the backup survives the restore, byte-usable again
        assert os.path.exists(os.path.join(dest, BACKUP_META))
        assert SearchIndex.open(spark, dest).count() == 30
        # the replaced live artifact is dropped on success (publish's
        # contract — ._prev survives only a mid-swap crash)
        assert not os.path.exists(path + "._prev")

    def test_backup_refuses_existing_dest_and_non_artifact(self, spark, tmp_path):
        path = str(tmp_path / "live2")
        _build(spark, path)
        dest = str(tmp_path / "bak2")
        os.makedirs(dest)
        with pytest.raises(ValueError, match="already exists"):
            backup(path, dest)
        with pytest.raises(ValueError, match="not an index artifact"):
            backup(str(tmp_path / "nothing"), str(tmp_path / "bak3"))

    def test_backup_respects_mutation_lock(self, spark, tmp_path):
        path = str(tmp_path / "live3")
        _build(spark, path)
        # a held lock (crashed mutator) must block the backup loudly
        with open(os.path.join(path, MUTATION_LOCK), "w") as f:
            json.dump({"op": "merge_into", "pid": 0, "token": "x"}, f)
        with pytest.raises(RuntimeError, match="lock"):
            backup(path, str(tmp_path / "bak4"))

    def test_restore_refuses_incomplete_backup(self, spark, tmp_path):
        half = str(tmp_path / "half")
        os.makedirs(half)
        with pytest.raises(ValueError, match="not a completed backup"):
            restore(half, str(tmp_path / "live4"))


class TestCrossFilesystemGuards:
    def test_backup_and_restore_refuse_cross_scheme(self, spark, tmp_path):
        path = str(tmp_path / "live5")
        _build(spark, path)
        with pytest.raises(ValueError, match="same filesystem kind"):
            backup(path, "hdfs://nowhere/bak", spark)
        dest = str(tmp_path / "bak5")
        backup(path, dest)
        with pytest.raises(ValueError, match="same filesystem kind"):
            restore(dest, "hdfs://nowhere/live", spark)
