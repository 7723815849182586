"""A6 file-metadata enrichment: the file_* header fields
(mr/HdfsFileFieldNames.java:25-40; MorphlineMapRunner.getRecord)."""

import pyspark.sql.functions as F

from solr_map_reduce_spark.operators.metadata import enrich_file_metadata


def test_enrich_file_metadata_core_fields(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "doc1.txt").write_bytes(b"hello metadata")
    df = spark.read.format("binaryFile").load(str(src)).select("*", "_metadata")
    out = enrich_file_metadata(df)
    row = out.first()
    assert row["file_name"] == "doc1.txt"
    assert row["file_length"] == 14
    assert row["file_path"].endswith("doc1.txt")
    assert row["file_scheme"] == "file"
    assert row["file_download_url"] == row["file_upload_url"] == row["base_id"]
    assert row["file_last_modified"] > 1_500_000_000_000  # epoch millis
    assert row["file_port"] == -1


def test_enrich_file_metadata_posix(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.txt").write_bytes(b"x")
    df = spark.read.format("binaryFile").load(str(src)).select("*", "_metadata")
    out = enrich_file_metadata(df, with_posix=True)
    row = out.first()
    # all 15 reference header fields present
    for f in [
        "file_upload_url", "file_download_url", "file_scheme", "file_host",
        "file_port", "file_path", "file_name", "file_length",
        "file_last_modified", "file_owner", "file_group",
        "file_permissions_user", "file_permissions_group",
        "file_permissions_other", "file_permissions_stickybit",
    ]:
        assert f in out.columns, f
    assert row["file_owner"] is not None
    assert len(row["file_permissions_user"]) == 3  # e.g. 'rw-'
    assert row["file_permissions_stickybit"] is False


def test_enriched_metadata_feeds_dedup_order(spark, tmp_path):
    """file_last_modified works as the default retain-most-recent order field
    (the reference's default, RetainMostRecentUpdateConflictResolver:44-48)."""
    from solr_map_reduce_spark.operators.dedup import retain_most_recent

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.txt").write_bytes(b"v1")
    df = spark.read.format("binaryFile").load(str(src)).select("*", "_metadata")
    enriched = enrich_file_metadata(df).withColumn("id", F.lit("k"))
    doubled = enriched.unionByName(
        enriched.withColumn("file_last_modified", F.col("file_last_modified") + 1000)
    )
    kept = retain_most_recent(doubled.select("id", "file_last_modified"), "id",
                              "file_last_modified")
    assert kept.count() == 1
    assert kept.first()["file_last_modified"] == enriched.first()["file_last_modified"] + 1000
