"""Continuous rollup: incremental maintenance equals a batch re-aggregation."""

import pyspark.sql.functions as F
import pytest

from solr_map_reduce_spark.streaming.rollup import (
    merge_rollup,
    read_rollup,
    rollup_aggregate,
    stream_rollup,
)


def _batch_truth(events, dims):
    return (
        events.groupBy(F.window("ts", "1 hour").alias("_w"), *dims)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(F.col("_w.start").alias("window_start"), *dims,
                "cnt", "sum_value", "min_value", "max_value")
    )


def test_merge_partials_equals_batch(spark, sf_dir):
    from solr_map_reduce_spark.sources.readers import load_table

    events = load_table(spark, sf_dir, "events")
    # split into two "batches", roll up each, merge
    b1 = events.filter(F.col("event_id") % 2 == 0)
    b2 = events.filter(F.col("event_id") % 2 == 1)
    dims = ["event_type"]
    merged = merge_rollup(
        rollup_aggregate(b1, dims=dims), rollup_aggregate(b2, dims=dims), dims
    )
    truth = _batch_truth(events, dims)
    key = lambda df: sorted(
        (r["window_start"], r["event_type"], r["cnt"], round(r["sum_value"], 6),
         round(r["min_value"], 6), round(r["max_value"], 6))
        for r in df.collect()
    )
    assert key(merged) == key(truth)


def test_stream_rollup_incremental(spark, sf_dir, tmp_path):
    """Two files arriving over time -> rollup equals full-batch truth."""
    from solr_map_reduce_spark.sources.readers import load_table

    events = load_table(spark, sf_dir, "events")
    src = tmp_path / "events_in"
    src.mkdir()
    rollup = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    dims = ["event_type"]

    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        str(src / "f0")
    )
    q = stream_rollup(spark, str(src / "*"), events.schema, rollup, ckpt, dims=dims)
    q.awaitTermination(120)

    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        str(src / "f1")
    )
    q = stream_rollup(spark, str(src / "*"), events.schema, rollup, ckpt, dims=dims)
    q.awaitTermination(120)

    got = read_rollup(spark, rollup)
    truth = _batch_truth(events, dims)
    assert got.count() == truth.count()
    total_got = got.agg(F.sum("cnt")).first()[0]
    assert total_got == events.count()
    # spot-check one bucket exactly
    g = got.orderBy("window_start", "event_type").first()
    t = truth.orderBy("window_start", "event_type").first()
    assert (g["window_start"], g["event_type"], g["cnt"]) == (
        t["window_start"], t["event_type"], t["cnt"])
    assert g["sum_value"] == pytest.approx(t["sum_value"])
    assert g["avg_value"] == pytest.approx(t["sum_value"] / t["cnt"])
