"""Continuous time-bucket rollup — the hypertable/continuous-aggregate
pattern (task brief's "hypertable rollup"): maintain a materialized
per-(bucket, dims) aggregate table incrementally as events stream in, so
dashboard-style queries read the small rollup instead of the raw events.

Aggregates maintained per bucket: count, sum, min, max (algebraic — merge =
re-aggregate partials).  ``avg`` derives from sum/count at read time.

Incremental maintenance per micro-batch (``foreachBatch``):
  1. aggregate the batch to per-(bucket, dims) partials — map-side combine
     shrinks the batch to its distinct buckets first;
  2. read the current rollup, union, re-aggregate (merging partials is the
     same aggregation), atomic-swap rewrite.
At 100 TB the rewrite touches a table whose size is O(buckets × dims) —
orders of magnitude smaller than the events — and can be partitioned by
bucket date so only recent partitions rewrite (late data beyond the
watermark is dropped upstream).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from solr_map_reduce_spark.fs import get_fs
from solr_map_reduce_spark.functions.timestamps import ensure_instant

ROLLUP_KEYS = ["window_start"]


def rollup_aggregate(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window_duration: str = "1 hour",
    dims: list[str] | None = None,
) -> DataFrame:
    """One batch's partial rollup: per (window_start, dims) algebraic aggs."""
    dims = dims or []
    return (
        df.groupBy(F.window(ts_col, window_duration).alias("_w"), *dims)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(F.col("_w.start").alias("window_start"), *dims,
                "cnt", "sum_value", "min_value", "max_value")
    )


def merge_rollup(current: DataFrame | None, partial: DataFrame,
                 dims: list[str] | None = None) -> DataFrame:
    """Merge partial aggregates into the rollup (same-shape re-aggregation)."""
    dims = dims or []
    unioned = partial if current is None else current.unionByName(partial)
    return unioned.groupBy("window_start", *dims).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def stream_rollup(
    spark: SparkSession,
    input_path: str,
    input_schema,
    rollup_path: str,
    checkpoint: str,
    ts_col: str = "ts",
    value_col: str = "value",
    window_duration: str = "1 hour",
    dims: list[str] | None = None,
    watermark: str = "2 hours",
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously maintain the rollup from files arriving under
    ``input_path`` (parquet)."""
    dims = dims or []
    stream = spark.readStream.schema(input_schema).parquet(input_path)
    stream = ensure_instant(stream, ts_col)
    stream = stream.withWatermark(ts_col, watermark)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        fs = get_fs(rollup_path, batch_df.sparkSession)
        partial = rollup_aggregate(batch_df, ts_col, value_col, window_duration, dims)
        current = None
        if fs.exists(rollup_path):
            current = batch_df.sparkSession.read.parquet(rollup_path)
        merged = merge_rollup(current, partial, dims)
        tmp = rollup_path.rstrip("/") + f"._rollup_tmp_{batch_id}"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        if fs.exists(rollup_path):
            fs.delete(rollup_path)
        fs.rename(tmp, rollup_path)

    writer = stream.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    """Open the rollup with derived columns (avg from sum/cnt)."""
    df = spark.read.parquet(rollup_path)
    return df.withColumn("avg_value", F.col("sum_value") / F.col("cnt"))
