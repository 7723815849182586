"""Bucketed-table support — co-located joins without a shuffle (SURVEY §4;
the "pre-partitioning / bucketing" scale strategy).

Two fact tables bucketed by the same key into the same bucket count join
WITHOUT any Exchange: each task reads matching bucket files from both sides.
At 100 TB this removes the dominant cost of repeated fact-fact joins — the
shuffle — in exchange for one bucketed write each.

Bucketing needs the session catalog (``saveAsTable``): Spark tracks bucket
metadata in the table definition, not in the files.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.mode(mode).format(format).bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str],
    how: str = "inner", strategy_hint: str | None = None,
) -> DataFrame:
    """Join two same-bucketed tables — Catalyst plans a SortMergeJoin with NO
    Exchange on either side when bucket specs line up.

    At small scale the planner may prefer a broadcast join (bucketing is for
    large-large joins); pass ``strategy_hint="merge"`` to force the
    exchange-free bucketed path."""
    lt = spark.table(left_table)
    if strategy_hint:
        lt = lt.hint(strategy_hint)
    rt = spark.table(right_table)
    return lt.join(rt, on=on, how=how)
