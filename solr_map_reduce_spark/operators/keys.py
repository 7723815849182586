"""Unique-key operators (SURVEY §2 A7, §2 B3).

- ``require_unique_key`` — the mapper-side contract that every document carries
  a non-null unique key (mr/morphline/MorphlineMapper.java:118-146 throws if
  the schema's uniqueKey is missing).
- ``generate_sequence_key`` — synthesizes ``"{baseId}#{n}"`` when the key is
  absent, with ``n`` a 0-based per-session (= per input file) record counter
  (ml/GenerateSolrSequenceKeyBuilder.java:99-134: ``baseId + "#" + num``,
  counter reset on START_SESSION; ``preserveExisting`` defaults true).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def require_unique_key(df: DataFrame, key: str = "id") -> DataFrame:
    """Plant a lazy null-check on the unique key: any null key fails the job
    at action time, mirroring the mapper's throw."""
    guard = F.when(
        F.col(key).isNull(),
        F.raise_error(F.lit(f"Missing unique key field: {key}")),
    ).otherwise(F.col(key))
    return df.withColumn(key, guard)


def generate_sequence_key(
    df: DataFrame,
    base_id_col: str,
    key: str = "id",
    session_col: str | None = None,
    order_col: str | None = None,
    preserve_existing: bool = True,
) -> DataFrame:
    """Synthesize ``base#counter`` unique keys.

    ``session_col`` is the per-file/session grouping (the reference resets the
    counter per input file); ``order_col`` fixes the within-session numbering
    deterministically (the reference relies on stream order, which Spark does
    not guarantee — an explicit ordering keeps output stable across runs and
    engines).

    Scale: a window ``row_number`` partitioned by session — sessions are
    files, so partitions are bounded and the sort is per-file, not global.
    """
    session = F.col(session_col) if session_col else F.col(base_id_col)
    order = F.col(order_col) if order_col else F.monotonically_increasing_id()
    w = Window.partitionBy(session).orderBy(order)
    seq = F.row_number().over(w) - F.lit(1)
    generated = F.concat(F.col(base_id_col).cast("string"), F.lit("#"), seq.cast("string"))
    if preserve_existing and key in df.columns:
        new_key = F.coalesce(F.col(key).cast("string"), generated)
    else:
        new_key = generated
    return df.withColumn(key, new_key)
