"""Table profiling: per-column stats in ONE scan + ONE aggregate.

The reference exposes dataset statistics only as Hadoop counters
(``mr/SolrCounters.java``, ``mr/morphline/MorphlineCounters.java`` —
docs read/written per job).  A columnar engine can do better: this is the
corpus-profiling pass a training pipeline runs before curation decisions
(null rates, cardinalities, value ranges per column).

All per-column aggregates are packed into a single wide ``agg`` row —
Catalyst evaluates them in one partial/final aggregate pass over one scan —
then the row is unpivoted driver-side into one output row per column (the
unpivot touches K columns, never data rows).

``exact=False`` (default) uses ``approx_count_distinct`` (HyperLogLog++,
constant memory per column — the only option at 100 TB);  ``exact=True``
uses ``count_distinct`` so the DuckDB oracle can replay the result
bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def profile(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    exact: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Profile ``cols`` (default: all) → one row per column:
    ``(column, non_null, nulls, distinct_cnt, min_value, max_value)``.

    min/max are cast to string so heterogeneous column types share one
    schema; timestamps format as ``yyyy-MM-dd HH:mm:ss`` for cross-engine
    stability.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    total = F.count(F.lit(1)).alias("__total")

    def _str(col: F.Column, c: str) -> F.Column:
        # min/max run on the NATIVE type (numeric order, not lexicographic);
        # only the final scalar is rendered as a string
        dt = df.schema[c].dataType.simpleString()
        if dt.startswith("timestamp"):
            return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
        return col.cast("string")

    aggs = [total]
    for c in cols:
        distinct = (
            F.count_distinct(F.col(c))
            if exact
            else F.approx_count_distinct(F.col(c), rsd)
        )
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            distinct.alias(f"__d_{c}"),
            _str(F.min(F.col(c)), c).alias(f"__min_{c}"),
            _str(F.max(F.col(c)), c).alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)

    stack_args: list[F.Column] = []
    for c in cols:
        stack_args += [
            F.lit(c),
            F.col(f"__nn_{c}"),
            F.col("__total") - F.col(f"__nn_{c}"),
            F.col(f"__d_{c}"),
            F.col(f"__min_{c}"),
            F.col(f"__max_{c}"),
        ]
    n = len(cols)
    return wide.select(
        F.stack(
            F.lit(n),
            *stack_args,
        ).alias("column", "non_null", "nulls", "distinct_cnt", "min_value", "max_value")
    )
