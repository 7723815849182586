"""As-of (point-in-time) join — the canonical operator Spark lacks natively
(SURVEY §7 M4 / task brief: "as-of join" as a composition of existing
DataFrame ops).

For every left row, attach the LATEST right row of the same key with
``right.ts <= left.ts`` (backward as-of; the standard point-in-time lookup
for feature stores and event enrichment).

Implementation is the union-tag trick — pure DataFrame ops, ONE shuffle:

    union(left tagged 1, right tagged 0)
      → window per key ordered by (ts, tag):
          last_value(right payload, ignorenulls) over rows-unbounded-preceding
      → keep left rows

Right rows sort BEFORE left rows at equal ts (tag order), so ties are
inclusive (right.ts == left.ts matches).  Compared to a naive
join+filter+argmax — which explodes to |L|·|R| per key before pruning — the
union-window form shuffles |L|+|R| rows exactly once.

DuckDB expresses the same thing natively (``ASOF JOIN``), which serves as
the oracle in the query registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from solr_map_reduce_spark.functions.timestamps import epoch_seconds


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_ts: str | None = None,
    suffix: str = "_r",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join: left rows + latest right payload at or before
    the left timestamp.  Left rows with no prior right row keep nulls.

    ``tolerance_seconds`` drops matches older than the window (like pandas
    ``merge_asof(tolerance=...)``).
    """
    rts = right_ts or ts
    payload = [c for c in right.columns if c not in (on, rts)]

    lt = left.withColumn("_tag", F.lit(1))
    rt = right.select(
        F.col(on),
        F.col(rts).alias(ts),
        F.lit(0).alias("_tag"),
        F.col(rts).alias(f"{ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload],
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned
    for c in [f"{ts}{suffix}"] + [f"{c}{suffix}" for c in payload]:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = filled.filter(F.col("_tag") == 1).drop("_tag")
    if tolerance_seconds is not None:
        # materialize the flag FIRST: nulling ts_r in-place would turn the
        # predicate NULL for the remaining payload columns
        out = out.withColumn(
            "_stale",
            (epoch_seconds(F.col(ts)) - epoch_seconds(F.col(f"{ts}{suffix}")))
            > tolerance_seconds,
        )
        for c in [f"{ts}{suffix}"] + [f"{c}{suffix}" for c in payload]:
            out = out.withColumn(
                c, F.when(F.col("_stale"), F.lit(None)).otherwise(F.col(c))
            )
        out = out.drop("_stale")
    return out
