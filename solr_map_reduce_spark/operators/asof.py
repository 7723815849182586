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

    # the right row travels as ONE struct so the window fill attaches the
    # latest right ROW atomically — per-column last(ignorenulls) would
    # build a frankenstein match (a NULL payload cell in the latest right
    # row silently back-filled from an OLDER right row, which no real
    # as-of join — pandas merge_asof, DuckDB ASOF JOIN — ever does)
    lt = left.withColumn("_tag", F.lit(1))
    rt = right.select(
        F.col(on),
        F.col(rts).alias(ts),
        F.lit(0).alias("_tag"),
        F.struct(
            F.col(rts).alias(f"{ts}{suffix}"),
            *[F.col(c).alias(f"{c}{suffix}") for c in payload],
        ).alias("_asof_row"),
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "_asof_row", F.last("_asof_row", ignorenulls=True).over(w)
    )
    row = F.col("_asof_row")
    if tolerance_seconds is not None:
        stale = (
            epoch_seconds(F.col(ts))
            - epoch_seconds(row.getField(f"{ts}{suffix}"))
        ) > tolerance_seconds
        row = F.when(~F.coalesce(stale, F.lit(False)), row)
    out_cols = [f"{ts}{suffix}"] + [f"{c}{suffix}" for c in payload]
    return (
        filled.filter(F.col("_tag") == 1)
        .select(
            *[c for c in filled.columns if c not in ("_tag", "_asof_row")],
            *[row.getField(c).alias(c) for c in out_cols],
        )
    )
