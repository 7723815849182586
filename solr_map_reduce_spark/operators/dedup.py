"""Update-conflict resolution — dedup-on-write strategies (SURVEY §2 A10-A15).

Reference semantics (re-expressed, not ported):

- ``retain_most_recent`` — per unique key keep the document with the MAX value
  of an order field (default ``file_last_modified``), comparing numerically
  when both values parse as longs
  (mr/dedup/RetainMostRecentUpdateConflictResolver.java:71-112; default field
  :44-48; numeric comparator mr/dedup/SolrInputDocumentComparator.java:58-82).
  Ties keep the first-seen doc in the reference (MR shuffle order —
  nondeterministic); here a deterministic ``tiebreak`` column is required so
  results are reproducible across engines.
- ``sort_updates`` — per key, updates sorted ascending by the order field
  (apply-in-order semantics, mr/dedup/SortingUpdateConflictResolver.java:59-73).
- ``reject`` — any key with >1 doc is an error
  (mr/dedup/RejectingUpdateConflictResolver.java:33-48).
- ``none`` — identity fast path (mr/SolrReducer.java:92-94).

Scale notes: ``retain_most_recent`` uses ``max_by`` over a struct — a single
hash aggregation with map-side partial combine, which beats a
window-row_number (sort per partition) at 100 TB and never materializes the
losing duplicates past the map side.  All strategies shuffle once on the key.
"""

from __future__ import annotations

from typing import Iterable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_ORDER_FIELD = "file_last_modified"  # RetainMostRecentUpdateConflictResolver.java:44-48

STRATEGIES = ("retain_most_recent", "sort_updates", "reject", "none")


def _order_struct(order_col: str, tiebreak: Iterable[str] | None) -> F.Column:
    cols = [F.col(order_col)]
    if tiebreak:
        cols.extend(F.col(c) for c in tiebreak)
    return F.struct(*cols)


def retain_most_recent(
    df: DataFrame,
    key: str,
    order_col: str = DEFAULT_ORDER_FIELD,
    tiebreak: Iterable[str] | None = None,
) -> DataFrame:
    """Per key keep the row with the greatest (order_col, *tiebreak).

    Single-shuffle argmax: ``groupBy(key).agg(max_by(struct(all_cols),
    order_struct))`` — partial-aggregates map-side, so at scale only one
    candidate row per key per map partition crosses the shuffle.
    """
    payload = F.struct(*[F.col(c) for c in df.columns])
    winner = F.max_by(payload, _order_struct(order_col, tiebreak)).alias("_doc")
    out = df.groupBy(F.col(key).alias("_key")).agg(winner)
    return out.select([F.col(f"_doc.{c}").alias(c) for c in df.columns])


def sort_updates(
    df: DataFrame,
    key: str,
    order_col: str,
    tiebreak: Iterable[str] | None = None,
) -> DataFrame:
    """Per key, collect updates sorted ascending by the order field.

    Returns ``(key, updates: array<struct<all_cols>>)``; array order is the
    apply-in-order contract of SortingUpdateConflictResolver.  ``sort_array``
    over ``collect_list`` keeps it a single hash aggregation; the sort runs
    per-key on bounded update lists, not over the whole partition.
    """
    ordered = F.struct(
        _order_struct(order_col, tiebreak).alias("_ord"),
        F.struct(*[F.col(c) for c in df.columns]).alias("doc"),
    )
    out = df.groupBy(F.col(key).alias(key).alias("_key")).agg(
        F.sort_array(F.collect_list(ordered)).alias("_sorted")
    )
    return out.select(
        F.col("_key").alias(key),
        F.col("_sorted.doc").alias("updates"),
    )


def collision_report(df: DataFrame, key: str) -> DataFrame:
    """Keys with more than one document: ``(key, n_docs)``."""
    return (
        df.groupBy(F.col(key))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


def reject_collisions(df: DataFrame, key: str, eager: bool = True) -> DataFrame:
    """Fail if any key has >1 doc (RejectingUpdateConflictResolver semantics).

    ``eager=True`` checks now with a cheap count-distinct aggregation;
    ``eager=False`` plants a lazy ``raise_error`` guard that trips during
    whatever action consumes the returned plan.
    """
    if eager:
        first = collision_report(df, key).take(1)
        if first:
            row = first[0]
            raise ValueError(
                f"duplicate unique key {row[key]!r}: {row['n_docs']} documents"
            )
        return df
    dup_keys = collision_report(df, key).select(F.col(key).alias("_dup_key"))
    guarded = df.join(
        F.broadcast(dup_keys), df[key] == F.col("_dup_key"), "left"
    )
    # the guard must live INSIDE a surviving column — a standalone column
    # that is immediately dropped gets pruned by the optimizer and the check
    # silently never fires.  Folding it into the key column itself means any
    # plan that consumes the key (every downstream op — the key is the whole
    # point) evaluates the raise_error on duplicate rows.
    key_type = df.schema[key].dataType
    guarded_key = F.when(
        F.col("_dup_key").isNotNull(),
        F.raise_error(
            F.concat(F.lit("duplicate unique key: "), F.col(key).cast("string"))
        ).cast(key_type),
    ).otherwise(F.col(key))
    return guarded.withColumn(key, guarded_key).drop("_dup_key").select(df.columns)


def resolve(
    df: DataFrame,
    key: str,
    strategy: str = "retain_most_recent",
    order_col: str = DEFAULT_ORDER_FIELD,
    tiebreak: Iterable[str] | None = None,
) -> DataFrame:
    """Strategy dispatch — the ``--update-conflict-resolver`` analog
    (mr/SolrReducer.java:54-69; CLI MapReduceIndexerTool.java:271-284)."""
    if strategy == "none":
        return df
    if strategy == "retain_most_recent":
        return retain_most_recent(df, key, order_col, tiebreak)
    if strategy == "sort_updates":
        return sort_updates(df, key, order_col, tiebreak)
    if strategy == "reject":
        return reject_collisions(df, key)
    raise ValueError(f"unknown dedup strategy {strategy!r}; expected one of {STRATEGIES}")
