"""Skew mitigation operators (SURVEY §4 scale strategies; §7 M4).

AQE's skew-join splitting handles most shuffle skew at runtime
(``spark.sql.adaptive.skewJoin`` — on by default in session.py).  These
operators cover the two cases AQE cannot:

- ``salted_join``: a shuffle join where ONE key is so hot a single task
  would still own it after AQE splitting.  The big side gets a random salt
  in [0, buckets); the small side is replicated ``buckets`` times; the join
  key becomes (key, salt).  Classic explode-replicate salting.
- ``salted_aggregate``: high-cardinality-safe two-phase aggregation for
  NON-algebraic aggregates (e.g. ``collect_list``/exact distinct) where
  Spark's map-side partial aggregation can't help.  Algebraic aggregates
  (sum/count/min/max/avg) do NOT need this — Catalyst already partials
  them; use it when a single hot group's state would blow one task.
- ``heavy_hitters``: cheap hot-key detector (sample + count) to decide
  whether salting is worth a second shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

SALT_COL = "_salt"


def heavy_hitters(
    df: DataFrame, key: str, threshold_frac: float = 0.01, sample_frac: float = 0.05,
    seed: int = 42,
) -> DataFrame:
    """Keys whose (estimated) row share exceeds ``threshold_frac``, from a
    seeded sample — one cheap narrow scan + small agg."""
    sample = df.sample(fraction=sample_frac, seed=seed)
    total = sample.count()
    if total == 0:
        return df.select(F.col(key)).limit(0)
    return (
        sample.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= total * threshold_frac)
        .select(key)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    buckets: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Skew-proof shuffle join: salt the big side, replicate the small side.

    Correct for row-multiplying joins (inner/left): each big row carries one
    salt value, each small row exists once per salt value, so every
    (big row, small row) key match meets exactly once.  The hot key's rows
    spread over ``buckets`` tasks instead of one.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti", "semi", "anti"):
        # the small side is REPLICATED once per salt: any join that can
        # emit unmatched small-side rows (right/full) would emit each of
        # them ``buckets`` times — silently wrong, so refuse loudly
        raise ValueError(
            f"salted_join supports inner/left/semi/anti joins only (got "
            f"{how!r}); for a right/full join, salt the other side"
        )
    keys = [on] if isinstance(on, str) else list(on)
    big_salted = big.withColumn(
        SALT_COL, (F.rand(seed) * buckets).cast("int")
    )
    small_rep = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    joined = big_salted.join(small_rep, on=keys + [SALT_COL], how=how)
    return joined.drop(SALT_COL)


def salted_aggregate(
    df: DataFrame,
    keys: str | Sequence[str],
    exprs: dict[str, tuple[Column, Column]],
    buckets: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Two-phase aggregation through a salt for non-algebraic aggregates.

    ``exprs`` maps output name → (partial_agg_expr, merge_agg_expr): the
    partial runs per (keys, salt) — spreading a hot group over ``buckets``
    tasks — and the merge combines the per-salt partials per key.  Example::

        salted_aggregate(df, "user_id", {
            "events": (F.collect_list("event_id"), F.flatten(F.collect_list("events"))),
        })
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    partial = (
        df.withColumn(SALT_COL, (F.rand(seed) * buckets).cast("int"))
        .groupBy(*key_list, SALT_COL)
        .agg(*[expr.alias(name) for name, (expr, _) in exprs.items()])
    )
    return partial.groupBy(*key_list).agg(
        *[merge.alias(name) for name, (_, merge) in exprs.items()]
    )
