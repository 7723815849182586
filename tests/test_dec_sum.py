"""_dec_sum exactness: the compact-long hi/lo formulation must equal
sum(cast(col as decimal(18,6))) bit-for-bit on every value shape the
money pipeline produces (<= 6 decimal digits, any sign, group sizes
from 1 to thousands) — the property the 2x hot-path win rests on."""

import random

import pyspark.sql.functions as F

from solr_map_reduce_spark.queries import _dec_sum


def _old_dec_sum(col, alias):
    return F.sum(col.cast("decimal(18,6)")).cast("double").alias(alias)


def _check(spark, values):
    df = spark.createDataFrame(
        [(i % 7, float(v)) for i, v in enumerate(values)], "g int, v double"
    )
    new = {
        r["g"]: r["s"]
        for r in df.groupBy("g").agg(_dec_sum(F.col("v"), "s")).collect()
    }
    old = {
        r["g"]: r["s"]
        for r in df.groupBy("g").agg(_old_dec_sum(F.col("v"), "s")).collect()
    }
    assert new == old, (new, old)


def test_dec_sum_random_micros(spark):
    rng = random.Random(42)
    # arbitrary 6-decimal values incl. negatives and magnitude spread
    values = [rng.randint(-10_000_000_000, 10_000_000_000) / 1e6
              for _ in range(5000)]
    _check(spark, values)


def test_dec_sum_product_shapes(spark):
    # the actual expression shapes: price * (1 - disc) [* (1 + tax)]
    rng = random.Random(7)
    vals = []
    for _ in range(5000):
        price = rng.randint(90_000, 11_000_000) / 100  # 2 decimals
        disc = rng.randint(0, 10) / 100
        tax = rng.randint(0, 8) / 100
        vals.append(price * (1 - disc) * (1 + tax))
        vals.append(price * (1 - disc))
        vals.append(-price * disc)  # negative branch (q9 profit terms)
    _check(spark, vals)


def test_dec_sum_edges(spark):
    _check(spark, [0.0, -0.0, 1.0, -1.0, 0.000001, -0.000001,
                   122.99999999999999, 9999999.999999, -9999999.999999,
                   0.5, -0.5, 2.5, -2.5, 0.1 + 0.2])


def test_dec_sum_nonfinite_matches_decimal(spark):
    # cast(NaN/Infinity as decimal) is NULL (skipped by sum): the long
    # formulation must NULL non-finite inputs the same way — a group of
    # only-NaN sums to NULL, an Inf never saturates the long total
    nan, inf = float("nan"), float("inf")
    df = spark.createDataFrame(
        [(0, nan), (0, nan),          # all-NaN group -> NULL
         (1, inf), (1, 2.5),          # Inf skipped -> 2.5
         (2, -inf), (2, nan), (2, 1.25), (2, 0.75)],  # -> 2.0
        "g int, v double",
    )
    new = {
        r["g"]: r["s"]
        for r in df.groupBy("g").agg(_dec_sum(F.col("v"), "s")).collect()
    }
    old = {
        r["g"]: r["s"]
        for r in df.groupBy("g").agg(_old_dec_sum(F.col("v"), "s")).collect()
    }
    assert new == old, (new, old)
    assert new[0] is None and new[1] == 2.5 and new[2] == 2.0
