"""Skew mitigation: salted join / salted aggregate / heavy-hitter detection."""

import pyspark.sql.functions as F
import pytest

from solr_map_reduce_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90%) + a uniform tail
    hot = spark.range(900).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    tail = spark.range(100).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(tail)


def test_heavy_hitters_finds_hot_key(spark, skewed):
    hits = [r["k"] for r in skew.heavy_hitters(skewed, "k", threshold_frac=0.5,
                                               sample_frac=0.5).collect()]
    assert hits == ["hot"]


def test_salted_join_matches_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "K1"), ("k5", "K5")], "k string, label string"
    )
    plain = skewed.join(dim, "k").groupBy("k", "label").count()
    salted = skew.salted_join(skewed, dim, "k", buckets=4).groupBy("k", "label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark, skewed):
    dim = spark.createDataFrame([("hot", 1)], "k string, d int")
    out = skew.salted_join(skewed, dim, "k", buckets=4)
    # every big row of the hot key survives exactly once
    assert out.count() == 900
    assert skew.SALT_COL not in out.columns


def test_salted_aggregate_collect_list(spark, skewed):
    got = skew.salted_aggregate(
        skewed,
        "k",
        {"vals": (F.collect_list("v"), F.flatten(F.collect_list("vals"))),
         "n": (F.count(F.lit(1)), F.sum("n"))},
        buckets=4,
    )
    rows = {r["k"]: r for r in got.collect()}
    assert rows["hot"]["n"] == 900
    assert sorted(rows["hot"]["vals"]) == list(range(900))
    assert rows["k7"]["n"] == 1
