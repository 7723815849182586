import pyspark.sql.functions as F

from solr_map_reduce_spark.operators.stats import profile


def test_profile_counts_nulls_and_ranges(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (9, "b"), (10, "a")], "k long, s string"
    )
    rows = {r["column"]: r for r in profile(df, exact=True).collect()}
    assert rows["k"]["non_null"] == 4 and rows["k"]["nulls"] == 0
    assert rows["k"]["distinct_cnt"] == 4
    # numeric order, not lexicographic: max is 10, not 9
    assert (rows["k"]["min_value"], rows["k"]["max_value"]) == ("1", "10")
    assert rows["s"]["non_null"] == 3 and rows["s"]["nulls"] == 1
    assert rows["s"]["distinct_cnt"] == 2


def test_profile_one_scan_one_exchange(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = (
        profile(df, ["user_id", "event_type"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan") == 1
    assert plan.count("Exchange") == 1


def test_profile_approx_tracks_exact(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r["column"]: r["distinct_cnt"]
        for r in profile(df, ["user_id"], exact=True).collect()
    }
    approx = {
        r["column"]: r["distinct_cnt"]
        for r in profile(df, ["user_id"], exact=False).collect()
    }
    assert abs(approx["user_id"] - exact["user_id"]) <= max(2, 0.1 * exact["user_id"])
