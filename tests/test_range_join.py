"""Range join: binned equi-join equals the naive inequality join exactly."""

import datetime as dt

import pyspark.sql.functions as F
import pytest

from solr_map_reduce_spark.operators.range_join import range_join

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _t(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [(1, 100, _t(5)), (1, 101, _t(65)), (1, 102, _t(200)),
         (2, 200, _t(30)), (3, 300, _t(10))],
        "key long, pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(1, 10, _t(0), _t(60)),     # covers pid 100 (and boundary 101? t65>t60 no)
         (1, 11, _t(60), _t(120)),   # covers pid 101 (inclusive t65)
         (1, 12, _t(50), _t(70)),    # overlaps: also covers 101
         (2, 20, _t(0), _t(60)),     # covers 200
         (4, 40, _t(0), _t(600))],   # key with no points
        "key long, iid long, start timestamp, end timestamp",
    )
    return points, intervals


def test_range_join_matches_naive(frames):
    points, intervals = frames
    binned = range_join(points, intervals, "ts", "start", "end", on="key",
                        bin_seconds=1800)
    naive = points.join(intervals, "key").filter(
        (F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end"))
    )
    k = lambda df: sorted((r["pid"], r["iid"]) for r in df.collect())
    assert k(binned) == k(naive)
    assert k(binned) == [(100, 10), (101, 11), (101, 12), (200, 20)]


def test_range_join_inclusive_bounds(spark):
    pts = spark.createDataFrame([(1, 1, _t(0)), (1, 2, _t(60))],
                                "key long, pid long, ts timestamp")
    iv = spark.createDataFrame([(1, 9, _t(0), _t(60))],
                               "key long, iid long, start timestamp, end timestamp")
    got = sorted(r["pid"] for r in range_join(pts, iv, "ts", "start", "end",
                                              on="key", bin_seconds=60).collect())
    assert got == [1, 2]  # both boundary points included


def test_range_join_tiny_bins_still_exact(frames):
    """Correctness is bin-size independent (bins only affect replication)."""
    points, intervals = frames
    a = range_join(points, intervals, "ts", "start", "end", on="key", bin_seconds=60)
    b = range_join(points, intervals, "ts", "start", "end", on="key", bin_seconds=7200)
    k = lambda df: sorted((r["pid"], r["iid"]) for r in df.collect())
    assert k(a) == k(b)


def test_range_join_no_key(spark):
    pts = spark.createDataFrame([(1, _t(5)), (2, _t(500))],
                                "pid long, ts timestamp")
    iv = spark.createDataFrame([(7, _t(0), _t(10))],
                               "iid long, start timestamp, end timestamp")
    got = [r["pid"] for r in range_join(pts, iv, "ts", "start", "end",
                                        bin_seconds=600).collect()]
    assert got == [1]
