"""As-of join: backward point-in-time semantics, tie inclusivity, tolerance,
single-shuffle plan."""

import datetime as dt

import pyspark.sql.functions as F
import pytest

from solr_map_reduce_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _t(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def frames(spark):
    trades = spark.createDataFrame(
        [(1, _t(1), 100.0), (1, _t(5), 101.0), (1, _t(10), 102.0),
         (2, _t(3), 50.0), (3, _t(2), 7.0)],
        "key long, ts timestamp, trade double",
    )
    quotes = spark.createDataFrame(
        [(1, _t(0), 99.5), (1, _t(5), 100.5), (1, _t(9), 101.5),
         (2, _t(4), 49.5)],
        "key long, ts timestamp, quote double",
    )
    return trades, quotes


def test_backward_asof_semantics(frames):
    trades, quotes = frames
    out = {
        (r["key"], r["ts"]): r["quote_r"]
        for r in asof_join(trades, quotes, on="key").collect()
    }
    assert out[(1, _t(1))] == 99.5    # latest quote at/before t1
    assert out[(1, _t(5))] == 100.5   # tie at equal ts is inclusive
    assert out[(1, _t(10))] == 101.5
    assert out[(2, _t(3))] is None    # quote arrives after the trade
    assert out[(3, _t(2))] is None    # no quotes for key 3 at all


def test_left_rows_all_preserved(frames):
    trades, quotes = frames
    assert asof_join(trades, quotes, on="key").count() == trades.count()


def test_tolerance_keeps_fresh_matches(frames):
    trades, quotes = frames
    out = {
        (r["key"], r["ts"]): r["quote_r"]
        for r in asof_join(trades, quotes, on="key",
                           tolerance_seconds=120).collect()
    }
    # every matched pair in the fixture is <= 60s old -> all kept
    assert out[(1, _t(1))] == 99.5
    assert out[(1, _t(5))] == 100.5
    assert out[(1, _t(10))] == 101.5


def test_tolerance_exact(spark):
    left = spark.createDataFrame([(1, _t(10), "x")], "key long, ts timestamp, v string")
    right = spark.createDataFrame([(1, _t(0), 5.0)], "key long, ts timestamp, p double")
    ok = asof_join(left, right, on="key", tolerance_seconds=600).first()
    assert ok["p_r"] == 5.0  # exactly at tolerance boundary: kept
    stale = asof_join(left, right, on="key", tolerance_seconds=599).first()
    assert stale["p_r"] is None


def test_single_shuffle_plan(frames):
    trades, quotes = frames
    plan = (
        asof_join(trades, quotes, on="key")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
