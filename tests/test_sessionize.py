"""Gap-based sessionization: batch window implementation vs hand-computed
sessions, and the applyInPandasWithState streaming variant."""

import datetime as dt

import pyspark.sql.functions as F
import pytest

from solr_map_reduce_spark.streaming.sessionize import sessionize, sessionize_stream

BASE = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(uid, minutes, eid):
    return (uid, eid, BASE + dt.timedelta(minutes=minutes))


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: two sessions (gap 60 min > 30 min)
        _ev(1, 0, 10), _ev(1, 10, 11), _ev(1, 20, 12),
        _ev(1, 80, 13), _ev(1, 85, 14),
        # user 2: one session, single event
        _ev(2, 5, 20),
        # user 3: three sessions of one event each
        _ev(3, 0, 30), _ev(3, 40, 31), _ev(3, 90, 32),
    ]
    return spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")


def test_sessionize_batch(events):
    out = {
        (r["user_id"], r["session_id"]): (r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(events, gap_seconds=1800).collect()
    }
    assert len(out) == 6
    assert out[(1, 1)] == ("2024-01-01 12:00:00", "2024-01-01 12:20:00", 3)
    assert out[(1, 2)] == ("2024-01-01 13:20:00", "2024-01-01 13:25:00", 2)
    assert out[(2, 1)][2] == 1
    assert [out[(3, i)][2] for i in (1, 2, 3)] == [1, 1, 1]


def test_sessionize_exact_gap_is_same_session(spark):
    # gap exactly == gap_seconds stays in the same session (strict >)
    rows = [(1, 1, BASE), (1, 2, BASE + dt.timedelta(seconds=1800))]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    out = sessionize(df, gap_seconds=1800).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2


def test_sessionize_single_shuffle_plan(events):
    """Window + groupBy share one exchange on user_id."""
    plan = sessionize(events)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_sessionize_stream_closes_on_gap(spark, tmp_path):
    src = tmp_path / "stream_in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    rows = [
        _ev(1, 0, 1), _ev(1, 10, 2),      # session A
        _ev(1, 80, 3),                     # gap 70min -> closes A, opens B
        _ev(2, 0, 4),                      # user 2 open session
        _ev(1, 300, 5),                    # closes B (gap), opens C
    ]
    spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp").coalesce(
        1
    ).write.parquet(str(src / "batch0"))
    stream = spark.readStream.schema("user_id long, event_id long, ts timestamp").parquet(
        str(src / "*")
    )
    sessions = sessionize_stream(stream, gap_seconds=1800, watermark="10 minutes")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in spark.sql("select * from sess_out").collect()
    }
    # sessions closed by in-batch gaps: user1 A (2 events) and B (1 event);
    # user 2's session is flushed by the event-time timeout (watermark from
    # user 1's minute-300 event passes its end+gap); user 1's open session C
    # is ahead of the watermark and stays open
    assert got[(1, BASE)] == 2
    assert got[(1, BASE + dt.timedelta(minutes=80))] == 1
    assert got[(2, BASE)] == 1
    assert len(got) == 3
