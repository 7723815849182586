import datetime as dt

import pytest

from solr_map_reduce_spark.streaming.sessionize import sessionize_stream

TS = dt.datetime(2024, 1, 1, 10, 0, 0)


def _m(minutes):
    return TS + dt.timedelta(minutes=minutes)


def _drain(spark, inp, out, ckpt, schema):
    stream = spark.readStream.schema(schema).parquet(inp)
    sessions = sessionize_stream(stream, gap_seconds=1800, watermark="1 minutes")
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_sessionize_stream_emits_closed_sessions(spark, tmp_path):
    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    schema = "user_id long, ts timestamp"

    batch_a = spark.createDataFrame(
        [(100, _m(0)), (100, _m(5)), (100, _m(10)), (200, _m(0))], schema
    )
    batch_a.coalesce(1).write.parquet(inp)
    _drain(spark, inp, out, ckpt, batch_a.schema)

    # 3h later: user 200 starts a NEW session; watermark then passes every
    # open session's gap timeout
    batch_b = spark.createDataFrame([(200, _m(180))], schema)
    batch_b.coalesce(1).write.mode("append").parquet(inp)
    _drain(spark, inp, out, ckpt, batch_a.schema)
    # one more drain so a no-data batch evaluates event-time timeouts against
    # the advanced watermark (if the previous run didn't already)
    _drain(spark, inp, out, ckpt, batch_a.schema)

    rows = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    # user 100's 3-event session closed by timeout; user 200's first session
    # closed by the gap to its 13:00 event.  200's second session is still
    # open (timeout 13:30 > watermark 12:59) and must NOT be emitted.
    assert (100, _m(0), _m(10), 3) in rows
    assert (200, _m(0), _m(0), 1) in rows
    assert not any(r[0] == 200 and r[1] == _m(180) for r in rows)


@pytest.mark.slow  # multi-user scale variant; single-user closed-session emission covered fast
def test_sessionize_multiple_users_partitioned_state(spark, tmp_path):
    """Many users in one batch: per-key state isolation."""
    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    schema = "user_id long, ts timestamp"
    rows = [(u, _m(u % 7)) for u in range(50)] + [(u, _m(u % 7 + 5)) for u in range(50)]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(inp)
    _drain(spark, inp, out, ckpt, "user_id long, ts timestamp")
    # close everything with a far-future event from one user
    spark.createDataFrame([(999, _m(600))], schema).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    _drain(spark, inp, out, ckpt, "user_id long, ts timestamp")
    _drain(spark, inp, out, ckpt, "user_id long, ts timestamp")

    got = spark.read.parquet(out)
    per_user = {r["user_id"]: r["n_events"] for r in got.collect()}
    assert all(per_user.get(u) == 2 for u in range(50)), per_user
