"""Gap-based sessionization — the canonical custom stateful operator the
reference lacks (SURVEY §7 M4 extension; the training-data-pipeline shape:
group raw event streams into user sessions before feature extraction).

Two implementations with identical semantics (a new session starts when the
gap to the previous event of the same key exceeds ``gap_seconds``):

- ``sessionize`` (batch): pure window functions — lag → gap flag → running
  sum as session index → per-session aggregate.  One shuffle on the key;
  SQL-expressible, so it carries a DuckDB oracle in the query registry.
- ``sessionize_stream`` (streaming): ``applyInPandasWithState`` keeps an
  open-session state per key and emits a session row when the gap closes it
  or the event-time timeout fires.  State is O(1) per key (bounds memory at
  100 TB: state size scales with live keys, not events).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, Window

from solr_map_reduce_spark.functions.timestamps import ensure_instant, epoch_seconds


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    id_tiebreak: str | None = "event_id",
) -> DataFrame:
    """Batch sessionization: one row per (key, session) with start/end/count.

    Plan shape: single hash-exchange on ``key_col`` feeding BOTH window
    functions and the final aggregate (same partitioning → no second
    shuffle)."""
    order = [F.col(ts_col).asc()] + (
        [F.col(id_tiebreak).asc()] if id_tiebreak else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    is_new = (
        prev_ts.isNull()
        | ((epoch_seconds(F.col(ts_col)) - epoch_seconds(prev_ts)) > gap_seconds)
    ).cast("long")
    running = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        df.withColumn("_new_sess", is_new)
        .withColumn("session_id", F.sum("_new_sess").over(running))
        .groupBy(key_col, "session_id")
        .agg(
            F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def sessionize_oracle_sql(
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    id_tiebreak: str = "event_id",
    table: str = "events",
) -> str:
    """DuckDB SQL with identical semantics for :func:`sessionize`."""
    return f"""
WITH flagged AS (
  SELECT {key_col}, {ts_col}, {id_tiebreak},
    CASE WHEN lag({ts_col}) OVER w IS NULL
           OR CAST(epoch({ts_col}) AS BIGINT)
              - CAST(epoch(lag({ts_col}) OVER w) AS BIGINT) > {gap_seconds}
         THEN 1 ELSE 0 END AS new_sess
  FROM {table}
  WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col}, {id_tiebreak})
), numbered AS (
  SELECT {key_col}, {ts_col},
    CAST(SUM(new_sess) OVER (PARTITION BY {key_col} ORDER BY {ts_col}, {id_tiebreak}
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT {key_col}, session_id,
  strftime(min({ts_col}), '%Y-%m-%d %H:%M:%S') AS session_start,
  strftime(max({ts_col}), '%Y-%m-%d %H:%M:%S') AS session_end,
  count(*) AS n_events
FROM numbered GROUP BY {key_col}, session_id
"""


_SESSION_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_SESSION_STATE = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize_stream(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization with per-key open-session state.

    Events are grouped per key into each micro-batch; the state holds the
    open session (start, end, count).  A batch's events are processed in
    event-time order; any gap > ``gap_seconds`` closes the current session
    and emits it.  The event-time timeout (watermark-driven) flushes
    sessions for keys that go silent."""
    import datetime as dt

    gap_us = gap_seconds * 1_000_000

    def fn(key: Any, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start_us, end_us, n = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "session_start": [pd.Timestamp(start_us, unit="us")],
                        "session_end": [pd.Timestamp(end_us, unit="us")],
                        "n_events": [n],
                    }
                )
            return

        ts_list: list[int] = []
        for pdf in pdf_iter:
            col = pd.to_datetime(pdf[ts_col])
            ts_list.extend(int(v.value // 1000) for v in col)
        ts_list.sort()
        if state.exists:
            start_us, end_us, n = state.get
        else:
            start_us, end_us, n = None, None, 0
        closed = []
        for t_us in ts_list:
            if start_us is None:
                start_us, end_us, n = t_us, t_us, 1
            elif t_us - end_us > gap_us:
                closed.append((start_us, end_us, n))
                start_us, end_us, n = t_us, t_us, 1
            else:
                end_us = t_us
                n += 1
        state.update((start_us, end_us, n))
        # close the open session if the key stays silent past gap + slack
        state.setTimeoutTimestamp(end_us // 1000 + gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    return (
        ensure_instant(stream, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=_SESSION_OUT,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )
