"""Sessionization — gap-based session assignment over an event stream.

The reference has no session concept (its closest shape is the windowed
date-range pull, ``config/mautic/mautic.py:47-70``), but a training-data
event pipeline needs it, and it is the canonical *custom stateful
operator*: Spark has no built-in "session id" assignment, so we provide

- :func:`sessionize` — the batch form, pure DataFrame ops (lag + running
  sum of gap breaks).  One shuffle on ``user_id``; scales as a window.
- :func:`session_aggregate` — sessions rolled up to one row each.
- :func:`sessionize_stateful` — the Structured Streaming form via
  ``applyInPandasWithState``: per-user session state (start, last event
  time, count) kept in the state store, sessions emitted when the gap
  timeout fires.  This is the ``applyInPandasWithState`` pattern from
  the PySpark guide; state size is O(active users), not O(events).
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from data_pipeline_bigquery_spark.functions.timestamps import to_epoch_seconds

DEFAULT_GAP_MIN = 30


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = DEFAULT_GAP_MIN,
) -> DataFrame:
    """Assign a per-user session index: a new session starts when the
    gap since the previous event exceeds ``gap_minutes``.  The running
    ``sum`` over the break flags is the classic single-window
    sessionizer — one shuffle, no Python."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_s = gap_minutes * 60
    is_break = (
        to_epoch_seconds(ts_col) - F.lag(to_epoch_seconds(ts_col)).over(w) > gap_s
    ).cast("int")
    return events.withColumn(
        "session_idx",
        F.sum(F.coalesce(is_break, F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )


def session_aggregate(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = DEFAULT_GAP_MIN,
) -> DataFrame:
    """One row per session: start, end, event count.  Reuses the
    sessionize window partitioning, so the rollup adds one exchange on
    ``(user, session_idx)`` — AQE coalesces it at small scale."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    return s.groupBy(user_col, "session_idx").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


SESSION_STATE_SCHEMA = "start timestamp, last timestamp, n bigint"
SESSION_OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)


def _session_fn(gap_minutes: int):
    gap = dt.timedelta(minutes=gap_minutes)

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "session_start": [start],
                 "session_end": [last], "n_events": [n]}
            )
            return
        ts = sorted(
            t.to_pydatetime() if hasattr(t, "to_pydatetime") else t
            for pdf in pdfs
            for t in pdf["ts"]
        )
        out = {"user_id": [], "session_start": [], "session_end": [], "n_events": []}
        start, last, n = state.get if state.exists else (None, None, 0)
        for t in ts:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap:
                out["user_id"].append(user_id)
                out["session_start"].append(start)
                out["session_end"].append(last)
                out["n_events"].append(n)
                start, last, n = t, t, 1
            else:
                last, n = max(last, t), n + 1
        state.update((start, last, n))
        # close the open session once the event-time watermark passes gap
        state.setTimeoutTimestamp(
            int(last.timestamp() * 1000) + gap_minutes * 60_000
        )
        yield pd.DataFrame(out)

    return fn


def sessionize_stateful(
    events: DataFrame,
    gap_minutes: int = DEFAULT_GAP_MIN,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization: ``events`` is a streaming DataFrame with
    ``user_id``/``ts``; emits one row per CLOSED session (closed by a
    later event past the gap, or by event-time timeout once the
    watermark advances).  State per user is a 3-tuple — bounded by
    active users regardless of stream volume."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_minutes),
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
