"""Online seasonal-decomposition monitor — the streaming twin of
``queries/analytics19.seasonal_decompose_additive``.

The processor keeps the CALENDAR-BOUNDED daily series (one
(epoch-day, cents) pair per observed day — the exact grain the batch
key's windows run at) in a single group state, folds each micro-batch
of day-grain rows FIRST-WINS (a replayed or revised day is discarded,
the croston_stream watermark discipline), and on every batch that
adds new days re-emits the FULL refreshed decomposition — the
identical (cents, wd, trend_mc, seasonal_mc, residual_mc) rows the
batch key computes over the same days, because :func:`decompose_days`
mirrors its arithmetic step for step: centered 7-row integer MA with
one floor(double) division, weekday = epoch-day mod 7, seasonal =
floor(Σdet/count) guarded on count, residual by exact integer
subtraction (all IEEE-identical to the Catalyst expressions —
convergence is test-asserted wherever the micro-batch boundary
falls).

FEED CONTRACT: day-grain rows (``day_epoch``, ``cents``) for CLOSED
days (e.g. from an upstream update-mode daily aggregate); late
revisions to an already-folded day cannot be applied (first-wins) —
route restatements through the batch readout, as with every
watermark-bounded operator here.

State is bounded by the calendar (two int64 arrays, one entry per
observed day — centuries fit in memory), the same single-partition
argument the batch key's ordered window documents.
"""

from __future__ import annotations

import math
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SEASONAL_STATE_SCHEMA = "days array<bigint>, cents array<bigint>"
SEASONAL_OUT_SCHEMA = (
    "day_epoch bigint, cents bigint, wd bigint, trend_mc bigint,"
    " seasonal_mc bigint, residual_mc bigint"
)


def decompose_days(pairs: list[tuple[int, int]]) -> list[dict]:
    """The batch key's arithmetic over a (epoch_day, cents) series:
    ROW-centered 7-day MA trend (full windows only), weekday-mean
    seasonal of the detrended series, integer residual — every
    division a single floor(double) op, exactly as the Catalyst
    expressions evaluate it."""
    pairs = sorted(pairs)
    n = len(pairs)
    trend: list[int | None] = [None] * n
    for i in range(3, n - 3):
        s7 = sum(c for _, c in pairs[i - 3 : i + 4])
        trend[i] = math.floor(s7 * 1000.0 / 7.0)
    det = [
        pairs[i][1] * 1000 - trend[i] if trend[i] is not None else None
        for i in range(n)
    ]
    by_wd: dict[int, list[int]] = {}
    for i in range(n):
        if det[i] is not None:
            by_wd.setdefault(pairs[i][0] % 7, []).append(det[i])
    seasonal_wd = {
        wd: math.floor(sum(v) * 1.0 / len(v)) for wd, v in by_wd.items()
    }
    out = []
    for i, (day, cents) in enumerate(pairs):
        wd = day % 7
        s = seasonal_wd.get(wd)
        r = (
            cents * 1000 - trend[i] - s
            if (trend[i] is not None and s is not None)
            else None
        )
        out.append(
            {
                "day_epoch": day,
                "cents": cents,
                "wd": wd,
                "trend_mc": trend[i],
                "seasonal_mc": s,
                "residual_mc": r,
            }
        )
    return out


def _seasonal_fn(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:  # pragma: no cover - NoTimeout configured
        state.remove()
        return
    chunks = list(pdfs)
    if not chunks:  # state-only invocation (no data for the key this
        return  # micro-batch in some Spark versions): nothing to fold
    rows = pd.concat(chunks, ignore_index=True)
    rows = rows.sort_values("day_epoch", kind="mergesort").drop_duplicates(
        "day_epoch", keep="first"
    )
    days, cents = (
        (list(state.get[0]), list(state.get[1]))
        if state.exists
        else ([], [])
    )
    known = set(days)
    advanced = False
    for _, r in rows.iterrows():
        day = int(r["day_epoch"])
        if day in known:
            continue  # replay / late revision: first-wins, no-op
        days.append(day)
        cents.append(int(r["cents"]))
        known.add(day)
        advanced = True
    if not advanced:
        return  # pure-replay batch: no state change, no duplicate emit
    state.update((days, cents))
    yield pd.DataFrame(decompose_days(list(zip(days, cents))))


def seasonal_monitor(daily: DataFrame) -> DataFrame:
    """Attach the monitor to a streaming frame of closed day-grain
    rows (``day_epoch`` int days, ``cents``).  Emits the full
    refreshed decomposition on every batch that adds days (append
    mode — downstream keeps the last emission per day, or sinks to an
    upsert store)."""
    return (
        daily.withColumn("g", F.lit(0))
        .groupBy("g")
        .applyInPandasWithState(
            _seasonal_fn,
            outputStructType=SEASONAL_OUT_SCHEMA,
            stateStructType=SEASONAL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
