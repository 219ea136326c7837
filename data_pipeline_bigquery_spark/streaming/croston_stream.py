"""Online intermittent-demand monitor — the streaming twin of
``queries/analytics12.croston_intermittent_forecast``.

Per key (user/SKU/store), the stateful processor keeps EXACTLY the
inputs the batch key's truncated dyadic EWMA consumes: the last ≤30
demand sizes (integer cents), the last ≤30 inter-demand gaps (days),
and the last demand date.  On every batch that brings a key new
demand days, it emits the refreshed forecast row — the identical
(n_demands, z30, p30, croston_rate) the batch key would compute over
the same history.  For a per-key DAY-ORDERED feed (the watermark
contract) the stream converges to the batch readout wherever the
micro-batch boundaries fall (test-asserted); replays and late
out-of-order days are discarded deterministically (first-wins), and a
batch that advances nothing emits nothing.

State is bounded by construction: ≤30+30 int64s + a date + a count
per key, independent of stream volume — the
``applyInPandasWithState`` discipline shared with
``anomaly_stream``/``sessions``.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_WINDOW = 30

CROSTON_STATE_SCHEMA = (
    "sizes array<bigint>, gaps array<bigint>, last_day long, n_demands long"
)
CROSTON_OUT_SCHEMA = (
    "user_id bigint, n_demands bigint, z30 bigint, p30 bigint,"
    " croston_rate double"
)


def shift_sum(vals) -> int | None:
    """Σ v_i · 2^(29 − L + i) (1-based) over the last ≤30 values — the
    exact dyadic EWMA ×2³⁰, mirroring ``analytics12._shift_sum``."""
    vals = list(vals)[-_WINDOW:]
    if not vals:
        return None
    L = len(vals)
    return sum(int(v) << (29 - L + i) for i, v in enumerate(vals, start=1))


def _croston_fn(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Process one key's micro-batch rows: (user_id, day_epoch, cents)
    demand days, possibly several batches' worth, in day order."""
    (user_id,) = key
    if state.hasTimedOut:  # pragma: no cover - NoTimeout configured
        state.remove()
        return
    rows = pd.concat(list(pdfs), ignore_index=True)
    # FEED CONTRACT (the standard watermark discipline): one demand
    # per (key, day), delivered in day order per key.  The fold is
    # FIRST-WINS everywhere — within a batch (drop_duplicates
    # keep='first') exactly as across batches (the last_day watermark
    # discards day <= last_day) — so identical feed content produces
    # identical state wherever the micro-batch boundary falls.  A
    # genuinely late EARLIER day cannot be folded into bounded state
    # (the gap sequence before the watermark is gone); it is discarded
    # like a replay, and a disordered feed therefore diverges from the
    # batch key — route late data through the batch readout, as with
    # every watermark-bounded operator here.
    rows = rows.sort_values("day_epoch", kind="mergesort").drop_duplicates(
        "day_epoch", keep="first"
    )
    sizes, gaps, last_day, n = (
        state.get if state.exists else ([], [], None, 0)
    )
    sizes, gaps = list(sizes), list(gaps)
    advanced = False
    for _, r in rows.iterrows():
        day, cents = int(r["day_epoch"]), int(r["cents"])
        if cents <= 0:
            continue  # the batch twin drops non-positive demand days
        if last_day is not None and day <= last_day:
            continue  # at/behind the watermark: replay or late — no-op
        if last_day is not None:
            gaps.append(day - last_day)
        sizes.append(cents)
        last_day, n = day, n + 1
        advanced = True
        sizes, gaps = sizes[-_WINDOW:], gaps[-_WINDOW:]
    if not advanced:
        return  # pure-replay batch: no state change, no duplicate emit
    state.update((sizes, gaps, last_day, n))
    z30 = shift_sum(sizes)
    p30 = shift_sum(gaps)
    rate = (float(z30) / float(p30)) if (z30 is not None and p30) else None
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_demands": [n],
            "z30": [z30],
            "p30": [p30],
            "croston_rate": [rate],
        }
    )


def croston_stateful(demands: DataFrame) -> DataFrame:
    """Attach the monitor to a streaming frame of demand-day rows
    (``user_id``, ``day_epoch`` int days, ``cents``).  Emits one
    refreshed forecast row per touched key per batch (append mode —
    downstream keeps the max-n_demands row per key, or sinks to an
    upsert store)."""
    return demands.groupBy("user_id").applyInPandasWithState(
        _croston_fn,
        outputStructType=CROSTON_OUT_SCHEMA,
        stateStructType=CROSTON_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
