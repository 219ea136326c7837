"""Streaming z-score anomaly monitor — per-key running mean/variance
with anomalies emitted as they happen.

The ops-monitoring companion to the batch drift family
(`anomaly_days_mad`, `value_drift_ks`): where those compare whole
distributions after the fact, this flags the INDIVIDUAL event whose
value sits more than ``threshold`` standard deviations from the running
mean of its key's PRIOR events — the alert you want while the stream is
live, not at end of day.

Two forms, one semantics:

- :func:`zscore_anomalies` — the batch form: running prior-event count/
  sum/sum-of-squares via one ordered window per key, pure Catalyst
  (registered as ``zscore_anomaly_events`` with a DuckDB oracle; the
  arithmetic is division/sqrt only, so the doubles hash-match).
- :func:`anomaly_stateful` — the Structured Streaming form via
  ``applyInPandasWithState``: state per key is THREE numbers
  (n, Σv, Σv²) regardless of stream volume — the Welford-style
  accumulator — so state is O(keys), never O(events).  Each batch's
  events are processed in event-time order and scored against the state
  as of their arrival, exactly like the batch window.

At 100 TB/day: the stateful form shuffles each micro-batch once on the
key; the state store holds 24 bytes of numbers per key; emission is
append-mode anomalies only (sparse), so downstream sinks see alerts,
not traffic.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEFAULT_THRESHOLD = 3.0
DEFAULT_MIN_N = 30


def zscore_anomalies(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_cols: tuple[str, ...] = ("event_id",),
    threshold: float = DEFAULT_THRESHOLD,
    min_n: int = DEFAULT_MIN_N,
) -> DataFrame:
    """Batch form: every event scored against the running mean/stddev of
    its key's strictly-prior events (population variance,
    Σv²/n − (Σv/n)²).  One ordered window per key — a single exchange
    on the key, no self-joins.

    The accumulator runs on INTEGER CENTS, not raw doubles: windowed
    float sums are summation-order-dependent (DuckDB's window engine
    sums via segment trees, Spark sequentially — they differ in the
    last ulp), while integer sums are exact in any order, so the z
    doubles derived from them hash-match across engines.  The cents
    quantization also bounds Σc² growth predictably; at ~10⁹ events
    per key the Σc² accumulator approaches int64 range — cap window
    length or rescale units there."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, *id_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    scored = (
        df.withColumn("__c", c)
        .withColumn("__n", F.count("__c").over(w))
        .withColumn("__s", F.sum("__c").over(w))
        .withColumn("__sq", F.sum(F.col("__c") * F.col("__c")).over(w))
        .filter(F.col("__n") >= min_n)
        .withColumn("__mean", F.col("__s").cast("double") / F.col("__n").cast("double"))
        .withColumn(
            "__var",
            F.col("__sq").cast("double") / F.col("__n").cast("double")
            - F.col("__mean") * F.col("__mean"),
        )
        .filter(F.col("__var") > 0)
        .withColumn(
            "z",
            (F.col("__c").cast("double") - F.col("__mean"))
            / F.sqrt(F.col("__var")),
        )
    )
    return scored.filter(F.abs(F.col("z")) >= threshold).select(
        *id_cols, key_col, ts_col, value_col, "z"
    )


ANOMALY_STATE_SCHEMA = "n bigint, s bigint, sq bigint"
ANOMALY_OUT_SCHEMA = (
    "event_id bigint, event_type string, ts timestamp, value double, z double"
)


def _anomaly_fn(threshold: float, min_n: int):
    import math

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        if state.hasTimedOut:  # pragma: no cover - NoTimeout configured
            state.remove()
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        n, s, sq = state.get if state.exists else (0, 0, 0)
        out = {"event_id": [], "event_type": [], "ts": [], "value": [], "z": []}
        for _, r in rows.iterrows():
            v = float(r["value"])
            # same integer-cents accumulator as the batch window, so the
            # emitted z agrees bit-for-bit with `zscore_anomalies`
            c = math.floor(v * 100 + 0.5)
            if n >= min_n:
                mean = float(s) / float(n)
                var = float(sq) / float(n) - mean * mean
                if var > 0:
                    z = (float(c) - mean) / math.sqrt(var)
                    if abs(z) >= threshold:
                        out["event_id"].append(int(r["event_id"]))
                        out["event_type"].append(event_type)
                        out["ts"].append(r["ts"])
                        out["value"].append(v)
                        out["z"].append(z)
            n, s, sq = n + 1, s + c, sq + c * c
        state.update((n, s, sq))
        yield pd.DataFrame(out)

    return fn


def anomaly_stateful(
    events: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
    min_n: int = DEFAULT_MIN_N,
) -> DataFrame:
    """Streaming form: ``events`` is a streaming DataFrame with
    ``event_id``/``event_type``/``ts``/``value``.  Emits anomalous
    events in append mode; state per key is (n, Σv, Σv²) — O(keys).

    No state timeout: unlike sessions, the accumulator has no open/
    closed lifecycle, and evicting it would forget the baseline.  Keys
    with bounded cardinality (event types, service names, device
    models) are the intended grain; for unbounded keys compose with a
    key-capping filter upstream."""
    return events.groupBy("event_type").applyInPandasWithState(
        _anomaly_fn(threshold, min_n),
        outputStructType=ANOMALY_OUT_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
