"""As-of (backward) join — align each left row with the most recent
right row at or before its timestamp, per key.

The reference has no as-of join (SURVEY §2.4: every reference join is a
small equi-join), but event/feature alignment is core to a training-data
pipeline, and Spark has no built-in ASOF JOIN.  A pandas
``merge_asof``-per-group would serialize every row through Python; the
scalable Spark-native form is the *union trick*:

    union(left tagged 1, right tagged 0)
    → window per key ordered by (ts, tag)
    → last(right value, ignorenulls) over rows unbounded-preceding
    → keep tag 1

One shuffle (the window), no Python, no row explosion — right rows at
ts == left ts sort first, so semantics are ``left.ts >= right.ts``
(DuckDB/pandas ``direction='backward'``, inclusive).

Determinism: if the right side can hold several rows per (key, ts),
pre-aggregate it — ``last`` between equal sort keys is tie-ambiguous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.functions.timestamps import to_epoch_seconds

_TAG = "__asof_tag"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    value_cols: list[str],
    tolerance_s: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Append ``asof_<value_col>`` columns (and ``asof_ts``) to ``left``:
    values from the latest ``right`` row with ``right.ts <= left.ts``
    (``direction="backward"``) or the EARLIEST right row with
    ``right.ts >= left.ts`` (``direction="forward"`` — the
    time-to-next-event alignment), for the same ``on`` key, or NULL if
    none (left-join semantics).  Both directions are inclusive at
    equal timestamps, matching pandas ``merge_asof``.

    ``tolerance_s``: max allowed |staleness| in seconds — matches
    further away are nulled out (pandas ``merge_asof(tolerance=...)``).

    Forward is the mirrored union trick: the per-key window orders by
    ``(ts, tag DESC)`` so an equal-ts right row sorts AFTER the left
    row (inside its following frame), and ``first(ignorenulls)`` over
    ``[current, unbounded following]`` picks the next right value —
    still one shuffle, no Python.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    lhs = left.withColumn(_TAG, F.lit(1))
    # the whole matched row travels as ONE struct (non-null for every
    # right row, even when an individual value is NULL): picking the
    # struct with first/last(ignorenulls) selects ts AND values from
    # the SAME matched row — per-column picks would skip a NULL value
    # and take it from a different (further) row, diverging from the
    # pandas merge_asof contract
    rhs = right.select(
        on,
        ts_col,
        F.struct(
            F.col(ts_col).alias("__rts"),
            *[F.col(c).alias(f"__asof_{c}") for c in value_cols],
        ).alias("__asof_payload"),
    ).withColumn(_TAG, F.lit(0))
    both = lhs.unionByName(rhs, allowMissingColumns=True)

    if direction == "backward":
        w = (
            Window.partitionBy(on)
            .orderBy(ts_col, _TAG)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        payload = F.last("__asof_payload", ignorenulls=True).over(w)
        staleness = lambda m: to_epoch_seconds(ts_col) - to_epoch_seconds(m)  # noqa: E731
    else:
        w = (
            Window.partitionBy(on)
            .orderBy(F.col(ts_col).asc(), F.col(_TAG).desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        payload = F.first("__asof_payload", ignorenulls=True).over(w)
        staleness = lambda m: to_epoch_seconds(m) - to_epoch_seconds(ts_col)  # noqa: E731

    matched_ts = payload["__rts"]
    fresh = (
        F.lit(True)
        if tolerance_s is None
        else (staleness(matched_ts) <= tolerance_s)
    )
    out = both.withColumn("asof_ts", F.when(fresh, matched_ts))
    for c in value_cols:
        out = out.withColumn(
            f"asof_{c}",
            F.when(fresh, payload[f"__asof_{c}"]),
        )
    return out.filter(F.col(_TAG) == 1).drop(_TAG, "__asof_payload")
