"""Type-2 slowly-changing-dimension history builder.

The reference's deal-log pipeline materializes an SCD2-ish change log —
property-version arrays exploded into versioned rows
(``/root/reference/pipeline/hubspot_deal_logs/hubspot_deal_log_pipeline.py:53-89``)
— but never closes intervals.  ``scd2_collapse`` is the full warehouse
form: collapse an update stream into one row per state *change* with
``[valid_from, valid_to)`` intervals and a current-row flag.

Scale: one shuffle.  Both window passes (change detection, then
interval close-out) partition on the same key, and Catalyst tracks
partitioning/ordering through the intermediate filter, so the second
window adds no exchange — verify with ``.explain``: a single Exchange
hashpartitioning(key) feeds both WindowExec nodes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_collapse(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """One history row per attribute change.

    ``tiebreak_col`` makes the per-key ordering total when ``ts_col``
    has duplicates — without it the collapse is nondeterministic under
    ties (Spark and any oracle may disagree on which duplicate "wins").
    Attribute comparison is null-safe: NULL → value and value → NULL
    both count as changes.
    """
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)

    changed: Column = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    is_first = F.row_number().over(w) == 1

    kept = df.withColumn("__chg", is_first | changed).filter(F.col("__chg")).drop("__chg")

    w2 = Window.partitionBy(key_col).orderBy(*order)
    return kept.select(
        key_col,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )
