"""The engine-exact value-domain quantile machinery — ONE home.

Every exact-percentile key builds the same two pieces over a
``(partition…, value, c)`` count grain:

* :func:`cumulative_value_histogram` — running and total counts via
  value-ordered windows BOUNDED BY THE VALUE DOMAIN (distinct values,
  never row counts — the discipline that keeps these windows safe at
  any data scale);
* :func:`rank_rule_pct` — the integer rank rule ``cum·100 ≥ p·total``
  (smallest value whose cumulative count reaches the percentile),
  which is engine-exact: no float percentile semantics, so Spark and
  the DuckDB oracle can never disagree.

Callers: ``order_gap_percentiles`` (analytics5),
``funnel_conversion_lag_percentiles`` / ``iqr_outlier_audit``
(analytics9), ``order_cycle_time_percentiles`` (analytics16).  A
tie/rounding change lands in all of them at once or not at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cumulative_value_histogram(
    grain: DataFrame,
    value_col: str,
    partition_cols: tuple[str, ...] = (),
    count_col: str = "c",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Add ``cum`` (running count in value order) and ``total`` to a
    (partition…, value, count) grain; ``carry_cols`` ride along
    untouched (e.g. a bucket grid's min/max range columns)."""
    w_cum = (
        Window.partitionBy(*partition_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy(*partition_cols)
    return grain.select(
        *partition_cols,
        value_col,
        count_col,
        *carry_cols,
        F.sum(count_col).over(w_cum).alias("cum"),
        F.sum(count_col).over(w_tot).alias("total"),
    )


def rank_rule_pct(p: int, value: Column | str) -> Column:
    """Aggregate: the smallest value/expression with
    ``cum·100 ≥ p·total``.  ``value`` may be a column name or a
    derived Column (e.g. a histogram bucket's upper edge)."""
    v = F.col(value) if isinstance(value, str) else value
    return F.min(
        F.when(F.col("cum") * 100 >= F.lit(p) * F.col("total"), v)
    )
