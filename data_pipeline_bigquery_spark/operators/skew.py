"""Skew-handling operators.

The reference never needs these (single pandas process), but at 100 TB
a hot key (one customer with 10% of all events) stalls the one reducer
that owns it.  Two standard remedies, expressed so results are
identical to the naive plan:

* :func:`salted_aggregate` — two-phase aggregation: partial aggregate
  on ``(keys, salt)``, final aggregate on ``keys``.  Works for any
  algebraic aggregate (sum/count/min/max); AQE's skew handling covers
  joins, but aggregation skew needs this explicit split.
* :func:`salted_join` — replicate the small side ``salt_n`` ×, salt the
  big side deterministically by a unique column's hash; the hot key's
  rows spread over ``salt_n`` reducers.

Salt is ``pmod(xxhash64(unique_col), n)`` — deterministic, so task
retries and reruns produce identical partitioning (no ``rand()``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def _salt(unique_col: str, n: int) -> Column:
    return F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, str],
    count_alias: str | None = None,
    salt_unique_col: str | None = None,
    salt_n: int = 16,
) -> DataFrame:
    """GroupBy ``keys`` with sum/count aggregates, routed through a salt
    stage.  ``sums`` maps input column → output alias.

    Phase 1 reduces each (key, salt) partition map-side; phase 2 reduces
    ``salt_n`` small rows per key — the hot key's work is spread across
    ``salt_n`` reducers instead of one.
    """
    salt = _salt(salt_unique_col, salt_n) if salt_unique_col else F.pmod(
        F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id()), F.lit(salt_n)
    )
    staged = df.withColumn(SALT_COL, salt)
    partial_aggs = [F.sum(c).alias(f"__p_{a}") for c, a in sums.items()]
    if count_alias:
        partial_aggs.append(F.count(F.lit(1)).alias("__p_cnt"))
    partial = staged.groupBy(*keys, SALT_COL).agg(*partial_aggs)
    final_aggs = [F.sum(f"__p_{a}").alias(a) for a in sums.values()]
    if count_alias:
        final_aggs.append(F.sum("__p_cnt").alias(count_alias))
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_unique_col: str,
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``left`` is skewed on ``on``: right side is
    replicated ``salt_n``× with an explicit salt id, left rows pick a
    deterministic salt — every (key, salt) bucket is ~1/salt_n of the
    hot key.  Result is row-identical to the unsalted join."""
    salts = right.sparkSession.range(salt_n).select(F.col("id").cast("int").alias(SALT_COL))
    right_rep = right.crossJoin(F.broadcast(salts))
    left_s = left.withColumn(SALT_COL, _salt(left_unique_col, salt_n).cast("int"))
    out = left_s.join(right_rep, [on, SALT_COL], how)
    return out.drop(SALT_COL)
