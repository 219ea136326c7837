"""Incremental rollup maintenance (hypertable-style continuous
aggregate): keep a materialized grouped rollup current by merging the
new batch's PARTIAL aggregates into the stored ones — never rescanning
history.

Works for any distributive/algebraic aggregate carried as partials
(count, sum; avg = sum/count at read time; min/max via the same merge
with min/max).  At 100 TB the economics are the whole point: the batch
aggregates map-side to O(touched groups) rows, the merge shuffles
O(groups) rows, and the historical fact data is never read again.

The registry query proves the algebra: maintained rollup ==
full-recompute oracle over history ∪ batch, value-hash exact (sums
carried as DECIMAL so partial-aggregation order can't drift).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def partial_rollup(
    df: DataFrame,
    keys: Sequence[str],
    sums: Mapping[str, Column | str],
    count_alias: str = "n_rows",
) -> DataFrame:
    """Aggregate a fact slice to mergeable partials: one row per key
    combo with a row count and the requested sums."""
    aggs = [F.count(F.lit(1)).alias(count_alias)] + [
        F.sum(col).alias(alias) for alias, col in sums.items()
    ]
    return df.groupBy(*keys).agg(*aggs)


def merge_rollups(
    existing: DataFrame | None,
    batch_partial: DataFrame,
    keys: Sequence[str],
    partial_cols: Sequence[str],
) -> DataFrame:
    """Merge partials: groups touched by both sides add component-wise;
    unmatched groups pass through.  ``existing=None`` bootstraps.  The
    union is of two already-aggregated inputs, so the merge shuffle
    moves O(groups) rows regardless of fact volume."""
    if existing is None:
        return batch_partial
    merged = existing.unionByName(batch_partial)
    return merged.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in partial_cols]
    )
