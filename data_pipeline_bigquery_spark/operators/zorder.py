"""Z-order (Morton-curve) layout for multi-column data skipping.

Single-key range clustering (``compact_lake(sort_col=...)``) makes
row-group min/max stats an index on ONE column; queries filtering the
second column still scan everything.  Interleaving the bits of several
keys orders rows along a space-filling curve, so every output file
covers a tight hyper-rectangle and min/max stats prune on EVERY
z-ordered column at once — the layout trick behind Delta/Iceberg
``OPTIMIZE ZORDER BY``.

Implementation is pure Catalyst arithmetic: one stats pass (min/max per
column, a scalar aggregate), linear scale to ``bits``-bit integers, bit
interleave as a single codegen'd expression, then
``repartitionByRange`` + in-partition sort on the curve position.  Two
jobs, one shuffle — the same cost as a plain sorted rewrite.

Linear min/max scaling is skew-sensitive (a heavy hitter compresses the
rest of the range); for skewed columns substitute rank-based scaling
(percent_rank windows) at the cost of one extra shuffle per column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    n_files: int,
    bits: int = 16,
) -> DataFrame:
    """Return ``df`` re-laid-out along the Morton curve of ``cols``,
    range-partitioned into ``n_files`` splits, curve column dropped.
    Write the result with one file per partition to get skippable
    files."""
    stats = df.agg(
        *[F.min(c).alias(f"mn_{c}") for c in cols],
        *[F.max(c).alias(f"mx_{c}") for c in cols],
    ).first()
    top = (1 << bits) - 1

    scaled = []
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        span = (mx - mn) or 1
        scaled.append(
            f"cast(least(greatest((cast(`{c}` as double) - {mn}) / {span}, 0.0d), 1.0d)"
            f" * {top} as bigint)"
        )
    # interleave: bit b of column i lands at curve bit b*len(cols)+i
    terms = [
        f"(((({s}) >> {b}) & 1) << {b * len(cols) + i})"
        for i, s in enumerate(scaled)
        for b in range(bits)
    ]
    z = F.expr(" | ".join(terms))

    return (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
