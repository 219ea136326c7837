"""Timestamp normalization expressions.

The reference re-implements the same multi-format parser four times as a
row-at-a-time python function (``convert_datetime``,
``/root/reference/pipeline/hubspot_engagement/hubspot_engagement_pipeline.py:16-27``
and clones) and hand-rolls epoch-millis conversion
(``pipeline/hubspot_deal_logs/hubspot_deal_log_pipeline.py:90-92``) and a
hard-coded GMT+7 business-timezone shift
(``pipeline/hubspot_deal_logs/hubspot_deal_log_pipeline.py:37-41``).

Here each is a single Catalyst expression: vectorized, codegen'd, and
usable inside pushed-down predicates — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BUSINESS_TZ = "Asia/Bangkok"  # the reference's hard-coded GMT+7

# Formats tried by the reference's convert_datetime, in order
# (hubspot_engagement_pipeline.py:16-27): ISO-with-millis, ISO, epoch-ms.
_ISO_MS = "yyyy-MM-dd'T'HH:mm:ss.SSSX"
_ISO = "yyyy-MM-dd'T'HH:mm:ssX"


def parse_multi_format_ts(col: Column | str) -> Column:
    """C1 multi_format_timestamp_parse.

    try ISO-with-millis → ISO → epoch-millis integer, first hit wins —
    the exact fallback ladder of ``convert_datetime``, as one
    ``coalesce`` over ``try_to_timestamp``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.try_to_timestamp(c, F.lit(_ISO_MS)),
        F.try_to_timestamp(c, F.lit(_ISO)),
        F.timestamp_millis(c.try_cast("long")),
    )


def as_instant(col: Column | str) -> Column:
    """Normalize any timestamp flavor to ``TIMESTAMP`` (an instant).

    Parquet fixtures have carried ``ts`` three ways across driver rounds:
    nanos-as-bigint, ``TIMESTAMP``, and (today) ``TIMESTAMP_NTZ``
    (``timestamp[us]`` with no zone).  Epoch math (``unix_millis``,
    ``unix_seconds``) and BIGINT casts are TIMESTAMP-only, so every such
    site routes through here.  The session TZ is pinned UTC
    (:mod:`..session`), making the NTZ→TIMESTAMP cast value-preserving;
    on an already-TIMESTAMP column the cast is a no-op Catalyst removes.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp")


def epoch_millis_to_ts(col: Column | str) -> Column:
    """C2: ``pd.to_datetime(ms, unit='ms')`` ≙ ``timestamp_millis``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_millis(c.cast("long"))


def _truncating_div(us: Column, unit: int) -> Column:
    """Truncate-toward-zero integer division of an epoch-micros Column.

    Spark's ``unix_millis``/``unix_seconds`` FLOOR while DuckDB's
    ``epoch_ms``/``epoch()`` — and the reference's
    ``int(dt.timestamp() * 1000)`` — truncate toward zero; the two
    split by one unit on every pre-1970 instant with sub-unit residue
    (probed, round-10 pre-epoch sweep).  ``%`` truncates identically
    on both engines, so ``(us - us % unit) / unit`` is the portable
    form; the subtraction yields an exact multiple ≤ 2^53, making the
    double division and the long cast exact."""
    exact = us - us % F.lit(unit)
    return (exact / F.lit(unit)).cast("long")


def to_epoch_millis(col: Column | str) -> Column:
    """C2 reverse: ``int(dt.timestamp() * 1000)`` ≙ truncating div
    (NOT ``unix_millis``, which floors on pre-1970 instants)."""
    return _truncating_div(F.unix_micros(as_instant(col)), 1_000)


def to_epoch_seconds(col: Column | str) -> Column:
    """Epoch seconds for RANGE window frames and gap arithmetic —
    NTZ-tolerant replacement for the illegal ``ts.cast("long")``.

    FLOOR semantics (``unix_seconds``) on purpose, unlike
    :func:`to_epoch_millis`: second-GRAIN bucketing means every
    instant belongs to the second it falls in, pre-1970 included, and
    the oracle twins that emit second-grain values pin it
    (``event_burstiness`` floors each epoch before subtracting).
    The millis path truncates instead because the reference's
    ``int(dt.timestamp() * 1000)`` and DuckDB's ``epoch_ms`` both do —
    the two families are deliberately different and each is
    pre-epoch-sweep-verified against its own oracles."""
    return F.unix_seconds(as_instant(col))


def to_business_tz(col: Column | str, tz: str = BUSINESS_TZ) -> Column:
    """C3 timezone_shift_gmt7: UTC instant → wall-clock in business TZ.

    The reference adds a literal ``timedelta(hours=7)``; the engine uses a
    real zone id so DST-less-ness is a property of the zone, not the code.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.from_utc_timestamp(c, tz)


def truncate_seconds(col: Column | str) -> Column:
    """C4: ``x.replace(microsecond=0)`` ≙ ``date_trunc('second', x)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_trunc("second", c)
