"""Output-boundary TIMESTAMP → TIMESTAMP_NTZ pin (round 11).

PySpark's ``collect()`` renders instant-semantics TIMESTAMP columns in
the PYTHON PROCESS's local timezone, not the pinned UTC session TZ —
under TZ=Pacific/Chatham, 45 of 351 registry keys hashed differently
than the DuckDB oracle's immovable tz-naive timestamps (probe: UTC
noon collected as 00:45 next day).  ``registry()`` therefore casts
every top-level timestamp output to TIMESTAMP_NTZ (the UTC wall clock
under the pinned session), which collects identically in every process
TZ.  The cross-TZ proof itself needs a separate JVM per TZ and lives in
the invariance sweep (PERFORMANCE.md round-11); this pin keeps the
boundary from silently disappearing.
"""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from data_pipeline_bigquery_spark.queries import registry, registry_modules
from tests.conftest import SF_DIR

# keys whose RAW module fn emits instant-semantics TIMESTAMP — one per
# emitting family (scan passthrough, window op, max-agg cursor, tz op)
_TS_KEYS = (
    "max_cursor",
    "timezone_shift_truncate",
    "sessionize_events",
    "event_scan_filtered_ordered",
)


def _raw_queries():
    merged = {}
    for mod in registry_modules():
        merged.update(mod.QUERIES)
    return merged


def test_registry_boundary_converts_all_timestamps(spark):
    reg = registry()
    raw = _raw_queries()
    for key in _TS_KEYS:
        raw_df = raw[key].fn(spark, SF_DIR)
        assert any(
            isinstance(f.dataType, T.TimestampType)
            for f in raw_df.schema.fields
        ), f"{key} no longer emits TIMESTAMP — pick another pin key"
        out = reg[key].fn(spark, SF_DIR)
        bad = [
            f.name
            for f in out.schema.fields
            if isinstance(f.dataType, T.TimestampType)
        ]
        assert not bad, f"{key}: TIMESTAMP leaked through the boundary: {bad}"
        # values are the UTC wall clock — bit-identical to the raw
        # collect under this UTC test session
        assert sorted(map(tuple, out.collect())) == sorted(
            map(tuple, raw_df.collect())
        )


def _walk(dt: T.DataType):
    yield dt
    if isinstance(dt, T.StructType):
        for f in dt.fields:
            yield from _walk(f.dataType)
    elif isinstance(dt, T.ArrayType):
        yield from _walk(dt.elementType)
    elif isinstance(dt, T.MapType):
        yield from _walk(dt.keyType)
        yield from _walk(dt.valueType)


@pytest.mark.slow  # registry-WIDE schema audit (~48 s): analyzes all 363 plans
def test_no_registry_key_emits_instant_timestamp(spark):
    """Registry-wide schema audit: no TIMESTAMP escapes at ANY nesting
    depth (the boundary casts top-level columns; this proves no key
    emits a NESTED instant timestamp the cast would miss).  Cheap —
    plan analysis only, no execution."""
    leaks = []
    for name, spec in sorted(registry().items()):
        df = spec.fn(spark, SF_DIR)
        for f in df.schema.fields:
            if any(isinstance(d, T.TimestampType) for d in _walk(f.dataType)):
                leaks.append(f"{name}.{f.name}")
    assert not leaks, f"instant TIMESTAMP at the driver boundary: {leaks}"
