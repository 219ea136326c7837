#!/usr/bin/env python
"""Pre-epoch timestamp parity sweep.

Every fixture timestamp is post-1970, so negative-epoch arithmetic —
``unix_micros(ts) div 86400000000`` day bucketing, ``%`` remainders in
day-of-week arithmetic, ``sequence()`` grids over negative day
numbers — has never been driven on both engines at once.  Probes show
Spark's ``div``/``%`` and DuckDB's ``//``/``%`` BOTH truncate toward
zero, so parity should hold; this sweep proves it corpus-wide by
SHIFTING every orders/lineitem/events timestamp back by a constant
number of days chosen so the corpus midpoint lands at 1970-01-01 —
half of every time series goes negative while every span (and so every
calendar-grid key's cost) stays identical.  Keys filtering on fixture
date literals go empty on the shifted corpus; empty-but-equal is a
vacuous pass and the daily/gapfill/sessionize/interarrival families
are the real subjects.

Usage: python tools/preepoch_corpus_sweep.py [out_dir]
Prints one line per key; exits 1 if any key diverges.
"""

from __future__ import annotations

import datetime as dt
import os
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

_EPOCH = dt.datetime(1970, 1, 1)

# every timestamp column per table (catalog normalizes all of them)
_TS_COLS = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
}


def _shift_days(src_path: str, cols: list[str]) -> "object":
    """Shift all ts columns back so the FIRST column's midpoint lands
    at the epoch; whole days only, so day boundaries stay aligned."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(src_path)
    # midpoint/shift arithmetic below assumes timestamp (datetime) or
    # nanos-as-int64 values; a date32 column yields datetime.date, where
    # .replace(tzinfo=None) and date-datetime subtraction both raise
    # (r10 ADVICE) — fail up front with the actual type, not mid-shift
    for col in cols:
        ftype = tbl.schema.field(col).type
        if not (pa.types.is_timestamp(ftype) or pa.types.is_integer(ftype)):
            raise TypeError(
                f"{src_path}:{col} is {ftype}; the pre-epoch shifter "
                "handles timestamp[*] and nanos-as-int64 columns only — "
                "extend _shift_days (date32 → datetime at midnight) "
                "before sweeping this fixture"
            )
    first = [v for v in tbl.column(cols[0]).to_pylist() if v is not None]
    lo, hi = min(first), max(first)
    if isinstance(lo, int):  # nanos-as-int64 fixtures
        mid = _EPOCH + dt.timedelta(microseconds=((lo + hi) // 2) / 1000)
    else:
        mid = lo + (hi - lo) / 2
    shift_days = (mid.replace(tzinfo=None) - _EPOCH).days
    delta_us = shift_days * 86_400_000_000
    for col in cols:
        vals = tbl.column(col).to_pylist()
        field = tbl.schema.field(col)
        if pa.types.is_integer(field.type):  # nanos as int64
            out = pa.array(
                [None if v is None else v - delta_us * 1000 for v in vals],
                field.type,
            )
        else:
            out = pa.array(
                [
                    None
                    if v is None
                    else v - dt.timedelta(microseconds=delta_us)
                    for v in vals
                ],
                field.type,
            )
        tbl = tbl.set_column(tbl.schema.get_field_index(col), col, out)
    return tbl


def select_keys(reg) -> list[str]:
    """The sweep's key set — ONE definition shared with the pinning
    test (tests/test_preepoch_corpus_sweep.py) so the suite can never
    drift from the documented runner."""
    return sorted(
        k
        for k, s in reg.items()
        if s.oracle
        and any(t in s.oracle.lower() for t in ("orders", "lineitem", "events"))
    )


def build_dir(base: str, sf_src: str) -> str:
    import pyarrow.parquet as pq

    from data_pipeline_bigquery_spark.catalog import FIXTURE_TABLES

    os.makedirs(base, exist_ok=True)
    for t in FIXTURE_TABLES:
        dst = os.path.join(base, f"{t}.parquet")
        if t in _TS_COLS:
            # unlink first: a pre-existing SYMLINK here (e.g. the dir was
            # built by another sweep) would make write_table follow it
            # and overwrite the shared source fixture in place
            if os.path.lexists(dst):
                os.unlink(dst)
            pq.write_table(
                _shift_days(os.path.join(sf_src, f"{t}.parquet"), _TS_COLS[t]),
                dst,
            )
        elif not os.path.lexists(dst):
            os.symlink(os.path.join(sf_src, f"{t}.parquet"), dst)
    return base


def main() -> int:
    sys.path.insert(0, os.path.join(HERE, "tests"))
    from oracle_compare import compare

    from data_pipeline_bigquery_spark.queries import registry
    from data_pipeline_bigquery_spark.session import get_spark

    out_dir = (
        sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="pre_sf_")
    )
    sf_src = os.environ.get("PRE_SF_SRC", "/root/testdata/sf0.001")
    d = build_dir(out_dir, sf_src)
    spark = get_spark(app_name="preepoch_corpus_sweep")
    reg = registry()
    keys = select_keys(reg)
    print(f"{len(keys)} timestamp-table keys against {d}", flush=True)
    bad = 0
    for k in keys:
        t0 = time.monotonic()
        try:
            problems = compare(reg[k].fn(spark, d), reg[k].oracle, d)
        except Exception as exc:
            problems = [f"{type(exc).__name__}: {exc}"[:400]]
        status = "OK" if not problems else "DIVERGES"
        print(f"{status:8s} {k:40s} {time.monotonic() - t0:5.1f}s", flush=True)
        for p in problems:
            print(f"         {p}", flush=True)
            bad += 1
    print(f"{'FAIL' if bad else 'OK'}: {bad} problem(s)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
