#!/usr/bin/env python
"""Oversized-AQE-broadcast detector over the query registry.

AQE's pre-execution size estimate counts ROWS, not array payloads, so
it can promote a join against an array-heavy frame to broadcast: a
100k-row frame of ~300-element string arrays was estimated 31 MiB,
materialized 1028 MiB, and cost a ~GB single-threaded broadcast build —
and on a real cluster that broadcast ships to EVERY executor (the
round-11 `minhash_estimate_calibration` find; fixed with
``shuffle_hash`` hints, `queries/analytics15.py`).

This runner EXECUTES each key (AQE's final plan only exists after
execution), captures the formatted plan, and flags any
``BroadcastQueryStage`` whose MATERIALIZED ``sizeInBytes`` exceeds the
threshold.  Static plan audits cannot see this — the promotion happens
at runtime from runtime statistics.

Usage:
    SPARK_GRAFT_CPUS=32 python tools/broadcast_audit.py \
        [sf_dir] [threshold_mib] [key1,key2,...]
    # defaults: /root/testdata/sf0.01, 50 MiB, full registry

Exit 1 if anything is flagged.  Threshold note: at sf0.01 the known-bad
case materialized ~100 MiB (10× that at sf0.1), so 50 MiB at sf0.01
catches the class with headroom; legitimate broadcasts here (dims,
centroid/query frames, semi-join key sets) stay ≤ ~17 MiB even at
sf0.1.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

_UNIT = {"B": 1 / (1024 * 1024), "KiB": 1 / 1024, "MiB": 1.0, "GiB": 1024.0}


def broadcast_mib(df) -> list[float]:
    """Execute ``df`` and return the materialized MiB of every
    BroadcastQueryStage in its final adaptive plan."""
    df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return [
        float(v) * _UNIT[u]
        for v, u in re.findall(
            r"BroadcastQueryStage.*?sizeInBytes=([\d.]+) (B|KiB|MiB|GiB)",
            buf.getvalue(),
        )
    ]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 50.0
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None

    from data_pipeline_bigquery_spark.queries import registry
    from data_pipeline_bigquery_spark.session import get_spark

    spark = get_spark(app_name="broadcast_audit")
    reg = registry()
    keys = only or sorted(reg)
    print(f"{len(keys)} keys at {sf_dir}, threshold {threshold} MiB", flush=True)
    flagged: list[tuple[str, float]] = []
    for i, k in enumerate(keys):
        t0 = time.monotonic()
        try:
            sizes = broadcast_mib(reg[k].fn(spark, sf_dir))
        except Exception as exc:  # record, keep auditing
            print(f"ERR      {k}: {type(exc).__name__}: {exc}"[:200], flush=True)
            flagged.append((k, -1.0))
            continue
        big = [s for s in sizes if s >= threshold]
        if big:
            print(
                f"FLAGGED  {k}: broadcast {max(big):.0f} MiB materialized "
                f"(all stages: {[round(s, 1) for s in sizes]})",
                flush=True,
            )
            flagged.append((k, max(big)))
        if (i + 1) % 50 == 0:
            print(f"  {i + 1}/{len(keys)} audited", flush=True)
        del t0
    print(f"{'FAIL' if flagged else 'OK'}: {len(flagged)} flagged of {len(keys)}")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
