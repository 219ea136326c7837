#!/usr/bin/env python
"""Quiet-floor bench protocol (r11 VERDICT #4).

Single bench readings on this box are a noisy instrument: round 11's
driver bench read +12.6% on provably unchanged headliner code, while
same-code session readings spanned 6.85-8.48 s.  The decision rule that
survives that band (PERFORMANCE.md r8/r11 variance notes):

  * run ``bench.py`` N times (default 3), each in a FRESH process
    (bench.py itself is best-of-5 warm per query inside one session);
  * report the MIN total (the "quiet floor") and the band (min-max);
  * flag a regression only when the quiet floor moves >10% on paths
    whose code actually changed — a single elevated reading is the
    environment, not the code.

Usage:
    SPARK_GRAFT_CPUS=32 python tools/bench_floor.py [N] [baseline_floor_sec]

Prints per-run totals, the floor, the band, and per-query floors;
writes /tmp/bench_floor.json.  With a ``baseline_floor_sec`` argument,
exits 1 if the floor regressed >10% above it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    baseline = float(sys.argv[2]) if len(sys.argv) > 2 else None

    totals: list[float] = []
    per_query: dict[str, list[float]] = {}
    for i in range(n):
        proc = subprocess.run(
            [sys.executable, os.path.join(HERE, "bench.py")],
            capture_output=True, text=True, cwd=HERE,
        )
        # bench.py's driver contract is ONE bare-JSON stdout line (no
        # marker prefix allowed), so identify the record by SHAPE: the
        # only parseable JSON object carrying the contract keys.  A
        # stray '{'-prefixed log line no longer mis-parses (r12 ADVICE).
        rec = None
        for ln in proc.stdout.splitlines():
            if not ln.startswith("{"):
                continue
            try:
                cand = json.loads(ln)
            except ValueError:
                continue
            if isinstance(cand, dict) and {"metric", "value", "queries"} <= set(cand):
                rec = cand
        if proc.returncode != 0 or rec is None:
            tail = (proc.stderr or proc.stdout).strip().splitlines()[-8:]
            print(f"run {i + 1}/{n}: bench.py failed rc={proc.returncode}\n  "
                  + "\n  ".join(tail), file=sys.stderr)
            return 2
        totals.append(rec["value"])
        for q, s in rec["queries"].items():
            per_query.setdefault(q, []).append(s)
        print(f"run {i + 1}/{n}: {rec['value']} s", flush=True)

    floor, band_hi = min(totals), max(totals)
    out = {
        "runs": totals,
        "floor": floor,
        "band": [floor, band_hi],
        "query_floors": {q: min(v) for q, v in sorted(per_query.items())},
    }
    with open("/tmp/bench_floor.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"floor {floor} s, band {floor}-{band_hi} s "
          f"({(band_hi / floor - 1) * 100:.0f}% spread) "
          f"-> /tmp/bench_floor.json")
    if baseline is not None and floor > baseline * 1.10:
        print(f"REGRESSION: floor {floor} > 1.10 x baseline {baseline}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
