#!/usr/bin/env python
"""Interleaved code-arm A/B of bench.py (BASELINE.md protocol, r13/r14).

Alternates fresh bench.py processes between two CHECKOUT DIRECTORIES
within the same minutes, so environment drift hits both arms equally.
Per-arm per-query FLOORS are the comparison statistic — single totals
on this box swing ±25-50% (PERFORMANCE.md drift notes).

Usage:
    SPARK_GRAFT_CPUS=32 python tools/ab_bench_arms.py DIR_A DIR_B [REPS]

Prints per-rep totals and a final per-query floor table (A, B, delta).
Writes /tmp/ab_bench_arms.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_bench(cwd: str) -> dict | None:
    proc = subprocess.run(
        [sys.executable, os.path.join(cwd, "bench.py")],
        capture_output=True, text=True, cwd=cwd,
    )
    for ln in proc.stdout.splitlines():
        if not ln.startswith("{"):
            continue
        try:
            cand = json.loads(ln)
        except ValueError:
            continue
        if isinstance(cand, dict) and {"metric", "value", "queries"} <= set(cand):
            return cand
    print(f"  FAILED rc={proc.returncode}: "
          + "\n".join((proc.stderr or proc.stdout).splitlines()[-5:]), flush=True)
    return None


def main() -> int:
    dir_a, dir_b = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    arms = {"A": dir_a, "B": dir_b}
    runs: dict[str, list[dict]] = {"A": [], "B": []}
    for i in range(reps):
        for arm, cwd in arms.items():
            rec = run_bench(cwd)
            if rec:
                runs[arm].append(rec)
                print(f"rep {i} arm {arm} ({cwd}): total {rec['value']}", flush=True)
    floors: dict[str, dict[str, float]] = {}
    for arm in arms:
        per_q: dict[str, float] = {}
        for rec in runs[arm]:
            for q, v in rec["queries"].items():
                per_q[q] = min(per_q.get(q, 1e9), v)
        floors[arm] = per_q
    keys = sorted(set(floors["A"]) | set(floors["B"]))
    print(f"\n{'query':34s} {'A':>7s} {'B':>7s} {'delta':>8s}")
    sum_a = sum_b = 0.0
    for q in keys:
        a, b = floors["A"].get(q), floors["B"].get(q)
        if a is None or b is None:
            print(f"{q:34s} {a or '-':>7} {b or '-':>7}")
            continue
        sum_a += a
        sum_b += b
        print(f"{q:34s} {a:7.3f} {b:7.3f} {100 * (b - a) / a:+7.1f}%")
    if sum_a:
        print(f"{'SUM OF FLOORS':34s} {sum_a:7.3f} {sum_b:7.3f} "
              f"{100 * (sum_b - sum_a) / sum_a:+7.1f}%")
    with open("/tmp/ab_bench_arms.json", "w") as f:
        json.dump({"dirs": arms, "runs": runs, "floors": floors}, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
