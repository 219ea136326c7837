#!/usr/bin/env python
"""Spark-free box-health probe: quantifies the environment degradation
mode (high system-CPU / steal) that inflates bench readings on this
host.  Three one-second-scale microbenchmarks:

  * cpu:   single-thread pure-Python hash loop (user-CPU bound)
  * spawn: subprocess fork/exec round-trips (syscall/scheduler bound)
  * mt:    32-thread busy loop wall time (steal / oversubscription)

Prints one JSON line; healthy-box reference values are recorded in
OPTIMIZATION_r13.md the first time the box reads quiet.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time


def cpu_score() -> float:
    t0 = time.perf_counter()
    h = 0
    for i in range(2_000_000):
        h = (h * 31 + i) & 0xFFFFFFFF
    return round(time.perf_counter() - t0, 3)


def spawn_score(n: int = 20) -> float:
    t0 = time.perf_counter()
    for _ in range(n):
        subprocess.run([sys.executable, "-c", "pass"], capture_output=True)
    return round((time.perf_counter() - t0) / n, 4)


def mp_score(procs: int = 32) -> float:
    """32 concurrent single-core processes, each the cpu loop: wall
    time ≈ cpu_1t on a healthy 32-core box; inflation = contention,
    steal, or scheduler degradation (processes, not threads — the GIL
    would serialize threads and measure nothing)."""
    code = (
        "h=0\n"
        "for i in range(2_000_000): h=(h*31+i)&0xFFFFFFFF\n"
    )
    t0 = time.perf_counter()
    ps = [
        subprocess.Popen([sys.executable, "-c", code]) for _ in range(procs)
    ]
    for p in ps:
        p.wait()
    return round(time.perf_counter() - t0, 3)


def main() -> int:
    load1 = open("/proc/loadavg").read().split()[0]
    print(
        json.dumps(
            {
                "cpu_1t_sec": cpu_score(),
                "spawn_sec_per_proc": spawn_score(),
                "mp32_sec": mp_score(),
                "load1": float(load1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
