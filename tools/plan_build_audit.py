#!/usr/bin/env python
"""Per-key driver plan-build vs execution split for the bench headliners
(r13 VERDICT #8: "audit per-key plan reuse across the bench's 5 warm
runs").

The bench's timed region is ``reg[key].fn(spark, sf_dir).count()`` — it
rebuilds the DataFrame (py4j Column chatter + analysis) on every one of
the 5 warm runs.  This audit separates, warm (after a full sf0.001
pre-pass and one untimed sf-dir run):

  * build_ms — time for ``fn(spark, sf_dir)`` alone (driver-side);
  * exec_ms  — time for ``.count()`` on a pre-built frame;

best-of-N each, interleaved.  A key whose build_ms is a large share of
(build+exec) is driver-bound: the fix is fewer py4j RTTs / cached
catalog metadata, not shuffle work.

Usage: SPARK_GRAFT_CPUS=32 python tools/plan_build_audit.py [SF_DIR] [N]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from bench import BENCH_QUERIES

    from data_pipeline_bigquery_spark.queries import registry
    from data_pipeline_bigquery_spark.session import get_spark

    spark = get_spark(app_name="plan_build_audit")
    reg = registry()
    warm = "/root/testdata/sf0.001"
    if not os.path.isdir(warm):
        warm = sf_dir
    for key in BENCH_QUERIES:
        reg[key].fn(spark, warm).count()

    out = {}
    for key in BENCH_QUERIES:
        reg[key].fn(spark, sf_dir).count()  # untimed warm at the target dir
        builds, execs = [], []
        for _ in range(reps):
            t0 = time.monotonic()
            df = reg[key].fn(spark, sf_dir)
            t1 = time.monotonic()
            df.count()
            t2 = time.monotonic()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        b, e = min(builds), min(execs)
        out[key] = {"build_ms": round(b * 1000), "exec_ms": round(e * 1000),
                    "build_share": round(b / (b + e), 2) if b + e else 0}
        print(f"{key:35s} build {b*1000:7.0f} ms  exec {e*1000:7.0f} ms  "
              f"share {out[key]['build_share']:.2f}", flush=True)
    print(json.dumps(out))
    with open("/tmp/plan_build_audit.json", "w") as fh:
        json.dump({"sf_dir": sf_dir, "reps": reps, "keys": out}, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
