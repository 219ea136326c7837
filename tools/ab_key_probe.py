#!/usr/bin/env python
"""Interleaved A/B of one registry key under alternating session confs.

The box's same-code bench band spans 25%+ (PERFORMANCE.md drift notes),
so single floors cannot attribute a delta to code or config.  This
probe alternates two conf arms in fresh subprocesses within the same
minutes and compares their per-arm floors — environment drift hits both
arms equally, so a reproducible gap is attributable.

Usage:
  SPARK_GRAFT_CPUS=32 python tools/ab_key_probe.py KEY SF_DIR REPS \
      "k=v[,k=v...]" "k=v[,k=v...]"

Each subprocess: warm once at sf0.001, then best-of-3 timed .count().
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
_MARK = "ABPROBE_RESULT "


def run_one(key: str, sf_dir: str, conf_str: str) -> int:
    from data_pipeline_bigquery_spark.queries import registry
    from data_pipeline_bigquery_spark.session import get_spark

    conf = dict(kv.split("=", 1) for kv in conf_str.split(",")) if conf_str else {}
    spark = get_spark(app_name="ab_key_probe", extra_conf=conf)
    reg = registry()
    warm = "/root/testdata/sf0.001"
    reg[key].fn(spark, warm if os.path.isdir(warm) else sf_dir).count()
    samples = []
    for _ in range(3):
        t0 = time.time()
        reg[key].fn(spark, sf_dir).count()
        samples.append(round(time.time() - t0, 3))
    print(_MARK + json.dumps({"conf": conf_str, "samples": samples}))
    return 0


def main() -> int:
    if sys.argv[1:2] == ["--one"]:
        return run_one(sys.argv[2], sys.argv[3], sys.argv[4])
    key, sf_dir, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    arms = [sys.argv[4], sys.argv[5]]
    results: dict[str, list[list[float]]] = {a: [] for a in arms}
    for i in range(reps):
        for arm in arms:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", key, sf_dir, arm],
                capture_output=True, text=True, cwd=HERE,
            )
            line = next(
                (ln for ln in proc.stdout.splitlines() if ln.startswith(_MARK)), None
            )
            if line is None:
                print(f"rep {i} arm {arm!r}: FAILED rc={proc.returncode}", flush=True)
                print("\n".join((proc.stderr or "").splitlines()[-6:]), flush=True)
                continue
            r = json.loads(line[len(_MARK):])
            results[arm].append(r["samples"])
            print(f"rep {i} arm {arm!r}: {r['samples']} (best {min(r['samples'])})",
                  flush=True)
    for arm in arms:
        bests = [min(s) for s in results[arm]]
        allv = [v for s in results[arm] for v in s]
        if bests:
            print(f"ARM {arm!r}: floor={min(bests)} per-rep bests={bests} "
                  f"median-all={sorted(allv)[len(allv) // 2]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
