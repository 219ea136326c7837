#!/usr/bin/env python
"""Multi-decade scaling probe with per-stage attribution (r12 VERDICT #5).

Why this exists: the knn 61x step at sf10 was invisible at sf0.1/sf1 —
only a third decade exposed it.  This tool runs registry keys at a list
of SF dirs (fresh subprocess per (key, sf): long sessions inflate later
keys up to 5x — PERFORMANCE.md r10 methodology note) and records, per
run, the wall time, the OUTPUT volume, and a per-stage attribution from
the JVM AppStatusStore:

  * ``run_ms``  — executor task run time (includes Python-UDF wall time);
  * ``cpu_ms``  — JVM-side CPU; ``run_ms - cpu_ms`` is therefore the
    Python/IO share (the r12 knn adjudication's "19,802 task-s
    Python-side vs 210 s JVM" split, now scripted);
  * shuffle read/write bytes — the 100 TB bottleneck axis.

The sink CONSUMES every output column (xxhash64 over a struct of all
columns, summed) instead of ``count()``: count() lets Catalyst prune
the expensive expressions, silently profiling a cheaper plan
(PERFORMANCE.md r11 trap note).  The hash total doubles as a
cross-decade output fingerprint.

Usage:
    SPARK_GRAFT_CPUS=32 python tools/scaling_probe.py KEY1,KEY2 DIR1 DIR2 ...
      [--top N]          # stages kept per run, default 6
    python tools/scaling_probe.py --one KEY DIR [N]   # internal

Writes /tmp/scaling_probe.json; prints a markdown-ready summary table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

_MARK = "SCALEPROBE_RESULT "


def _stage_attribution(spark, top: int) -> list[dict]:
    """Top stages by executor run time from the in-process status store
    (works with spark.ui.enabled=false — no REST endpoint needed)."""
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    jvm = sc._jvm
    empty = jvm.java.util.ArrayList()
    darr = sc._gateway.new_array(jvm.double, 0)
    stages = store.stageList(empty, False, False, darr, jvm.java.util.ArrayList())
    rows = []
    for i in range(stages.size()):
        s = stages.apply(i)
        rows.append(
            {
                "stage": int(s.stageId()),
                "name": str(s.name())[:80],
                "run_ms": int(s.executorRunTime()),
                "cpu_ms": int(s.executorCpuTime()) // 1_000_000,
                "tasks": int(s.numCompleteTasks()),
                "shuffle_read_mb": int(s.shuffleReadBytes()) >> 20,
                "shuffle_write_mb": int(s.shuffleWriteBytes()) >> 20,
            }
        )
    rows.sort(key=lambda r: -r["run_ms"])
    total = {
        "run_ms": sum(r["run_ms"] for r in rows),
        "cpu_ms": sum(r["cpu_ms"] for r in rows),
        "shuffle_read_mb": sum(r["shuffle_read_mb"] for r in rows),
        "shuffle_write_mb": sum(r["shuffle_write_mb"] for r in rows),
        "n_stages": len(rows),
    }
    return [total] + rows[:top]


def run_one(key: str, sf_dir: str, top: int) -> int:
    from pyspark.sql import functions as F

    from data_pipeline_bigquery_spark.queries import registry
    from data_pipeline_bigquery_spark.session import get_spark

    spark = get_spark(app_name=f"scaling_probe_{key}")
    # time from fn construction: several keys do eager work while
    # building the frame (checkpoint cuts, artifact training) and the
    # sf1_probe baseline methodology counts that
    t0 = time.monotonic()
    df = registry()[key].fn(spark, sf_dir)
    # consume EVERY output column so Catalyst can't prune the work;
    # the row hash is reduced mod 1e9+7 BEFORE the sum — summing raw
    # xxhash64 longs overflows BIGINT under ANSI within ~2 rows
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(F.struct(*df.columns)) % F.lit(1_000_000_007)).alias("h"),
    ).collect()[0]
    sec = time.monotonic() - t0
    attribution = _stage_attribution(spark, top)
    print(
        _MARK
        + json.dumps(
            {
                "key": key,
                "sf_dir": sf_dir,
                "rows": int(row["n"]),
                "out_hash": int(row["h"] or 0),
                "sec": round(sec, 1),
                "stages": attribution,
            }
        )
    )
    return 0


def main() -> int:
    args = list(sys.argv[1:])
    if args[:1] == ["--one"]:
        return run_one(args[1], args[2], int(args[3]) if len(args) > 3 else 6)

    top = 6
    if "--top" in args:
        i = args.index("--top")
        if i + 1 >= len(args):
            print("usage: --top N (missing value)", file=sys.stderr)
            return 2
        top = int(args[i + 1])
        del args[i : i + 2]
    if len(args) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    keys = args[0].split(",")
    sf_dirs = args[1:]

    runs: list[dict] = []
    failures: list[str] = []
    for key in keys:
        for sf_dir in sf_dirs:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", key,
                 sf_dir, str(top)],
                capture_output=True, text=True, cwd=HERE,
            )
            line = next(
                (ln for ln in proc.stdout.splitlines() if ln.startswith(_MARK)),
                None,
            )
            if proc.returncode != 0 or line is None:
                tail = (proc.stderr or proc.stdout).strip().splitlines()[-8:]
                print(f"ERR    {key} @ {sf_dir}: rc={proc.returncode}\n  "
                      + "\n  ".join(tail), flush=True)
                failures.append(f"{key}@{sf_dir}")
                continue
            r = json.loads(line[len(_MARK):])
            runs.append(r)
            tot = r["stages"][0]
            py_ms = tot["run_ms"] - tot["cpu_ms"]
            print(
                f"ok     {key} @ {sf_dir}: {r['sec']}s rows={r['rows']:,} "
                f"taskrun={tot['run_ms'] / 1000:.0f}s jvmcpu={tot['cpu_ms'] / 1000:.0f}s "
                f"py/io={py_ms / 1000:.0f}s shufW={tot['shuffle_write_mb']}MB",
                flush=True,
            )

    with open("/tmp/scaling_probe.json", "w") as fh:
        json.dump({"runs": runs, "failures": failures}, fh, indent=1)

    # markdown summary: one row per key, one column pair per sf dir
    print("\n| key | " + " | ".join(f"{d} sec / rows" for d in sf_dirs) + " |")
    print("|---|" + "---|" * len(sf_dirs))
    for key in keys:
        cells = []
        for d in sf_dirs:
            m = next((r for r in runs if r["key"] == key and r["sf_dir"] == d), None)
            cells.append(f"{m['sec']} / {m['rows']:,}" if m else "ERR")
        print(f"| {key} | " + " | ".join(cells) + " |")
    print(f"\n{'FAIL' if failures else 'OK'}: {len(failures)} failure(s) "
          f"-> /tmp/scaling_probe.json")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
