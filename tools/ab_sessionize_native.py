#!/usr/bin/env python
"""sessionize_events: window-function form vs native session_window form
(r13 VERDICT #4) — result-identity proof + interleaved A/B floors.

The candidate rewrite routes `session_aggregate` through Spark's native
``session_window`` aggregate and reconstructs the declared
``session_idx`` with a row_number over the (tiny) per-session rows.

Semantics trap this script exists to prove either way: the declared
form breaks on SECOND-FLOORED epoch arithmetic
(``unix_seconds(ts) - unix_seconds(prev) > 1800``) while
``session_window`` merges at full microsecond precision — on this
fixture every ts carries sub-second residue, so the native form must
run over ``date_trunc('second', ts)`` (aggregating min/max of the
ORIGINAL ts) to reproduce the declared row set bit-for-bit.

Checks, in order:
  1. exact row-set equality at sf0.001 / sf0.01 / sf0.1;
  2. equality on an adversarial boundary corpus (gaps exactly 1800 s,
     floored-vs-true straddles, duplicate timestamps, lone events);
  3. interleaved A/B: fresh-process best-of-N per arm at sf0.1.

Usage:  SPARK_GRAFT_CPUS=32 python tools/ab_sessionize_native.py [REPS]
        python tools/ab_sessionize_native.py --one {window|native} SF_DIR
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

_MARK = "ABSESS_RESULT "


def native_form(events, user_col="user_id", ts_col="ts", gap_minutes=30):
    """The candidate: native session_window over second-floored ts."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    gap = f"{gap_minutes * 60} seconds"
    agg = (
        events.withColumn("_ts_sec", F.date_trunc("second", F.col(ts_col)))
        .groupBy(user_col, F.session_window("_ts_sec", gap))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    w = Window.partitionBy(user_col).orderBy("session_start")
    return agg.select(
        user_col,
        (F.row_number().over(w) - F.lit(1)).cast("long").alias("session_idx"),
        "session_start",
        "session_end",
        "n_events",
    )


def window_form(events, gap_minutes=30):
    from data_pipeline_bigquery_spark.streaming.sessions import session_aggregate

    return session_aggregate(events, gap_minutes=gap_minutes)


def _events(spark, sf_dir):
    from pyspark.sql import functions as F

    from data_pipeline_bigquery_spark.catalog import load

    return load(spark, sf_dir, "events").select("user_id", "ts")


def check_equal(spark, events, label):
    a = sorted(map(tuple, window_form(events).collect()))
    b = sorted(map(tuple, native_form(events).collect()))
    ok = a == b
    print(f"  {label}: window={len(a)} rows, native={len(b)} rows, "
          f"{'IDENTICAL' if ok else 'MISMATCH'}")
    if not ok:
        sa, sb = set(a), set(b)
        for r in sorted(sa - sb)[:5]:
            print(f"    only-window: {r}")
        for r in sorted(sb - sa)[:5]:
            print(f"    only-native: {r}")
    return ok


def adversarial_corpus(spark):
    """Boundary cases: exact-1800s gaps (second-aligned and with
    sub-second residue on both sides of the floor), duplicate ts,
    lone events, multi-session users."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def t(sec, us=0):
        return base + dt.timedelta(seconds=sec, microseconds=us)

    rows = [
        # u1: gap exactly 1800s, second-aligned -> MERGE (floor diff 1800)
        (1, t(0)), (1, t(1800)),
        # u2: 1800.5s apart but floors differ by 1800 -> MERGE under
        # floored semantics (0.2 -> 1800.7)
        (2, t(0, 200_000)), (2, t(1800, 700_000)),
        # u3: 1799.5s apart but floors differ by 1801 -> BREAK under
        # floored semantics (0.7 -> 1800.2... floor 0 -> 1800) pick
        # (0.9 -> 1801.4): true gap 1800.5, floor diff 1801 -> BREAK
        (3, t(0, 900_000)), (3, t(1801, 400_000)),
        # u4: duplicate timestamps + a lone trailing session
        (4, t(10)), (4, t(10)), (4, t(10, 500_000)), (4, t(7200)),
        # u5: three sessions, unordered input
        (5, t(9000)), (5, t(0)), (5, t(4000)), (5, t(4100)),
        # u6: single event
        (6, t(42, 123_456)),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def run_one(form: str, sf_dir: str) -> int:
    from data_pipeline_bigquery_spark.session import get_spark

    spark = get_spark(app_name=f"ab_sessionize_{form}")
    build = native_form if form == "native" else window_form
    warm = "/root/testdata/sf0.001"
    build(_events(spark, warm if os.path.isdir(warm) else sf_dir)).count()
    samples = []
    for _ in range(3):
        t0 = time.monotonic()
        build(_events(spark, sf_dir)).count()
        samples.append(round(time.monotonic() - t0, 3))
    print(_MARK + json.dumps({"form": form, "best": min(samples),
                              "samples": samples}))
    return 0


def main() -> int:
    args = list(sys.argv[1:])
    if args[:1] == ["--one"]:
        return run_one(args[1], args[2])
    reps = int(args[0]) if args else 3

    from data_pipeline_bigquery_spark.session import get_spark

    spark = get_spark(app_name="ab_sessionize_equiv")
    print("result-identity:")
    ok = True
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = f"/root/testdata/{sf}"
        if os.path.isdir(d):
            ok &= check_equal(spark, _events(spark, d), sf)
    ok &= check_equal(spark, adversarial_corpus(spark), "adversarial boundary corpus")
    if not ok:
        print("MISMATCH -> native form NOT result-identical; do not route")
        return 1
    spark.stop()

    print(f"\ninterleaved A/B, {reps} fresh-process reps per arm, sf0.1:")
    floors = {"window": [], "native": []}
    for i in range(reps):
        for form in ("window", "native"):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", form,
                 "/root/testdata/sf0.1"],
                capture_output=True, text=True, cwd=HERE,
            )
            line = next((ln for ln in proc.stdout.splitlines()
                         if ln.startswith(_MARK)), None)
            if line is None:
                print(f"  rep{i} {form}: FAILED\n" +
                      "\n".join((proc.stderr or "").splitlines()[-5:]))
                continue
            r = json.loads(line[len(_MARK):])
            floors[form].append(r["best"])
            print(f"  rep{i} {form}: best {r['best']}s of {r['samples']}")
    summary = {f: min(v) if v else None for f, v in floors.items()}
    print(json.dumps({"floors": summary, "all": floors}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
