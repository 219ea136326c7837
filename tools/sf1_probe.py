#!/usr/bin/env python
"""Scripted sf1 gate for the ANN/dedup heavy family (r11 VERDICT #1).

Why this exists: the round-11 PQ-encode bug (a two-parameter Spark
higher-order-function lambda silently received the ELEMENT INDEX as its
"captured" default) kept every sf0.001/sf0.01 gate green — recall tests,
oracle parity, the cache-equivalence pin — because the rerank-k shortlist
swallowed the small probed pools; at sf1 the pool is ~8k, recall
collapsed 0.90 → 0.125, and the gated contract output went EMPTY.  That
class of bug is invisible to every small-SF gate, so this probe runs the
heavy family at sf1 (10x id-shifted sf0.1, built by
``tools/make_scaled_sf.py``) and FAILS on:

  1. an EMPTY gated output (rows == 0) — the r11 bug's signature;
  2. a key erroring; or
  3. timing drift beyond ``--drift`` x (default 3) of the recorded
     fresh-session sf1 baseline below (PERFORMANCE.md r11/r12 tables;
     the box's sf1 noise band is +/-40%, so 3x means plan-shape
     regression, not noise).

Each key runs in its OWN subprocess (fresh JVM/session): the r10
methodology note measured long-session state inflating later keys by up
to 5x, so batched timings are not comparable to the baseline.

Usage:
    SPARK_GRAFT_CPUS=32 python tools/sf1_probe.py [sf1_dir] [key1,key2,...]
      [--drift X] [--build]
    # defaults: /tmp/sf1, the full heavy family, drift 3x
    # --build: (re)build sf1_dir via make_scaled_sf.py first; without
    #   it, a missing sf1_dir is built automatically, an existing one
    #   is trusted.
    python tools/sf1_probe.py --one KEY SF_DIR   # internal: run one key

Exit 1 if anything fails.  Red-on-bug verified r12: reverting the
``_mi`` encode fix (extensions/pq.py) trips the probe with
``ann_ivf_pq_recall_contract rows=0`` while the full sf0.01 suite stays
green — see PERFORMANCE.md "Round 12: sf1 probe institutionalized".

Note on the ANN artifact cache: as of r14 ``_cached_train``
fingerprints Spark-written parquet *directories* too (full file
listing — the r11 single-file-only restriction is closed by per-file
(relpath, size, mtime_ns) keys), so sf1 training contracts can hit the
JSON artifact cache across subprocesses.  The probe WARMS those
artifacts once, untimed, right after the corpus is available (r13
VERDICT #9: a rebuild invalidated them and the first timed keys paid
cold quantizer training against warm-recorded baselines); the recorded
cold-path baselines below then act as generous upper bounds.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

# Fresh-session sf1 seconds (PERFORMANCE.md r11 table + r12 recorded
# run).  Budget = drift (default 3x) times this.  All keys must emit
# >= 1 row: each either gates its own output (recall contracts empty
# themselves on a bad approximation) or is a non-degenerate aggregate.
BASELINE_SEC: dict[str, float] = {  # recorded r12 run, PERFORMANCE.md
    "ann_ivf_pq_recall_contract": 29.0,   # cold incl. PQ train
    "ann_reuse_centroids_contract": 21.0,
    "ann_ivf_trained_recall_contract": 24.0,
    "ann_ivf_recall_contract": 15.0,
    "ann_lsh_recall_contract": 17.0,
    "minhash_lsh_recall_contract": 16.0,
    "knn_label_accuracy": 16.0,   # r12 gemm kernel + BLAS pin, 3-run band 15.2-16.9
    "dedup_minhash_lsh": 17.0,
    "dedup_cluster_sizes": 25.0,
    # the full CC kill-list pass — the path whose sf10 OOM r13 fixed
    # (serialized CC cache + AQE initialPartitionNum); fresh-session
    # r13 scaling-probe reading 22.7 s
    "dedup_near_corpus": 23.0,
    "minhash_estimate_calibration": 40.0,  # r11/r12 spread 23-53 s
    "lsh_bucket_size_histogram": 14.4,     # full-aug banding, r12
}

_MARK = "SF1PROBE_RESULT "


def run_one(key: str, sf_dir: str) -> int:
    """Execute one registry key in THIS process and print a marked
    JSON result line (consumed by the parent)."""
    from data_pipeline_bigquery_spark.queries import registry
    from data_pipeline_bigquery_spark.session import get_spark

    spark = get_spark(app_name=f"sf1_probe_{key}")
    t0 = time.monotonic()
    rows = len(registry()[key].fn(spark, sf_dir).collect())
    sec = time.monotonic() - t0
    print(_MARK + json.dumps({"key": key, "rows": rows, "sec": round(sec, 1)}))
    return 0


def ensure_sf1(sf_dir: str, force: bool) -> None:
    if not force and os.path.isdir(sf_dir):
        return
    print(f"building {sf_dir} (10x sf0.1 via make_scaled_sf.py)...", flush=True)
    subprocess.run(
        [sys.executable, os.path.join(HERE, "tools", "make_scaled_sf.py"),
         "10", "/root/testdata/sf0.1", sf_dir],
        check=True,
    )


def warm_one(sf_dir: str) -> int:
    """Train/load the shared quantizer artifacts in THIS process so the
    timed per-key subprocesses hit the JSON artifact cache (r13 VERDICT
    #9: timing cold training against warm-recorded baselines is noise,
    not signal)."""
    from data_pipeline_bigquery_spark.queries import extensions as qext
    from data_pipeline_bigquery_spark.session import get_spark

    spark = get_spark(app_name="sf1_probe_warm")
    cents = qext._cached_centroids(spark, sf_dir)
    pq_cents, _cb = qext._pq_cached_artifacts(spark, sf_dir)
    print(_MARK + json.dumps({
        "warmed": {"ivfcent": cents is not None, "ivfpq": pq_cents is not None}
    }))
    return 0


def warm_artifacts(sf_dir: str) -> None:
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--warm-one", sf_dir],
        capture_output=True, text=True, cwd=HERE,
    )
    line = next(
        (ln for ln in proc.stdout.splitlines() if ln.startswith(_MARK)), None
    )
    status = line[len(_MARK):] if line else f"rc={proc.returncode} (warm failed; timed keys will train inline)"
    print(f"artifact warm-up: {status} ({time.monotonic() - t0:.0f}s, untimed)",
          flush=True)


def main() -> int:
    args = list(sys.argv[1:])
    if args[:1] == ["--one"]:
        return run_one(args[1], args[2])
    if args[:1] == ["--warm-one"]:
        return warm_one(args[1])

    drift = 3.0
    if "--drift" in args:
        i = args.index("--drift")
        if i + 1 >= len(args):
            print("usage: --drift X (missing value)", file=sys.stderr)
            return 2
        drift = float(args[i + 1])
        del args[i : i + 2]
    force_build = "--build" in args
    if force_build:
        args.remove("--build")
    sf_dir = args[0] if len(args) > 0 else "/tmp/sf1"
    keys = args[1].split(",") if len(args) > 1 else sorted(BASELINE_SEC)
    unknown = [k for k in keys if k not in BASELINE_SEC]
    if unknown:
        print(f"no recorded sf1 baseline for {unknown}; add to BASELINE_SEC",
              file=sys.stderr)
        return 2

    ensure_sf1(sf_dir, force_build)
    warm_artifacts(sf_dir)
    print(f"{len(keys)} keys at {sf_dir}, drift gate {drift}x, "
          f"fresh session per key", flush=True)
    failures: list[str] = []
    results: list[dict] = []
    for k in keys:
        budget = drift * BASELINE_SEC[k]
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", k, sf_dir],
            capture_output=True, text=True, cwd=HERE,
        )
        line = next(
            (ln for ln in proc.stdout.splitlines() if ln.startswith(_MARK)),
            None,
        )
        if proc.returncode != 0 or line is None:
            tail = (proc.stderr or proc.stdout).strip().splitlines()[-8:]
            print(f"ERR    {k}: subprocess rc={proc.returncode}\n  "
                  + "\n  ".join(tail), flush=True)
            failures.append(f"{k}: errored")
            continue
        r = json.loads(line[len(_MARK):])
        results.append(r)
        verdicts = []
        if r["rows"] == 0:
            verdicts.append("EMPTY gated output")
        if r["sec"] > budget:
            verdicts.append(
                f"timing {r['sec']}s > {drift}x baseline {BASELINE_SEC[k]}s"
            )
        status = "FAIL" if verdicts else "ok"
        print(f"{status:<6} {k}: rows={r['rows']} sec={r['sec']}"
              f" (baseline {BASELINE_SEC[k]}s)"
              + (f"  <- {'; '.join(verdicts)}" if verdicts else ""),
              flush=True)
        failures.extend(f"{k}: {v}" for v in verdicts)

    out = {"sf_dir": sf_dir, "drift": drift, "results": results,
           "failures": failures}
    with open("/tmp/sf1_probe.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"{'FAIL' if failures else 'OK'}: {len(failures)} failure(s) "
          f"of {len(keys)} keys -> /tmp/sf1_probe.json")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
