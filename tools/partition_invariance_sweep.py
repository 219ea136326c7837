#!/usr/bin/env python
"""Partition-count invariance sweep over the full query registry.

session.py claims "nothing in the engine assumes a partition count".
The DuckDB oracle can't fully prove that: a key whose ties are broken
nondeterministically (unsorted collect_list, limit over ties, argmax
over equal scores) can hash-green at one parallelism and red at
another — and the DRIVER's parallelism is not ours.  This sweep runs
every registry key at a configurable (cores, shuffle-partitions)
point and writes one canonical result hash per key; run it at two or
more points and diff the outputs — any key whose hash moves depends
on the partitioning.

Usage:
    SPARK_GRAFT_CPUS=32 python tools/partition_invariance_sweep.py \
        /root/testdata/sf0.01 /tmp/inv_32.jsonl [shuffle_partitions]
    SPARK_GRAFT_CPUS=5  python tools/partition_invariance_sweep.py \
        /root/testdata/sf0.01 /tmp/inv_5.jsonl 7
    python tools/partition_invariance_sweep.py --diff /tmp/inv_32.jsonl /tmp/inv_5.jsonl

Beyond parallelism, the same two-point pattern proves invariance on any
session-config axis via repeated ``--conf k=v`` flags (applied through
``get_spark(extra_conf=...)``, i.e. on top of session.py's pins), e.g.:

    # ANSI-mode flip (r10 VERDICT ask #1)
    python tools/partition_invariance_sweep.py /root/testdata/sf0.01 \
        /tmp/inv_ansi.jsonl --conf spark.sql.ansi.enabled=true

    # hostile session/JVM/Python timezone (run under TZ=Pacific/Chatham)
    TZ=Pacific/Chatham python tools/partition_invariance_sweep.py \
        /root/testdata/sf0.01 /tmp/inv_tz.jsonl \
        --conf "spark.driver.extraJavaOptions=-Duser.timezone=Pacific/Chatham"

    # memory-pressure / shuffle-spill axis (r11 VERDICT ask #6): force
    # the spill code paths deterministically at ANY scale factor via
    # Spark's element-count spill thresholds, doubled shuffle width
    python tools/partition_invariance_sweep.py /root/testdata/sf0.01 \
        /tmp/inv_spill.jsonl 64 \
        --conf spark.shuffle.spill.numElementsForceSpillThreshold=5000 \
        --conf spark.sql.windowExec.buffer.spill.threshold=1000 \
        --conf spark.sql.sortMergeJoinExec.buffer.spill.threshold=1000 \
        --conf spark.sql.objectHashAggregate.sortBased.fallbackThreshold=128

``--keys k1,k2,...`` restricts the sweep to a subset (e.g. the heavy
family at sf0.1 under genuinely constrained executor memory, where a
full-registry pass would be impractically slow).

The hash canonicalizes exactly like the local oracle-compare replica
(columns sorted by name, rows sorted, Decimal/naive-datetime/NaN
normalization) so a hash here is order-insensitive by construction —
only genuine value/row-set differences move it.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tests"))


def canonical_hash(df) -> tuple[int, str]:
    from oracle_compare import normalize

    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    normed = normalize(cols, rows)
    h = hashlib.md5()
    h.update(json.dumps(sorted(cols)).encode())
    for row in normed:
        h.update(repr(row).encode())
    return len(rows), h.hexdigest()


def diff(path_a: str, path_b: str) -> int:
    def load(p):
        out = {}
        with open(p) as fh:
            for line in fh:
                rec = json.loads(line)
                out[rec["key"]] = rec
        return out

    a, b = load(path_a), load(path_b)
    bad = 0
    for key in sorted(set(a) | set(b)):
        ra, rb = a.get(key), b.get(key)
        if ra is None or rb is None:
            print(f"MISSING {key}: only in {'B' if ra is None else 'A'}")
            bad += 1
        elif ra.get("err") or rb.get("err"):
            print(f"ERR     {key}: A={ra.get('err')} B={rb.get('err')}")
            bad += 1
        elif (ra["rows"], ra["hash"]) != (rb["rows"], rb["hash"]):
            print(
                f"DIFFERS {key}: A rows={ra['rows']} hash={ra['hash'][:12]}"
                f" B rows={rb['rows']} hash={rb['hash'][:12]}"
            )
            bad += 1
    print(f"{'FAIL' if bad else 'OK'}: {bad} divergent of {len(set(a) | set(b))}")
    return 1 if bad else 0


def main() -> int:
    if len(sys.argv) >= 2 and sys.argv[1] == "--diff":
        return diff(sys.argv[2], sys.argv[3])

    args = list(sys.argv[1:])
    extra_conf: dict[str, str] = {}
    while "--conf" in args:
        i = args.index("--conf")
        if i + 1 >= len(args):
            print("usage: --conf key=value (missing value)", file=sys.stderr)
            return 2
        k, sep, v = args[i + 1].partition("=")
        if not sep or not k:
            print(
                f"usage: --conf key=value (got {args[i + 1]!r})",
                file=sys.stderr,
            )
            return 2
        extra_conf[k] = v
        del args[i : i + 2]
    only: list[str] | None = None
    if "--keys" in args:
        i = args.index("--keys")
        if i + 1 >= len(args):
            print("usage: --keys k1,k2,... (missing value)", file=sys.stderr)
            return 2
        only = args[i + 1].split(",")
        del args[i : i + 2]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_path = args[1] if len(args) > 1 else "/tmp/invariance.jsonl"
    shuffle = int(args[2]) if len(args) > 2 else None

    import __spark_entry__ as entry
    from data_pipeline_bigquery_spark.session import get_spark

    spark = get_spark(
        app_name="partition_invariance_sweep",
        shuffle_partitions=shuffle,
        extra_conf=extra_conf,
    )
    if extra_conf:
        print(f"extra_conf: {extra_conf}", flush=True)
    qs = entry.queries()
    if only is not None:
        missing = [k for k in only if k not in qs]
        if missing:
            print(f"unknown keys: {missing}", file=sys.stderr)
            return 2
        qs = {k: qs[k] for k in only}
    print(
        f"{len(qs)} keys at {sf_dir} "
        f"(defaultParallelism={spark.sparkContext.defaultParallelism}, "
        f"shuffle={spark.conf.get('spark.sql.shuffle.partitions')})",
        flush=True,
    )
    with open(out_path, "w") as fh:
        for i, (key, fn) in enumerate(sorted(qs.items())):
            t0 = time.monotonic()
            try:
                n, h = canonical_hash(fn(spark, sf_dir))
                rec = {"key": key, "rows": n, "hash": h}
            except Exception as exc:  # record, keep sweeping
                rec = {"key": key, "err": f"{type(exc).__name__}: {exc}"[:300]}
            rec["secs"] = round(time.monotonic() - t0, 2)
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            if (i + 1) % 25 == 0:
                print(f"  {i + 1}/{len(qs)} done", flush=True)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
