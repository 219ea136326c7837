#!/usr/bin/env python
"""Capture .explain("formatted") for registry keys into plans/<tag>/.

Usage:
    SPARK_GRAFT_CPUS=32 python tools/capture_plans.py r13 before [key,key,...]

Writes plans/<tag>/<key>_<suffix>.txt for each key (default: the bench
headliners).  The judge reads these files to check plan-shape claims
(Exchange count, join strategy, PushedFilters) against the code.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    from bench import BENCH_QUERIES

    keys = sys.argv[3].split(",") if len(sys.argv) > 3 else list(BENCH_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from data_pipeline_bigquery_spark.queries import registry
    from data_pipeline_bigquery_spark.session import get_spark

    spark = get_spark(app_name=f"capture_plans_{tag}_{suffix}")
    reg = registry()
    out_dir = os.path.join(HERE, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for key in keys:
        df = reg[key].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {key} @ {sf_dir} ({suffix})\n")
            fh.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
