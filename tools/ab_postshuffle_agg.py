#!/usr/bin/env python
"""Pre-shuffle vs post-shuffle aggregation on the single-row-group
fixture scans (r13 VERDICT #3).

Every sf0.1 fixture parquet has ONE row group, so every scan is ONE
task; a groupBy's partial (map-side) aggregation therefore runs
single-threaded before the exchange.  When the grouping keys are
~unique (association_edges' (l_orderkey, l_partkey): no reduction) the
partial agg buys nothing and serializes a 600k-key hash build on the
scan task's critical path.  Candidate: an explicit
``repartition(keys)`` before the groupBy — the aggregate's required
distribution is satisfied, so BOTH HashAggregates plan post-shuffle
(parallel), and the shuffle carries the same rows it carried before
(REPARTITION_BY_COL stays AQE-coalescable).

For join_agg_revenue_by_nation the per-order partial agg DOES reduce
4x, so the same move trades map-side reduction (150k rows shuffled)
for scan-task relief (600k rows shuffled) — measured both ways here
before deciding.

Checks result-set equality, prints plan shapes, then interleaved
fresh-process A/B floors.

Usage: SPARK_GRAFT_CPUS=32 python tools/ab_postshuffle_agg.py [KEY] [REPS]
       KEY in {assoc, revenue}; default assoc 3
       python tools/ab_postshuffle_agg.py --one KEY FORM SF_DIR
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

_MARK = "ABAGG_RESULT "


def assoc_current(spark, sf_dir):
    from data_pipeline_bigquery_spark.queries.pipelines import QUERIES

    return QUERIES["pipeline_association_edges"].fn(spark, sf_dir)


def assoc_candidate(spark, sf_dir):
    from pyspark.sql import functions as F

    from data_pipeline_bigquery_spark.catalog import load
    from data_pipeline_bigquery_spark.plans.association import (
        association_edges_plan,
    )
    from data_pipeline_bigquery_spark.queries.pipelines import (
        EMITTED_AT,
        EMITTED_ID,
    )

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber"
    )
    new_pairs = (
        li.repartition(F.col("l_orderkey"), F.col("l_partkey"))
        .groupBy("l_orderkey", "l_partkey")
        .agg(F.max(F.col("l_linenumber") == 1).alias("is_existing"))
        .filter(~F.col("is_existing"))
        .select("l_orderkey", "l_partkey")
    )
    return association_edges_plan(
        new_pairs,
        existing=None,
        from_col="l_orderkey",
        to_col="l_partkey",
        edge_type="contains",
        emitted_at=EMITTED_AT,
        emitted_id=EMITTED_ID,
        assume_distinct=True,
    )


def revenue_current(spark, sf_dir):
    from data_pipeline_bigquery_spark.queries.core import QUERIES

    return QUERIES["join_agg_revenue_by_nation"].fn(spark, sf_dir)


def revenue_candidate(spark, sf_dir):
    from pyspark.sql import functions as F

    from data_pipeline_bigquery_spark.catalog import load

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    per_order = (
        li.select("l_orderkey", revenue.alias("rev"))
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey")
        .agg(F.sum("rev").alias("rev"), F.count(F.lit(1)).alias("n"))
    )
    return (
        per_order.join(orders.select("o_orderkey", "o_custkey"),
                       per_order.l_orderkey == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum("rev").cast("double").alias("revenue"),
             F.sum("n").alias("n_items"))
    )


FORMS = {
    "assoc": {"current": assoc_current, "candidate": assoc_candidate},
    "revenue": {"current": revenue_current, "candidate": revenue_candidate},
}


def run_one(key: str, form: str, sf_dir: str) -> int:
    from data_pipeline_bigquery_spark.session import get_spark

    spark = get_spark(app_name=f"ab_agg_{key}_{form}")
    build = FORMS[key][form]
    warm = "/root/testdata/sf0.001"
    build(spark, warm if os.path.isdir(warm) else sf_dir).count()
    samples = []
    for _ in range(3):
        t0 = time.monotonic()
        build(spark, sf_dir).count()
        samples.append(round(time.monotonic() - t0, 3))
    print(_MARK + json.dumps({"key": key, "form": form, "best": min(samples),
                              "samples": samples}))
    return 0


def main() -> int:
    args = list(sys.argv[1:])
    if args[:1] == ["--one"]:
        return run_one(args[1], args[2], args[3])
    key = args[0] if args else "assoc"
    reps = int(args[1]) if len(args) > 1 else 3

    from data_pipeline_bigquery_spark.session import get_spark

    spark = get_spark(app_name="ab_agg_equiv")
    sf = "/root/testdata/sf0.1"
    a = sorted(map(tuple, FORMS[key]["current"](spark, sf).collect()))
    b = sorted(map(tuple, FORMS[key]["candidate"](spark, sf).collect()))
    print(f"equality at sf0.1: current={len(a)} candidate={len(b)} "
          f"{'IDENTICAL' if a == b else 'MISMATCH'}")
    if a != b:
        return 1
    print("\ncandidate plan:")
    FORMS[key]["candidate"](spark, sf).explain()
    spark.stop()

    floors = {"current": [], "candidate": []}
    for i in range(reps):
        for form in ("current", "candidate"):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", key,
                 form, sf],
                capture_output=True, text=True, cwd=HERE,
            )
            line = next((ln for ln in proc.stdout.splitlines()
                         if ln.startswith(_MARK)), None)
            if line is None:
                print(f"rep{i} {form}: FAILED\n" +
                      "\n".join((proc.stderr or "").splitlines()[-5:]))
                continue
            r = json.loads(line[len(_MARK):])
            floors[form].append(r["best"])
            print(f"rep{i} {form}: best {r['best']}s of {r['samples']}")
    print(json.dumps({f: min(v) if v else None for f, v in floors.items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
