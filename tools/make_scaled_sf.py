#!/usr/bin/env python
"""Build a scaled-up copy of a fixture SF dir for scaling experiments.

Usage:  python tools/make_scaled_sf.py [factor] [src_dir] [out_dir]
        (defaults: 10 /root/testdata/sf0.1 /tmp/sf_scaled)

Each fact table becomes ``factor`` id-shifted copies so keys stay unique
and join fan-outs keep the original selectivity; text gets a per-copy
suffix so dedup operators don't see a corpus that is ``factor``-times
exact duplicates (which would measure pair-explosion, not scan/shuffle
scaling).  Dimension tables (region/nation/customer/supplier/part) are
copied unchanged — exactly how a real lake scales: facts grow, dims
don't, and the star joins must stay broadcast.

This writes OUTSIDE the repo (default /tmp) — scaled data is an
experiment artifact, not a fixture.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# fact tables: (id columns to shift, text columns to perturb)
FACTS: dict[str, tuple[list[str], list[str]]] = {
    "orders": (["o_orderkey"], []),
    "lineitem": (["l_orderkey"], []),
    "events": (["event_id"], []),
    "documents": (["doc_id"], ["text"]),
    "embeddings": (["vec_id"], []),
}
DIMS = ("region", "nation", "customer", "supplier", "part")
SHIFT = 100_000_000  # beyond any fixture key range


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf_scaled"

    from pyspark.sql import functions as F

    from data_pipeline_bigquery_spark.catalog import load
    from data_pipeline_bigquery_spark.session import get_spark

    spark = get_spark(app_name="make_scaled_sf")
    os.makedirs(out, exist_ok=True)

    for name in DIMS:
        load(spark, src, name).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
        print(f"{name}: copied")

    for name, (id_cols, text_cols) in FACTS.items():
        base = load(spark, src, name)
        copies = []
        for i in range(factor):
            df = base
            for c in id_cols:
                df = df.withColumn(c, F.col(c) + F.lit(i * SHIFT))
            for c in text_cols:
                df = df.withColumn(c, F.concat(F.col(c), F.lit(f" #v{i}")))
            copies.append(df)
        scaled = copies[0]
        for df in copies[1:]:
            scaled = scaled.unionByName(df)
        # several files per table so downstream scans start parallel
        scaled.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
        print(f"{name}: x{factor}")

    print(f"done -> {out}")


if __name__ == "__main__":
    main()
