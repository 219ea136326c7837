#!/usr/bin/env python
"""Build a scaled-up copy of a fixture SF dir for scaling experiments.

Usage:  python tools/make_scaled_sf.py [factor] [src_dir] [out_dir]
            [--perturb-embeddings]
        (defaults: 10 /root/testdata/sf0.1 /tmp/sf_scaled)

Each fact table becomes ``factor`` id-shifted copies so keys stay unique
and join fan-outs keep the original selectivity; text gets a per-copy
suffix so dedup operators don't see a corpus that is ``factor``-times
exact duplicates (which would measure pair-explosion, not scan/shuffle
scaling).  Dimension tables (region/nation/customer/supplier/part) are
copied unchanged — exactly how a real lake scales: facts grow, dims
don't, and the star joins must stay broadcast.

``--perturb-embeddings`` additionally nudges each copy's vectors by a
tiny copy-indexed offset on one dimension.  WITHOUT it, every vector
has ``factor`` EXACT duplicates, so any tie-margin shortlist (the knn
key's blas bound, PQ rerank pools) correctly explodes ~factor× — the
r12 sf10 probe measured 99 tied winners per query, i.e. you measure
tie-volume, not search cost.  Leave it OFF for corpora that existing
recorded baselines (tools/sf1_probe.py) were measured on; turn it ON
when probing ANN/knn scale behavior.

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
    args = [a for a in sys.argv[1:] if a != "--perturb-embeddings"]
    perturb_emb = "--perturb-embeddings" in sys.argv[1:]
    factor = int(args[0]) if len(args) > 0 else 10
    src = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    out = args[2] if len(args) > 2 else "/tmp/sf_scaled"

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
            if perturb_emb and name == "embeddings" and i > 0:
                # nudge dim 0 by a copy-indexed epsilon: breaks exact
                # duplication (so margin shortlists stay ~1/query)
                # while moving cosine by <1e-4 — neighbors keep rank
                df = df.withColumn(
                    "embedding",
                    F.expr(
                        "transform(embedding, (x, j) -> CASE WHEN j = 0"
                        f" THEN x + CAST({i} AS FLOAT) * CAST(1e-5 AS FLOAT)"
                        " ELSE x END)"
                    ),
                )
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
