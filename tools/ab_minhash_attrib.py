#!/usr/bin/env python
"""Stage-prefix attribution for the minhash-LSH pipeline (noop sink per
guide §1.4 — .count() column-prunes projection-only prefixes and lies).

Prefixes, old path vs cse2 path, interleaved:

  sig    — signature build (noop forces every column)
  band   — + band_hashes posexplode
  bucket — + groupBy(band) collect_list + size filter
  pairs  — + in-bucket pair explode (pre-distinct)
  full   — + distinct  (the declared result)

Usage: python tools/ab_minhash_attrib.py [SF_DIR] [REPS]
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

from data_pipeline_bigquery_spark.extensions.dedup_text import (  # noqa: E402
    DEFAULT_MAX_BUCKET,
    band_hashes,
    lsh_candidate_pairs,
)
from data_pipeline_bigquery_spark.session import get_spark  # noqa: E402
from tools.ab_minhash_cse import sigs_cse2, sigs_old  # noqa: E402


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="ab_minhash_attrib")
    spark.sparkContext.setLogLevel("ERROR")

    def buckets(sigs):
        banded = band_hashes(sigs)
        return (
            banded.groupBy("band_idx", "band_hash")
            .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
            .filter((F.size("ids") > 1) & (F.size("ids") <= DEFAULT_MAX_BUCKET))
        )

    def pairs_pre_distinct(sigs):
        b = buckets(sigs)
        pair_expr = F.expr(
            "flatten(transform(ids, (x, i) ->"
            " transform(slice(ids, i + 2, size(ids) - i - 1),"
            " y -> struct(x AS doc_a, y AS doc_b))))"
        )
        return b.select(F.explode(pair_expr).alias("p")).select("p.doc_a", "p.doc_b")

    arms = {}
    for tag, sf in (("old", sigs_old), ("cse2", sigs_cse2)):
        arms[f"sig_{tag}"] = lambda sf=sf: sigs_old_frame(sf)
        arms[f"band_{tag}"] = lambda sf=sf: band_hashes(sf(spark, sf_dir))
        arms[f"bucket_{tag}"] = lambda sf=sf: buckets(sf(spark, sf_dir))
        arms[f"pairs_{tag}"] = lambda sf=sf: pairs_pre_distinct(sf(spark, sf_dir))
        arms[f"full_{tag}"] = lambda sf=sf: lsh_candidate_pairs(sf(spark, sf_dir))

    def sigs_old_frame(sf):
        return sf(spark, sf_dir)

    for name, fn in arms.items():
        _noop(fn())  # warm / codegen
    samples = {n: [] for n in arms}
    for _ in range(reps):
        for name, fn in arms.items():
            t0 = time.monotonic()
            _noop(fn())
            samples[name].append(time.monotonic() - t0)
    for name in arms:
        print(
            f"{name}: floor {min(samples[name]):.3f}s  "
            f"samples {[round(s, 3) for s in samples[name]]}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
