#!/usr/bin/env python
"""A/B: slice-CSE of the planted-copy arm of the minhash-LSH fixture
derivation (r14 session 2).

The augmented corpus is ``docs ∪ copies`` with ``copy.t =
substring(t, 5)`` — so a copy's shingle stream is exactly the base
doc's shingle stream minus its first 4 windows, and its md5 base-hash
array is ``slice(base_array, 5, size-4)`` (guarded for len < K+4 docs
where the floor-to-one-shingle rule breaks suffix structure).  The
current path recomputes every copy md5 from scratch (~half the md5 work
of the whole signature build).

Arms (all fresh exprs per run, .count() forced, interleaved):

  old       — current: aug union → minhash_signatures_from_docs
  cse1      — single scan; copies' base arrays derived by slice; sigs
              as today (16 transform+array_min per row)
  cse2      — cse1 + head/rest decomposition: each permutation pass
              runs ONCE per base element (rest over the shared suffix,
              head over the 4 leading windows, base sig = least)
  base_only — aug → base arrays → 1 array_min (isolates md5 chain cost)
  sig_old   — aug → signatures only (isolates signature build)

Identity: row sets of (doc_id, sig_0..15) compared old vs cse1 vs cse2,
plus the full LSH pair sets.

Usage: python tools/ab_minhash_cse.py [SF_DIR] [REPS]
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

from data_pipeline_bigquery_spark.extensions.dedup_text import (  # noqa: E402
    DEFAULT_NUM_PERM,
    DEFAULT_SHINGLE_K,
    MINHASH_MOD,
    lsh_candidate_pairs,
    minhash_perm_multiplier,
    minhash_signatures_from_docs,
    shingle_array_sql,
    spread_small_input,
)
from data_pipeline_bigquery_spark.queries.extensions import (  # noqa: E402
    AUG_ID_SHIFT,
    _augmented_docs,
)
from data_pipeline_bigquery_spark.catalog import load  # noqa: E402
from data_pipeline_bigquery_spark.session import get_spark  # noqa: E402

K = DEFAULT_SHINGLE_K
NP = DEFAULT_NUM_PERM
HASH_WRAP = "cast(conv(substring(md5({s}), 1, 7), 16, 10) as long)"


def _docs(spark, sf_dir):
    from data_pipeline_bigquery_spark.functions.text import ascii_lower

    return load(spark, sf_dir, "documents").select(
        "doc_id", ascii_lower("text").alias("t")
    )


def _base_select(spark, sf_dir):
    base_arr = shingle_array_sql("__t", K, 1, elem_wrap=HASH_WRAP, prefolded=True)
    return (
        spread_small_input(_docs(spark, sf_dir), key="doc_id")
        .select(F.col("doc_id"), F.col("t").alias("__t"))
        .select("doc_id", "__t", F.expr(f"{base_arr} AS __base"))
    )


def _copy_arr_sql():
    short = HASH_WRAP.format(s=f"substring(__t, 5, {K})")
    return (
        f"CASE WHEN length(__t) >= {K + 4} THEN slice(__base, 5, size(__base) - 4) "
        f"ELSE array({short}) END"
    )


def sigs_cse1(spark, sf_dir):
    rows = (
        _base_select(spark, sf_dir)
        .select(
            F.expr(
                "explode(array("
                "named_struct('doc_id', doc_id, '__arr', __base), "
                f"named_struct('doc_id', doc_id + {AUG_ID_SHIFT}, '__arr', {_copy_arr_sql()})"
                ")) AS r"
            )
        )
    )
    sigs = [
        f"array_min(transform(r.__arr, h ->"
        f" ({minhash_perm_multiplier(j)} * h + {j}) % {MINHASH_MOD})) AS sig_{j}"
        for j in range(NP)
    ]
    return rows.selectExpr("r.doc_id AS doc_id", *sigs)


def sigs_cse2(spark, sf_dir):
    """The committed implementation (queries.extensions)."""
    from data_pipeline_bigquery_spark.queries.extensions import (
        _aug_minhash_signatures,
    )

    return _aug_minhash_signatures(spark, sf_dir)


def _sigs_cse2_prototype(spark, sf_dir):
    head = f"CASE WHEN length(__t) >= {K + 4} THEN slice(__base, 1, 4) ELSE __base END"
    rests = [
        f"array_min(transform(__copy, h ->"
        f" ({minhash_perm_multiplier(j)} * h + {j}) % {MINHASH_MOD})) AS rest_{j}"
        for j in range(NP)
    ]
    heads = [
        f"array_min(transform(__head, h ->"
        f" ({minhash_perm_multiplier(j)} * h + {j}) % {MINHASH_MOD})) AS head_{j}"
        for j in range(NP)
    ]
    parts = (
        _base_select(spark, sf_dir)
        .selectExpr(
            "doc_id",
            f"length(__t) >= {K + 4} AS __long",
            f"{_copy_arr_sql()} AS __copy",
            f"{head} AS __head",
        )
        .selectExpr("doc_id", "__long", "__copy", *rests, *heads)
    )
    rows = parts.select(
        F.expr(
            "explode(array("
            f"named_struct('doc_id', doc_id, 's', named_struct("
            + ", ".join(f"'sig_{j}', CASE WHEN __long THEN least(head_{j}, rest_{j}) ELSE head_{j} END" for j in range(NP))
            + ")), "
            f"named_struct('doc_id', doc_id + {AUG_ID_SHIFT}, 's', named_struct("
            + ", ".join(f"'sig_{j}', rest_{j}" for j in range(NP))
            + "))"
            ")) AS r"
        )
    )
    return rows.select(F.col("r.doc_id").alias("doc_id"), "r.s.*")


def sigs_old(spark, sf_dir):
    return minhash_signatures_from_docs(_augmented_docs(spark, sf_dir), "doc_id", "t")


def base_only(spark, sf_dir):
    base_arr = shingle_array_sql("__t", K, 1, elem_wrap=HASH_WRAP, prefolded=True)
    return (
        spread_small_input(_augmented_docs(spark, sf_dir), key="doc_id")
        .select(F.col("doc_id"), F.col("t").alias("__t"))
        .select("doc_id", F.expr(f"array_min({base_arr}) AS m"))
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="ab_minhash_cse")
    spark.sparkContext.setLogLevel("ERROR")

    # --- identity proofs (cheap SFs first, then the target dir) ---------
    for d in ["/root/testdata/sf0.001", "/root/testdata/sf0.01", sf_dir]:
        if not os.path.isdir(d):
            continue
        a = {tuple(r) for r in sigs_old(spark, d).collect()}
        b = {tuple(r) for r in sigs_cse1(spark, d).collect()}
        c = {tuple(r) for r in sigs_cse2(spark, d).collect()}
        print(f"identity {d}: n={len(a)} cse1={'OK' if a == b else 'MISMATCH'} "
              f"cse2={'OK' if a == c else 'MISMATCH'}", flush=True)
        if a != b or a != c:
            bad = (a - b) | (b - a) | (a - c) | (c - a)
            for row in list(bad)[:4]:
                print("   diff:", row, flush=True)
            return 1
    pa = {tuple(r) for r in lsh_candidate_pairs(sigs_old(spark, sf_dir)).collect()}
    pb = {tuple(r) for r in lsh_candidate_pairs(sigs_cse1(spark, sf_dir)).collect()}
    pc = {tuple(r) for r in lsh_candidate_pairs(sigs_cse2(spark, sf_dir)).collect()}
    print(f"pairs {sf_dir}: n={len(pa)} cse1={'OK' if pa == pb else 'MISMATCH'} "
          f"cse2={'OK' if pa == pc else 'MISMATCH'}", flush=True)
    if pa != pb or pa != pc:
        return 1

    arms = {
        "full_old": lambda: lsh_candidate_pairs(sigs_old(spark, sf_dir)),
        "full_cse1": lambda: lsh_candidate_pairs(sigs_cse1(spark, sf_dir)),
        "full_cse2": lambda: lsh_candidate_pairs(sigs_cse2(spark, sf_dir)),
        "sig_old": lambda: sigs_old(spark, sf_dir),
        "sig_cse1": lambda: sigs_cse1(spark, sf_dir),
        "sig_cse2": lambda: sigs_cse2(spark, sf_dir),
        "base_only": lambda: base_only(spark, sf_dir),
    }
    # warm each arm once (codegen compile out of the timed region)
    for name, fn in arms.items():
        fn().count()
    best: dict[str, float] = {}
    samples: dict[str, list[float]] = {n: [] for n in arms}
    for _ in range(reps):
        for name, fn in arms.items():
            t0 = time.monotonic()
            fn().count()
            samples[name].append(time.monotonic() - t0)
    for name in arms:
        best[name] = min(samples[name])
        print(f"{name}: floor {best[name]:.3f}s  samples "
              f"{[round(s, 3) for s in samples[name]]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
