"""Batch-14 semantic tests: the threshold sweep against a brute-force
Jaccard replay, nested-sample monotonicity and hashlib membership for
the learning curve, and an exact collapse replay for the category
capping."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.queries import analytics14
from tests.conftest import SF_DIR


def _run(spark, key, sf=SF_DIR):
    return analytics14.QUERIES[key].fn(spark, sf).collect()


# --- dedup_threshold_sweep ---------------------------------------------------


def test_sweep_matches_brute_force_jaccard(spark):
    import duckdb

    # replay: the augmented contract corpus (EVERY base doc ids < 150
    # plus its head-mutated copy), word 3-grams, exact pair Jaccard
    docs = duckdb.sql(
        f"SELECT doc_id, lower(text) FROM '{SF_DIR}/documents.parquet'"
        f" WHERE doc_id < 150"
    ).fetchall()
    grams = {}
    for doc_id, t in docs:
        # the aug corpus pairs EVERY base doc with a head-mutated copy
        for did, txt in ((doc_id, t), (doc_id + 1_000_000, t[4:])):
            words = txt.split(" ")
            n = max(len(words) - 2, 1)
            grams[did] = {
                " ".join(words[i : i + 3]) for i in range(n)
            }
    ids = sorted(grams)
    counts = {t: [0, set()] for t in (500, 600, 700, 800, 900)}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(grams[a] & grams[b])
            if not inter:
                continue
            jp = inter * 1000 // (len(grams[a]) + len(grams[b]) - inter)
            for t in counts:
                if jp >= t:
                    counts[t][0] += 1
                    counts[t][1].update((a, b))
    out = {r.threshold_permille: r for r in _run(
        spark, "dedup_threshold_sweep")}
    assert sorted(out) == sorted(counts)  # no holes: zeros reported
    for t, (n_pairs, flagged) in counts.items():
        assert out[t].n_pairs == n_pairs
        assert out[t].n_docs_flagged == len(flagged)
    # cumulative: higher thresholds can only flag fewer pairs
    ts = sorted(out)
    for lo, hi in zip(ts, ts[1:]):
        assert out[lo].n_pairs >= out[hi].n_pairs


# --- learning_curve_quality --------------------------------------------------


def _bucket(k):
    return int(hashlib.md5(str(k).encode()).hexdigest()[:7], 16) % 1000


def test_learning_curve_nested_and_membership_exact(spark):
    import duckdb

    out = {r.sample_permille: r for r in _run(
        spark, "learning_curve_quality")}
    assert sorted(out) == [k * 100 for k in range(1, 11)]
    ids = [r[0] for r in duckdb.sql(
        f"SELECT doc_id FROM '{SF_DIR}/documents.parquet'").fetchall()]
    for k, r in out.items():
        # membership is the md5 bucket rule, exactly
        assert r.n_docs == sum(1 for i in ids if _bucket(i) < k)
    # nested: counts and pass counts are monotone non-decreasing
    ks = sorted(out)
    for lo, hi in zip(ks, ks[1:]):
        assert out[lo].n_docs <= out[hi].n_docs
        assert out[lo].n_pass <= out[hi].n_pass
    # the 100% sample is the whole corpus and matches the cascade key
    from data_pipeline_bigquery_spark.queries import curation2

    cascade = {r.rule: r.n_docs for r in curation2.QUERIES[
        "quality_filter_cascade"].fn(spark, SF_DIR).collect()}
    assert out[1000].n_docs == len(ids)
    assert out[1000].n_pass == cascade.get("pass", 0)


# --- rare_category_collapse --------------------------------------------------


def test_collapse_matches_exact_replay(spark):
    import duckdb
    from collections import Counter

    brands = Counter(
        r[0] for r in duckdb.sql(
            f"SELECT p_brand FROM '{SF_DIR}/part.parquet'").fetchall()
    )
    ranked = sorted(brands, key=lambda b: (-brands[b], b))
    kept = set(ranked[:15])
    expect = {}
    other_n, other_src = 0, 0
    for b, n in brands.items():
        if b in kept:
            expect[b] = (n, 1)
        else:
            other_n += n
            other_src += 1
    if other_src:
        expect["OTHER"] = (other_n, other_src)
    got = {r.category: (r.n_parts, r.n_source_categories)
           for r in _run(spark, "rare_category_collapse")}
    assert got == expect
    # conservation: every part lands somewhere
    assert sum(n for n, _ in got.values()) == sum(brands.values())
