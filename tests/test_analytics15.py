"""Batch-15 semantic tests: Heaps curve against a hashlib nested-sample
replay (and the sub-linearity sanity the law predicts), and the MinHash
calibration against a pure-Python signature + exact-shingle replay."""

from __future__ import annotations

import hashlib

from data_pipeline_bigquery_spark.queries import analytics15
from tests.conftest import SF_DIR


def _run(spark, key, sf=SF_DIR):
    return analytics15.QUERIES[key].fn(spark, sf).collect()


def _bucket(k, n=1000):
    return int(hashlib.md5(str(k).encode()).hexdigest()[:7], 16) % n


# --- heaps_law_vocab_growth --------------------------------------------------


def test_heaps_matches_replay_and_is_sublinear(spark):
    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    out = {r.sample_permille: r for r in _run(
        spark, "heaps_law_vocab_growth")}
    assert sorted(out) == [k * 100 for k in range(1, 11)]
    for k, r in out.items():
        sample = [(i, t) for i, t in docs if _bucket(i) < k]
        toks = [w for _, t in sample for w in t.split(" ")]
        assert r.n_docs == len(sample)
        assert r.n_tokens == len(toks)
        assert r.vocab_size == len(set(toks))
    # the law: vocabulary density falls (or holds) as the corpus grows
    # (compare only sizes with tokens — an empty decile reports NULL
    # density, not 0, by the nullif guard)
    ks = [k for k in sorted(out) if out[k].n_tokens > 0]
    assert out[ks[0]].vocab_permille >= out[ks[-1]].vocab_permille
    # nested: vocab is monotone non-decreasing in sample size
    for lo, hi in zip(ks, ks[1:]):
        assert out[lo].vocab_size <= out[hi].vocab_size


# --- minhash_estimate_calibration --------------------------------------------


def test_calibration_matches_python_minhash_replay(spark):
    import duckdb
    from collections import defaultdict

    from data_pipeline_bigquery_spark.extensions.dedup_text import (
        DEFAULT_BANDS,
        DEFAULT_NUM_PERM,
        DEFAULT_SHINGLE_K,
        MINHASH_MOD,
        minhash_perm_multiplier,
    )

    base = duckdb.sql(
        f"SELECT doc_id, lower(text) FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    texts = {i: t for i, t in base}
    texts.update({i + 1_000_000: t[4:] for i, t in base})
    k = DEFAULT_SHINGLE_K
    shingles, sigs = {}, {}
    for did, t in texts.items():
        n = max(len(t) - (k - 1), 1)
        ss = {t[i:i + k] for i in range(n)}
        shingles[did] = ss
        hs = [int(hashlib.md5(s.encode()).hexdigest()[:7], 16) for s in ss]
        sigs[did] = [
            min((minhash_perm_multiplier(j) * h + j) % MINHASH_MOD
                for h in hs)
            for j in range(DEFAULT_NUM_PERM)
        ]
    rows = DEFAULT_NUM_PERM // DEFAULT_BANDS
    buckets = defaultdict(set)
    for did, sig in sigs.items():
        for b in range(DEFAULT_BANDS):
            key = (b, tuple(sig[b * rows:(b + 1) * rows]))
            buckets[key].add(did)
    cand = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                cand.add((a, b))
    expect = defaultdict(lambda: [0, 0])
    for a, b in cand:
        est = sum(x == y for x, y in zip(sigs[a], sigs[b]))
        inter = len(shingles[a] & shingles[b])
        union = len(shingles[a] | shingles[b])
        jp = inter * 1000 // union
        expect[est][0] += 1
        expect[est][1] += jp
    out = {r.est_matches: r for r in _run(
        spark, "minhash_estimate_calibration")}
    assert {m: (r.n_pairs, r.sum_exact_permille) for m, r in out.items()} \
        == {m: tuple(v) for m, v in expect.items()}
    # calibration direction: a full 16/16 match means near-identical
    # shingle sets — its mean exact Jaccard must dominate the curve
    if 16 in out and len(out) > 1:
        rest = max(r.mean_exact_permille for m, r in out.items() if m != 16)
        assert out[16].mean_exact_permille >= rest
