"""Batch-12 semantic tests: Croston against a pure-Python truncated
dyadic-EWMA model, the diversity sample against a numpy argmin replay
of the shared assignment arithmetic, the signature manifest against a
hashlib MinHash replay, and the source-overlap matrix against a
hashlib chunk-digest replay."""

from __future__ import annotations

import datetime as dt
import hashlib

import pytest
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.queries import analytics12
from tests.conftest import SF_DIR


def _run(spark, key, sf=SF_DIR):
    return analytics12.QUERIES[key].fn(spark, sf).collect()


# --- croston_intermittent_forecast ------------------------------------------


def _shift_sum_model(vals):
    """Σ v_i · 2^(29 − L + i), 1-based — the exact dyadic EWMA ×2³⁰."""
    L = len(vals)
    return sum(v << (29 - L + i) for i, v in enumerate(vals, start=1))


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double"
    ).withColumn("props", F.lit("{}")).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )


def test_croston_matches_model(spark, tmp_path):
    # user 1: purchases on days 0, 3, 4, 10 with known sizes;
    # user 2: a single demand (intervals undefined → NULL rate);
    # noise: non-purchase events must not contribute
    demands = [(0, 10.00), (3, 20.00), (4, 5.00), (10, 40.00)]
    rows, eid = [], 0
    for day, dollars in demands:
        rows.append((eid, dt.datetime(2024, 1, 1 + day, 9), 1,
                     "purchase", dollars))
        eid += 1
    rows.append((eid, dt.datetime(2024, 1, 2, 9), 1, "view", 999.0))
    eid += 1
    rows.append((eid, dt.datetime(2024, 1, 5, 9), 2, "purchase", 7.00))
    _write_events(spark, tmp_path, rows)
    out = {r.user_id: r for r in _run(
        spark, "croston_intermittent_forecast", str(tmp_path))}
    sizes = [round(d * 100) for _, d in demands]
    gaps = [3, 1, 6]
    z30, p30 = _shift_sum_model(sizes), _shift_sum_model(gaps)
    r = out[1]
    assert (r.n_demands, r.z30, r.p30) == (4, z30, p30)
    assert r.croston_rate == pytest.approx(z30 / p30, abs=0)
    r2 = out[2]
    assert (r2.n_demands, r2.z30) == (1, _shift_sum_model([700]))
    assert r2.p30 is None and r2.croston_rate is None


def test_croston_regular_demand_rate_converges(spark, tmp_path):
    # steady demand of 3.00 every 2 days → rate → 300/2 = 150 c/day
    rows = [
        (d, dt.datetime(2024, 2, 1) + dt.timedelta(days=2 * d), 5,
         "purchase", 3.00)
        for d in range(40)  # > 30 so the truncation window saturates
    ]
    _write_events(spark, tmp_path, rows)
    r = _run(spark, "croston_intermittent_forecast", str(tmp_path))[0]
    assert r.n_demands == 40
    # saturated 30-term window of constants: Σ 2^(i-1) = 2^30 − 1
    assert r.z30 == 300 * ((1 << 30) - 1)
    assert r.p30 == 2 * ((1 << 30) - 1)
    assert r.croston_rate == pytest.approx(150.0, abs=1e-9)


# --- semantic_diversity_sample -----------------------------------------------


def test_diversity_sample_matches_numpy_argmin(spark):
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    vec_ids = t["vec_id"].to_pylist()
    labels = t["label"].to_pylist()
    q = np.array(
        [[int(np.floor(float(x) * 1_000_000)) for x in e]
         for e in t["embedding"].to_pylist()],
        dtype=np.int64,
    )
    labs = sorted(set(labels))
    sums = {l: q[[i for i, x in enumerate(labels) if x == l]].sum(axis=0)
            for l in labs}
    ns = {l: labels.count(l) for l in labs}
    # assignment: argmin over labels of Σ(q·n − S)² / n² with c_label
    # tie-break; then per cell argmin (dist, vec_id)
    best = {}
    for i, vid in enumerate(vec_ids):
        cands = []
        for l in labs:
            d = q[i] * ns[l] - sums[l]
            num = float((d.astype(float) ** 2).sum())
            cands.append((num / (ns[l] * ns[l]), l))
        dist, cell = min(cands)
        cur = best.setdefault(cell, [None, None, 0])
        cur[2] += 1
        if cur[0] is None or (dist, vid) < (cur[0], cur[1]):
            cur[0], cur[1] = dist, vid
    out = {r.cell: r for r in _run(spark, "semantic_diversity_sample")}
    assert set(out) == set(best)
    for cell, (_, vid, n) in best.items():
        assert out[cell].rep_vec_id == vid
        assert out[cell].n_in_cell == n
    assert sum(r.n_in_cell for r in out.values()) == len(vec_ids)


# --- dedup_signature_manifest ------------------------------------------------


def test_manifest_matches_hashlib_minhash_replay(spark, tmp_path):
    from data_pipeline_bigquery_spark.extensions.dedup_text import (
        DEFAULT_BANDS,
        DEFAULT_NUM_PERM,
        DEFAULT_SHINGLE_K,
        MINHASH_MOD,
        minhash_perm_multiplier,
    )

    texts = {1: "The Quick Brown Fox Jumps Over The Lazy Dog",
             2: "the quick brown fox jumps over the lazy dog",  # casefold twin
             3: "completely different content with no overlap at all"}
    spark.createDataFrame(
        [(k, v, "en", "s", len(v)) for k, v in texts.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = analytics12.QUERIES["dedup_signature_manifest"].fn(
        spark, str(tmp_path)
    ).collect()
    got = {(r.doc_id, r.band_idx): r.band_hash for r in out}
    k, rows = DEFAULT_SHINGLE_K, DEFAULT_NUM_PERM // DEFAULT_BANDS
    for doc_id, text in texts.items():
        t = text.lower()
        n = max(len(t) - (k - 1), 1)
        hs = [
            int(hashlib.md5(t[i:i + k].encode()).hexdigest()[:7], 16)
            for i in range(n)
        ]
        sig = [
            min((minhash_perm_multiplier(j) * h + j) % MINHASH_MOD
                for h in hs)
            for j in range(DEFAULT_NUM_PERM)
        ]
        for b in range(DEFAULT_BANDS):
            payload = "_".join(
                str(sig[j]) for j in range(b * rows, (b + 1) * rows)
            )
            want = hashlib.md5(payload.encode()).hexdigest()
            assert got[(doc_id, b)] == want
    # identical-after-lowercase docs share EVERY band; the unrelated
    # doc shares none
    assert all(got[(1, b)] == got[(2, b)] for b in range(DEFAULT_BANDS))
    assert all(got[(3, b)] != got[(1, b)] for b in range(DEFAULT_BANDS))


# --- source_overlap_matrix ---------------------------------------------------


def test_overlap_matrix_matches_hashlib_replay(spark):
    import duckdb

    docs = duckdb.sql(
        f"SELECT source, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    inv = {}
    for source, text in docs:
        words = text.split(" ")
        n = -(-len(words) // 20)  # ceil
        for i in range(n):
            chunk = " ".join(words[i * 20 : i * 20 + 20])
            inv.setdefault(source, set()).add(
                hashlib.md5(chunk.encode()).hexdigest()
            )
    srcs = sorted(inv)
    expect = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            shared = len(inv[a] & inv[b])
            if shared:
                expect[(a, b)] = (
                    shared, len(inv[a]), len(inv[b]),
                    shared * 1000 // min(len(inv[a]), len(inv[b])),
                )
    out = {(r.source_a, r.source_b): (
        r.n_shared, r.n_a, r.n_b, r.share_of_smaller_permille)
        for r in _run(spark, "source_overlap_matrix")}
    assert out == expect
