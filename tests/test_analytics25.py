"""Batch-25 pins: curation-planning diagnostics — LSH tuning curve,
packing waste, near-dup provenance, duplicate token inflation.
(Cross-engine value parity for all four keys rides the global
tests/test_oracle_parity.py sweep; these pin the semantics.)"""

from __future__ import annotations

import duckdb

from data_pipeline_bigquery_spark.queries import analytics25, extensions
from tests.conftest import SF_DIR


def _run(spark, key):
    return analytics25.QUERIES[key].fn(spark, SF_DIR).collect()


def test_band_tuning_curve_s_curve_monotonicity(spark):
    rows = sorted(_run(spark, "minhash_band_tuning_curve"),
                  key=lambda r: r.rows_per_band)
    assert [(r.bands, r.rows_per_band) for r in rows] == [
        (16, 1), (8, 2), (4, 4), (2, 8)
    ]
    # one pair base: n_pairs identical across configs
    assert len({r.n_pairs for r in rows}) == 1 and rows[0].n_pairs > 0
    for r in rows:
        assert 0 <= r.detect_ge_half <= r.n_pairs
        assert 0 <= r.expected_detected_micro <= r.n_pairs * 1_000_000
        # the expectation can never undercount the p>=0.5 mass's floor
        assert r.expected_detected_micro >= r.detect_ge_half * 500_000
    # at a fixed 16-hash budget, p = 1-(1-j^r)^b is strictly decreasing
    # in r for 0<j<1, so both detection measures are non-increasing
    for a, b in zip(rows, rows[1:]):
        assert a.expected_detected_micro >= b.expected_detected_micro
        assert a.detect_ge_half >= b.detect_ge_half


def test_packing_waste_curve_accounting(spark):
    rows = sorted(_run(spark, "packing_waste_curve"), key=lambda r: r.ctx)
    assert [r.ctx for r in rows] == [128, 256, 512]
    # same corpus at every context length
    assert len({(r.n_docs, r.total_tokens) for r in rows}) == 1
    for r in rows:
        # concat packing can only save bins vs per-doc chunking
        assert 0 < r.concat_bins <= r.chunk_bins
        assert r.chunk_waste == r.chunk_bins * r.ctx - r.total_tokens
        assert r.concat_waste == r.concat_bins * r.ctx - r.total_tokens
        assert 0 <= r.concat_waste <= r.chunk_waste
    # longer contexts waste MORE under per-doc chunking (more padding
    # per tail) on a corpus of mostly short docs
    assert rows[0].chunk_waste <= rows[-1].chunk_waste


def test_pair_source_mix_partitions_the_pair_set(spark):
    mix = _run(spark, "dedup_pair_source_mix")
    assert mix
    for r in mix:
        assert r.source_lo <= r.source_hi and r.n_pairs > 0
    # the mix is a partition of the ngram-jaccard pair set (same aug
    # fixture, same threshold)
    n_pairs_total = extensions.QUERIES["dedup_ngram_jaccard"].fn(
        spark, SF_DIR
    ).count()
    assert sum(r.n_pairs for r in mix) == n_pairs_total


def test_dup_token_inflation_accounting(spark):
    rows = _run(spark, "dup_token_inflation_by_source")
    assert rows
    for r in rows:
        assert 0 <= r.dup_docs < r.n_docs
        assert 0 <= r.dup_tokens <= r.total_tokens
        assert r.inflation_micro == r.dup_tokens * 1_000_000 // r.total_tokens
    # every planted copy (doc_id % 5 == 0) is the single non-canonical
    # member of its digest group — the base corpus has no exact dups
    planted = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/documents.parquet'"
        " WHERE text IS NOT NULL AND doc_id % 5 = 0"
    ).fetchone()[0]
    assert sum(r.dup_docs for r in rows) == planted


def test_lsh_bucket_histogram_mass_conservation(spark):
    from data_pipeline_bigquery_spark.extensions.dedup_text import (
        DEFAULT_BANDS,
        DEFAULT_MAX_BUCKET,
    )

    rows = _run(spark, "lsh_bucket_size_histogram")
    assert rows
    # every (doc, band) row lands in exactly one bucket
    n_docs = duckdb.sql(
        f"SELECT count(*) * 2 FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]  # aug corpus = docs + planted copies
    assert sum(r.bucket_size * r.n_buckets for r in rows) == n_docs * DEFAULT_BANDS
    for r in rows:
        assert r.candidate_pairs == r.n_buckets * (
            r.bucket_size * (r.bucket_size - 1) // 2
        )
        assert r.over_cap == int(r.bucket_size > DEFAULT_MAX_BUCKET)
    # the near-dup fixture must actually produce multi-doc buckets
    assert any(r.bucket_size > 1 for r in rows)


def test_minhash_recall_by_band_matches_contract_operating_point(spark):
    rows = sorted(_run(spark, "minhash_recall_by_jaccard_band"),
                  key=lambda r: r.j_bucket)
    assert rows
    for r in rows:
        assert 2 <= r.j_bucket <= 10
        assert 0 <= r.n_detected <= r.n_true
        assert r.recall_permille == r.n_detected * 1000 // r.n_true
    # the contract gates overall recall >= 0.85 at j >= 0.8; the
    # empirical curve must agree at those buckets
    high = [r for r in rows if r.j_bucket >= 8]
    assert high
    hits = sum(r.n_detected for r in high)
    total = sum(r.n_true for r in high)
    assert hits * 100 >= total * 85
