"""Batch-13 semantic tests: the incremental dedup verdict against the
in-corpus LSH pair machinery and a hand-built near-dup/unique fixture,
the outlier audit against a numpy own-label distance replay, and the
confusion matrix against a per-doc classifier replay."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.queries import analytics13
from tests.conftest import SF_DIR


def _run(spark, key, sf=SF_DIR):
    return analytics13.QUERIES[key].fn(spark, sf).collect()


# --- incremental_dedup_against_manifest --------------------------------------


def test_incremental_dedup_finds_mutated_copies(spark):
    out = _run(spark, "incremental_dedup_against_manifest")
    import duckdb

    base_ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{SF_DIR}/documents.parquet'"
            f" WHERE doc_id % 5 = 0"
        ).fetchall()
    ]
    # one verdict row per incoming doc, offset id space
    assert sorted(r.new_doc_id for r in out) == sorted(
        i + 1_000_000 for i in base_ids
    )
    # a 4-char head mutation keeps shingle Jaccard ≈ 1: the vast
    # majority must be caught, and each caught doc's best match is a
    # real base doc (usually its own source)
    dup = [r for r in out if r.is_dup]
    assert len(dup) >= 0.9 * len(out)
    own = sum(1 for r in dup if r.best_match == r.new_doc_id - 1_000_000)
    assert own >= 0.8 * len(dup)
    for r in out:
        if not r.is_dup:
            assert r.n_candidates == 0 and r.best_match is None
        else:
            assert r.n_candidates >= 1 and r.best_match is not None


def test_incremental_dedup_clean_batch_verdict_false(spark, tmp_path):
    # the synthesized incoming doc is substr(text, 5) of doc 5 — a
    # SUFFIX, so its shingles are a subset of the original's UNLESS the
    # text is shorter than shingle_k + 4.  Make doc 5 a short unique
    # string: its single whole-text shingle differs from the suffix's,
    # signatures diverge, and the verdict must be CLEAN (is_dup false).
    base = [(i, f"long base document number {i} " + "x y z " * 20,
             "en", "s", 10) for i in (1, 2, 3, 4, 6, 7)]
    base.append((5, "abcdefghij", "en", "s", 10))  # 10 chars < k+4
    spark.createDataFrame(
        base,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = _run(spark, "incremental_dedup_against_manifest", str(tmp_path))
    assert len(out) == 1  # only doc_id 5 is % 5 == 0
    r = out[0]
    assert not r.is_dup
    assert r.n_candidates == 0 and r.best_match is None


# --- embedding_outlier_audit --------------------------------------------------


def test_outlier_audit_matches_numpy_replay(spark):
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
    out = {r.label: r for r in _run(spark, "embedding_outlier_audit")}
    for lab in sorted(set(labels)):
        idx = [i for i, l in enumerate(labels) if l == lab]
        n = len(idx)
        s = q[idx].sum(axis=0)
        nums = {
            vec_ids[i]: int(((q[i] * n - s).astype(object) ** 2).sum())
            for i in idx
        }
        order = sorted(nums, key=lambda v: (-nums[v], v))
        r = out[lab]
        assert r.n_members == n
        assert r.n_outliers == n // 20
        assert r.worst_vec_id == order[0]


def test_outlier_audit_partitions_and_small_label_zero(spark):
    out = _run(spark, "embedding_outlier_audit")
    import duckdb

    total = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/embeddings.parquet'"
    ).fetchone()[0]
    assert sum(r.n_members for r in out) == total
    for r in out:
        # strict 5%: never more than n/20, zero when n < 20
        assert r.n_outliers == r.n_members // 20


# --- lang_id_confusion --------------------------------------------------------


def test_confusion_matrix_matches_classifier_replay(spark):
    from data_pipeline_bigquery_spark.extensions.text_analysis import lang_id
    from data_pipeline_bigquery_spark.catalog import load

    scored = lang_id(
        load(spark, SF_DIR, "documents"), "doc_id", "text"
    ).collect()
    from collections import Counter

    expect = Counter((r.lang, r.predicted_lang) for r in scored)
    got = {(r.lang, r.predicted_lang): r.n for r in _run(
        spark, "lang_id_confusion")}
    assert got == dict(expect)
    # structure: the matrix partitions the corpus, predictions stay in
    # the classifier's label set, and SOME diagonal mass exists —
    # absolute accuracy is the question the matrix answers, not a test
    # invariant (the synthetic fixture's marker density is low)
    assert sum(got.values()) == len(scored)
    assert {p for _, p in got} <= {"en", "de", "fr"}
    assert sum(v for (a, b), v in got.items() if a == b) > 0
