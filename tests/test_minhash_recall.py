"""minhash_lsh_recall_contract: the gate must EMPTY the output when
the approximate arm degrades — the property that makes driver row-count
green meaningful (mirror of
test_ann_recall.py::test_recall_contract_gate_empties_on_bad_approx)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_gate_empties_on_degraded_lsh(spark, monkeypatch):
    import data_pipeline_bigquery_spark.queries.extensions as qx

    real = qx.lsh_candidate_pairs

    def degraded(signatures, **kw):
        # a broken banding that drops ~all candidates
        return real(signatures, **kw).filter(F.col("doc_a") < 0)

    monkeypatch.setattr(qx, "lsh_candidate_pairs", degraded)
    out = qx._minhash_recall_contract(spark, SF_DIR)
    assert out.count() == 0


def test_contract_green_on_real_lsh(spark):
    import data_pipeline_bigquery_spark.queries.extensions as qx

    out = qx._minhash_recall_contract(spark, SF_DIR)
    n = out.count()
    assert n > 100  # the planted pairs are present, gate passed
    # truth pairs are (base, base+1M) planted near-dups mostly
    planted = out.filter(F.col("doc_b") == F.col("doc_a") + 1_000_000).count()
    assert planted >= 100


def test_fused_signatures_identical_and_md5_once(spark):
    """minhash_signatures_from_docs must produce bit-identical rows to
    the explode path (same shingle expression, same affine arithmetic)
    AND keep the md5 base array computed ONCE — CollapseProject must
    not inline the expensive producer into all num_perm consumers."""
    from data_pipeline_bigquery_spark.extensions.dedup_text import (
        char_shingles,
        minhash_signatures,
        minhash_signatures_from_docs,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, None),  # NULL text: kept with all-NULL sigs on BOTH paths
            (4, ""),  # empty text: one empty shingle on both paths
        ],
        "doc_id long, text string",
    )
    a = {
        tuple(r)
        for r in minhash_signatures(
            char_shingles(docs, "doc_id", "text")
        ).collect()
    }
    b = {tuple(r) for r in minhash_signatures_from_docs(docs, "doc_id", "text").collect()}
    assert a == b
    assert {r[0] for r in b} == {1, 2, 3, 4}  # NULL-text doc kept, NULL sigs
    plan = (
        minhash_signatures_from_docs(docs, "doc_id", "text")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("md5") == 1, "base-hash array inlined num_perm times"


def test_aug_slice_cse_signatures_identical(spark, tmp_path):
    """_aug_minhash_signatures (the slice-CSE aug builder, r14) must be
    row-for-row identical to the union path
    (minhash_signatures_from_docs over _augmented_docs) on a hostile
    corpus that exercises every branch of the suffix-identity guard:

      * len < 5   — copy text is EMPTY (substring past the end)
      * len < K+4 — the floor-to-one-shingle rule breaks the suffix
                    structure (the short branch must recompute)
      * len = K+4-1 / K+4 / K+4+1 — the guard boundary itself
      * NULL text — all-NULL signature rows on both paths
      * uppercase + non-ASCII — the ascii fold happens once, upstream
    """
    from data_pipeline_bigquery_spark.extensions.dedup_text import (
        DEFAULT_SHINGLE_K,
        minhash_signatures_from_docs,
    )
    from data_pipeline_bigquery_spark.queries.extensions import (
        _aug_minhash_signatures,
        _augmented_docs,
    )

    K = DEFAULT_SHINGLE_K
    texts = [
        None,
        "",
        "ab",
        "abcd",
        "abcde",
        "x" * (K - 1),
        "y" * K,
        "The Quick Brown Fox È" + "z" * 3,  # non-ASCII + uppercase
        "a" * (K + 3),   # guard boundary - 1 (short branch)
        "b" * (K + 4),   # guard boundary (slice branch)
        "c" * (K + 5),   # guard boundary + 1
        "the quick brown fox jumps over the lazy dog " * 3,
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    old = {
        tuple(r)
        for r in minhash_signatures_from_docs(
            _augmented_docs(spark, sf_dir), "doc_id", "t"
        ).collect()
    }
    new = {tuple(r) for r in _aug_minhash_signatures(spark, sf_dir).collect()}
    assert old == new
    assert len(new) == 2 * len(texts)  # every doc + its planted copy

    # the base-hash md5 array must be computed once per doc and the
    # copy's array DERIVED (slice), not recomputed: exactly two md5
    # sites survive in the optimized plan — the base transform and the
    # short-branch single shingle
    plan = (
        _aug_minhash_signatures(spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("md5") == 2, "copy base-hash array recomputed"
