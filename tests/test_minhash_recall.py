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
