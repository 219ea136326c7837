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
