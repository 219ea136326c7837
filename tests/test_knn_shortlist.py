"""The r10 knn_label_accuracy rewrite's safety net: the BLAS-shortlist
form must emit EXACTLY the brute-force fold form's aggregate — the
margin proof (|blas − fold| ≲ 1e-12 ≪ 1e-6 margin ≪ score scale) says
the fold-winner and every rounded tie is inside the shortlist, and
this test re-derives the brute answer in-process to hold it there.
(Cross-engine exactness vs DuckDB's all-pairs form is separately
re-proven by tests/test_oracle_parity.py every round.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.queries import registry
from tests.conftest import SF_DIR


def _brute(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )
    a = emb.select(
        F.col("vec_id").alias("a_id"), F.col("v").alias("a_v"),
        F.col("label").alias("a_label"),
    )
    b = emb.select(
        F.col("vec_id").alias("b_id"), F.col("v").alias("b_v"),
        F.col("label").alias("b_label"),
    )
    dot = F.aggregate(
        F.zip_with("a_v", "b_v", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = a.join(F.broadcast(b), F.col("a_id") != F.col("b_id")).withColumn(
        "sim", F.round(dot, 9)
    )
    nn = (
        pairs.groupBy("a_id", "a_label")
        .agg(
            F.max(
                F.struct(
                    F.col("sim"),
                    (-F.col("b_id")).alias("neg_b"),
                    F.col("b_label"),
                )
            ).alias("best")
        )
        .select("a_id", "a_label", F.col("best.b_label").alias("b_label"))
    )
    return (
        nn.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("a_label") == F.col("b_label")).cast("long")
            ).alias("n_correct"),
        )
        .collect()[0]
    )


def test_shortlist_form_equals_brute_force(spark):
    got = registry()["knn_label_accuracy"].fn(spark, SF_DIR).collect()[0]
    want = _brute(spark, SF_DIR)
    assert (got.n, got.n_correct) == (want.n, want.n_correct)
    assert got.accuracy_permille == want.n_correct * 1000 // want.n


def test_broadcast_envelope_guard_raises_before_collect(spark, monkeypatch):
    """r12 VERDICT #3: a corpus too big for the exact-probe broadcast
    envelope must raise with a pointer to the IVF path, not driver-OOM.
    Simulated by shrinking the cap to 0 MiB on the real fixture."""
    import pytest

    monkeypatch.setenv("SPARK_GRAFT_KNN_BROADCAST_MB", "0")
    with pytest.raises(ValueError, match="IVF"):
        registry()["knn_label_accuracy"].fn(spark, SF_DIR).collect()


def test_duplicate_vec_id_rejected(spark, tmp_path):
    """The kernel's binary-search self-exclusion assumes unique vec_id
    (r12 ADVICE); a duplicated corpus must fail loudly, not silently
    score rows against their own copies."""
    import pytest

    # orderBy before limit: each union branch re-evaluates the limit
    # subtree, and an unordered limit may pick different rows per branch
    emb = load(spark, SF_DIR, "embeddings").orderBy("vec_id").limit(8)
    emb.unionByName(emb).write.parquet(str(tmp_path / "embeddings.parquet"))
    with pytest.raises(ValueError, match="duplicate vec_id"):
        registry()["knn_label_accuracy"].fn(spark, str(tmp_path)).collect()
