"""Durable IVF index: the amortized ANN path must survive a round trip
to parquet — identical results from the loaded index — and the
cell-partitioned layout must let a probe read only its probed cells
(runtime partition pruning on the candidate join)."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: ANN artifact persistence roundtrip proofs
pytestmark = _pytest_tier.mark.slow

from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.extensions.similarity import (
    assign_cells,
    ivf_topk_preassigned,
    load_ivf_index,
    save_ivf_index,
    train_ivf_centroids,
)

SF_DIR = "/root/testdata/sf0.001"


def _topk_rows(df):
    return {
        (r["query_id"], r["neighbor_id"], r["cosine_sim"]) for r in df.collect()
    }


def test_roundtrip_identical_and_cell_pruned(spark, tmp_path):
    emb = load(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    cents = train_ivf_centroids(emb, nlist=10, iters=2)
    assigned = assign_cells(emb, cents)

    in_memory = _topk_rows(
        ivf_topk_preassigned(queries, assigned, cents, k=5, nprobe=3)
    )

    idx = str(tmp_path / "ivf_index")
    save_ivf_index(assigned, cents, idx)
    corpus2, cents2 = load_ivf_index(spark, idx)

    # the index round-trips: same neighbors, same similarities
    from_disk_df = ivf_topk_preassigned(queries, corpus2, cents2, k=5, nprobe=3)
    assert _topk_rows(from_disk_df) == in_memory

    # layout check: one directory per cell, so the probe join can prune
    import glob

    cell_dirs = glob.glob(f"{idx}/corpus/cell=*")
    assert len(cell_dirs) == cents.count()

    # a single-cell probe against the persisted index reads ONLY that
    # cell's partition (static pruning through the join filter)
    one_cell = corpus2.filter(F.col("cell") == 3)
    plan = one_cell._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    idx_pf = plan.find("PartitionFilters")
    assert idx_pf >= 0 and "cell" in plan[idx_pf : idx_pf + 200]


def test_loaded_index_routes_through_similarity_topk(spark, tmp_path):
    """The user-facing router accepts the loaded centroids directly:
    similarity_topk(centroids=loaded) takes the amortized branch and
    matches the in-memory amortized result."""
    from data_pipeline_bigquery_spark.extensions.similarity import similarity_topk

    emb = load(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    cents = train_ivf_centroids(emb, nlist=10, iters=2)
    idx = str(tmp_path / "ivf_index")
    save_ivf_index(assign_cells(emb, cents), cents, idx)
    _, cents2 = load_ivf_index(spark, idx)

    a = _topk_rows(similarity_topk(queries, emb, k=5, centroids=cents, nprobe=3))
    b = _topk_rows(similarity_topk(queries, emb, k=5, centroids=cents2, nprobe=3))
    assert a == b
