"""Connected-components cluster formation (extensions/clusters.py)."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.extensions.clusters import (
    cluster_summary,
    connected_components,
)


@pytest.fixture(scope="module")
def spark():
    from data_pipeline_bigquery_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


def _components(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    rows = connected_components(df).collect()
    return {r.doc_id: r.component for r in rows}


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: diameter 4, exercises >1 propagation round
    got = _components(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disjoint_components(spark):
    got = _components(spark, [(10, 20), (30, 40), (40, 50), (7, 8)])
    assert got == {10: 10, 20: 10, 30: 30, 40: 30, 50: 30, 7: 7, 8: 7}


def test_long_chain_pointer_jumping(spark):
    # 64-node path: plain 1-hop propagation needs 63 rounds; pointer
    # jumping must finish within the default max_iter=25 (O(log n))
    pairs = [(i, i + 1) for i in range(64)]
    got = _components(spark, pairs)
    assert set(got.values()) == {0}
    assert len(got) == 65


def test_pair_order_irrelevant(spark):
    # edges listed high-low: symmetrization must handle either order
    got = _components(spark, [(9, 3), (3, 1)])
    assert got == {9: 1, 3: 1, 1: 1}


def test_cluster_summary(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (8, 9)], "doc_a long, doc_b long")
    comp = connected_components(df)
    rows = {r.component: (r.n_docs, r.canonical_id) for r in cluster_summary(comp).collect()}
    assert rows == {1: (3, 1), 8: (2, 8)}
