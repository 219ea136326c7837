"""extensions/kmeans.py: exact-arithmetic Lloyd refinement semantics.

The oracle sweep covers engine↔DuckDB hash parity; these tests pin the
ALGORITHM against constructed geometry — in particular the
cluster-size-bias failure mode the n² normalization exists to prevent
(an unnormalized rational-centroid distance favors small clusters and
collapses the assignment)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.extensions.kmeans import (
    assign_step,
    lloyd_refine,
    quantize,
)


def _seeded(spark, points):
    """points: list of (vec_id, [floats], seed_cluster)."""
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=v, cluster=c) for i, v, c in points]
    )
    return df.select(
        "vec_id", quantize(F.col("embedding")).alias("q"), "cluster"
    )


def test_unequal_cluster_sizes_do_not_bias_assignment(spark):
    """20 points at (0,0), 2 points at (10,10), correctly seeded.
    One Lloyd step must keep every point with its own centroid — the
    unnormalized distance would pull the big cluster's points toward
    the SMALL cluster (its numerator scales by 2² instead of 20²)."""
    pts = [(i, [0.0 + i * 1e-4, 0.0], 0) for i in range(20)]
    pts += [(100 + i, [10.0, 10.0 + i * 1e-4], 1) for i in range(2)]
    out = lloyd_refine(_seeded(spark, pts), iters=1).collect()
    got = {r.vec_id: r.cluster for r in out}
    assert all(got[i] == 0 for i in range(20))
    assert all(got[100 + i] == 1 for i in range(2))


def test_lloyd_recovers_clusters_from_bad_seed(spark):
    """Two tight blobs with one mis-seeded defector each (a seed that
    is noisy but not perfectly symmetric); two Lloyd steps must
    converge to the true blob partition."""
    blob_a = [(i, [0.0, float(i % 3) * 0.01], 0 if i < 5 else 1)
              for i in range(6)]
    blob_b = [(10 + i, [50.0, 50.0 + (i % 3) * 0.01], 1 if i < 5 else 0)
              for i in range(6)]
    out = lloyd_refine(_seeded(spark, blob_a + blob_b), iters=2).collect()
    got = {r.vec_id: r.cluster for r in out}
    a_clusters = {got[i] for i in range(6)}
    b_clusters = {got[10 + i] for i in range(6)}
    assert len(a_clusters) == 1 and len(b_clusters) == 1
    assert a_clusters != b_clusters


def test_assign_step_tiebreak_is_smaller_cluster_id(spark):
    """A point exactly equidistant from two same-size centroids goes
    to the smaller cluster id — the total order the oracle shares."""
    pts = [
        (1, [0.0, 0.0], 5),
        (2, [2.0, 0.0], 3),
        (3, [1.0, 0.0], 5),  # midpoint of the two
    ]
    seeded = _seeded(spark, pts)
    cents = (
        seeded.filter(F.col("vec_id") < 3)
        .select("vec_id", "q", "cluster")
    )
    from data_pipeline_bigquery_spark.extensions.kmeans import _centroids

    out = assign_step(
        seeded.filter(F.col("vec_id") == 3).select("vec_id", "q"),
        _centroids(cents),
    ).collect()
    assert out[0].cluster == 3
