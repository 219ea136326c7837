"""Exact-arithmetic Lloyd iterations (k-means refinement) on Spark.

Iterative ML on a DataFrame engine, done so the result is
bit-reproducible on ANY engine — the same policy as
``pagerank_integer`` (integer mass) and ``nearest_centroid_confusion``
(rational centroids):

- vectors quantize to integer micros once (float→double exact, ×1e6
  correctly rounded, floor deterministic);
- a centroid is never a float mean but the RATIONAL ``(Σq_d, n)``;
- the squared distance to a centroid computes as the exact integer
  numerator ``Σ_d (q_d·n − S_d)²`` (int64 diffs, squared in double —
  correctly rounded — summed through DECIMAL(38,6), order-exact),
  then normalizes by ``n²`` with ONE IEEE division so distances are
  COMPARABLE ACROSS clusters of different sizes (without the
  normalization the numerator scales by each cluster's own ``n²`` and
  the argmin is biased toward small clusters — the collapse-to-one-
  cluster failure mode).  Cast and division are correctly-rounded
  IEEE ops on identical inputs → identical doubles on every engine;
- argmin ties break on the cluster id — a total order.

So K Lloyd steps produce the IDENTICAL assignment everywhere, and a
DuckDB oracle can unroll the same K steps and hash-match exactly —
float k-means never cross-checks like this.

Plan shape per step: centroids aggregate to ``k`` rows (two hash
aggregates over the exploded components — map-side partials make the
shuffle O(k·dims)), broadcast back, and every vector computes all k
distances in ONE whole-stage HOF fold over its own array: the corpus
never shuffles for assignment.  The K-step loop unrolls into one lazy
Catalyst plan; at real scale you would persist/localCheckpoint the
assignment between steps to cap plan growth — parameterized here via
``materialize``.

int64 bound: |q·n| ≤ 1e6·n_cluster — safe below ~9e12 rows/cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QSCALE = 1_000_000


def quantize(vec) -> F.Column:
    """float array column (Column or name) → exact integer-micro array
    (engine-portable)."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * QSCALE).cast("long")
    )


def _centroids(assigned: DataFrame) -> DataFrame:
    """(vec_id, q, cluster) → rational centroids (cluster, c, n_c):
    per-dimension component sums + member count."""
    sums = (
        assigned.select("cluster", F.posexplode("q").alias("dim", "qi"))
        .groupBy("cluster", "dim")
        .agg(F.sum("qi").alias("s"))
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "s"))),
                lambda t: t.s,
            ).alias("c")
        )
    )
    counts = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_c"))
    return sums.join(counts, "cluster")


def assign_step(vectors: DataFrame, cents: DataFrame) -> DataFrame:
    """One assignment pass: nearest rational centroid, ties → smaller
    cluster id.  ``vectors``: (vec_id, q); ``cents``: (cluster, c, n_c).
    The centroid relation broadcasts; the corpus does not shuffle."""
    dist = F.aggregate(
        F.zip_with(
            "q",
            "c",
            lambda qi, s: (
                (qi * F.col("n_c") - s).cast("double")
                * (qi * F.col("n_c") - s).cast("double")
            ).cast("decimal(38,6)"),
        ),
        F.lit(0).cast("decimal(38,6)"),
        lambda acc, x: acc + x,
    ).cast("double") / (
        # square in DOUBLE: an int64 n_c*n_c wraps silently above
        # ~3e9 members, far inside the documented 9e12 bound
        F.col("n_c").cast("double") * F.col("n_c").cast("double")
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cluster")
    return (
        vectors.crossJoin(F.broadcast(cents))
        .select("vec_id", "q", "cluster", dist.alias("dist"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "q", "cluster")
    )


def lloyd_refine(
    seeded: DataFrame, iters: int, materialize: bool = False
) -> DataFrame:
    """Run ``iters`` Lloyd steps from a seeded assignment.

    ``seeded``: (vec_id, q, cluster).  Returns the final assignment
    with the same schema.  ``materialize=True`` persists between steps
    (the scale knob — caps plan depth at many iterations)."""
    assigned = seeded
    for _ in range(iters):
        cents = _centroids(assigned)
        assigned = assign_step(assigned.select("vec_id", "q"), cents)
        if materialize:
            assigned = assigned.localCheckpoint(eager=False)
    return assigned
