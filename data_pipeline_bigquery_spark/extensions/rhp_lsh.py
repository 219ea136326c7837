"""Random-hyperplane (sign) LSH for embedding ANN — the bucketed
alternative to the IVF family in :mod:`extensions.similarity`.

Charikar's SimHash for vectors: ``n_bits`` fixed Gaussian hyperplanes
turn each embedding into a bit signature; two vectors agree on a bit
with probability ``1 - angle/pi``, so banding the signature (as in
MinHash LSH, `extensions/dedup_text.py`) makes *cosine-similar* vectors
collide in at least one band with high probability while the corpus
never does an all-pairs join.

Scale shape (the reason this exists next to IVF):

- The signature is computed MAP-SIDE — ``n_bits`` literal-plane dot
  folds per row, pure whole-stage codegen, no corpus shuffle and no
  training step (unlike IVF's k-means).  That makes RHP-LSH the right
  default when you cannot afford (or re-run) quantizer training —
  streaming corpora, one-shot batch jobs.
- Query banding is tiny and broadcast, so candidate generation is a
  map-side broadcast hash join against the corpus band rows: the only
  shuffles are over the CANDIDATE set (collisions), never the corpus.
- Exact cosine rerank on the collided pairs restores exactness within
  the candidate set, so recall is purely a collision-probability knob
  (``n_bits`` × ``band_bits``), tuned like MinHash band geometry.

No counterpart in the reference (pandas CRM ETL, no vectors); this is
part of the BASELINE.json similarity-search north star.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.extensions.similarity import (
    _dot,
    with_double_embedding,
)

# One fixed seed for the hyperplane draw: signatures must be identical
# across runs, sessions, and the batch/streaming boundary (same contract
# as the MinHash permutation constants in dedup_text.py).
PLANE_SEED = 7


def rhp_planes(dim: int, n_bits: int, seed: int = PLANE_SEED) -> list[list[float]]:
    """``n_bits`` deterministic Gaussian hyperplanes in R^dim.

    Drawn once with a pinned-seed PRNG and embedded as plan literals —
    a few KB even at 1024 dims, so they ride inside the serialized plan
    to every executor (no broadcast table needed, nothing to train)."""
    rnd = random.Random(seed)
    return [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]


def rhp_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature: ``array<int>`` of length ``n_bits``.

    Each bit is one literal-array dot fold (`zip_with`+`aggregate`,
    JVM codegen); a zero projection counts as positive so the bit is
    total (no nulls)."""
    bits = [
        F.when(
            _dot(vec, F.array(*[F.lit(float(x)) for x in plane])) >= 0, F.lit(1)
        ).otherwise(F.lit(0))
        for plane in planes
    ]
    return F.array(*bits)


def rhp_band_rows(
    df: DataFrame,
    planes: list[list[float]],
    band_bits: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Explode a signature into ``(id, vec, band, band_val)`` rows —
    one per band, band value packed as an int from ``band_bits``
    consecutive sign bits.  ``n_bits`` must divide evenly into bands.

    The carried vector makes the downstream rerank a map-side
    computation on the joined row; the explode factor is
    ``n_bits/band_bits`` (8 at the default 24/3), amortized by
    columnar compression of the duplicated arrays."""
    n_bits = len(planes)
    assert n_bits % band_bits == 0, "n_bits must be a multiple of band_bits"
    n_bands = n_bits // band_bits
    e = with_double_embedding(df, vec_col)
    # Each band value is packed from ONLY its own band_bits planes.
    # Building bands as slices of one shared signature expression reads
    # nicer but duplicates the full n_bits fold tree into every band
    # (higher-order functions defeat subexpression elimination), an
    # n_bands x overcharge on the map-side hot path — verified on the
    # optimized plan (tests/test_rhp_lsh.py pins the fold count).
    def band_val(b: int):
        bits = rhp_signature(F.col(vec_col), planes[b * band_bits : (b + 1) * band_bits])
        return F.aggregate(bits, F.lit(0), lambda acc, x: acc * 2 + x)

    bands = F.array(
        *[
            F.struct(F.lit(b).alias("band"), band_val(b).alias("band_val"))
            for b in range(n_bands)
        ]
    )
    return e.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("norm"),
        F.explode(bands).alias("bv"),
    ).select("id", "vec", "norm", "bv.band", "bv.band_val")


def rhp_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_bits: int = 24,
    band_bits: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed approximate cosine top-k.

    Plan: corpus → band rows (map-side signature, no shuffle) →
    broadcast-join the query band rows on ``(band, band_val)`` →
    exact cosine on each collision (map-side, vectors carried) →
    per-pair dedup + per-query top-k (the only shuffles, both sized by
    the candidate set).  Same output contract as
    :func:`similarity.cosine_topk` — ``(query_id, neighbor_id,
    cosine_sim)``, sims rounded to 6 decimals, id tie-breaks — so the
    recall-contract machinery applies unchanged.

    Band width is THE knob, and it must match the neighbor-similarity
    regime (measured sweep in PERFORMANCE.md "RHP-LSH band geometry"):
    a random pair collides per band at ``2^-band_bits``, so the
    candidate floor over ``B`` bands is ``1-(1-2^-band_bits)^B`` —
    3-bit bands price that floor at 66% (recall-favoring, right when
    neighbors are weak, as at fixture scale: recall 0.925/0.875),
    while 8-bit bands price it at ~2% (the scale geometry for real
    clustered embedding corpora, where cosine-0.9 neighbors keep
    recall 0.825 at 48 bits).  Like IVF, the index pays when
    amortized: cache/persist the corpus band rows once and the warm
    per-batch cost at 48/8 measured 28× faster than brute at 200k."""
    # one-row dim probe (arrays carry no length in the schema); bounded,
    # and at scale callers pass a corpus whose dim they already know via
    # the plane cache anyway
    first = with_double_embedding(corpus.limit(1), vec_col).select(
        F.size(vec_col).alias("d")
    ).collect()
    dim = first[0]["d"] if first else 0
    planes = rhp_planes(dim, n_bits)
    qb = F.broadcast(
        rhp_band_rows(queries, planes, band_bits, id_col, vec_col).select(
            F.col("id").alias("query_id"),
            F.col("vec").alias("q_vec"),
            F.col("norm").alias("q_norm"),
            "band",
            "band_val",
        )
    )
    cb = rhp_band_rows(corpus, planes, band_bits, id_col, vec_col).select(
        F.col("id").alias("neighbor_id"),
        F.col("vec").alias("c_vec"),
        F.col("norm").alias("c_norm"),
        "band",
        "band_val",
    )
    # rule 9: zero-norm vectors -> NULL cosine on both engines
    from data_pipeline_bigquery_spark.extensions.similarity import _nz

    sim = _dot(F.col("q_vec"), F.col("c_vec")) / _nz(
        F.col("q_norm") * F.col("c_norm")
    )
    scored = (
        cb.join(qb, ["band", "band_val"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(sim, 6).alias("cosine_sim"))
    )
    # a pair colliding in several bands is the same scored triple —
    # collapse with a keyed agg (one candidate-sized shuffle)
    uniq = scored.groupBy("query_id", "neighbor_id").agg(
        F.first("cosine_sim").alias("cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        uniq.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine_sim")
    )
