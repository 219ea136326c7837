"""Product quantization on top of the trained IVF — the FAISS IVF-PQ
shape, Spark-first.

Pipeline: train coarse centroids (``train_ivf_centroids``) → residual
r = v − centroid(cell) → split r into ``m_subspaces`` subvectors →
per-subspace k-means codebook (``k_codes`` codes) on a hash-stable
sample → encode every vector as ``m_subspaces`` small ints → at query
time score candidates by ADC (asymmetric distance computation:
dot(q, centroid) + Σ_m dot(q_sub, codebook[m][code_m])) and re-rank a
shortlist exactly.

Scale shape — the part that matters at 100 TB:

* Codebooks are KBs (m·k·dsub doubles).  They train on a sample with
  the same driver round-trip as the IVF coarse quantizer, then embed
  into the ENCODING EXPRESSION as literal nested arrays: encoding is a
  pure codegen projection over the corpus — no join, no shuffle, no
  N×M×K row blowup.  Encoded vectors are m bytes instead of dim
  doubles (64× compression at dim=64, m=8), which is what lets a
  100 TB corpus's index fit a cluster's memory.
* Query scoring touches only the ``nprobe`` probed cells and reads the
  code arrays; only the shortlist (``rerank × k`` rows/query) ever
  sees full vectors again.

Determinism: sampling is md5-bucketed, seeds are lowest-id subvectors,
argmin ties break on the lowest code index (``array_position`` returns
the first minimum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.extensions.similarity import (
    _dot,
    _nz,
    assign_cells,
    train_ivf_centroids,
    with_double_embedding,
)


def _codebook_literal(codebooks: dict[tuple[int, int], list[float]], m: int, k: int) -> Column:
    """Nested array literal ``CB[m][k] = codevector`` — embeds the
    (tiny) codebook into the expression tree so encode/score run as
    whole-stage codegen with zero joins."""
    return F.array(
        *[
            F.array(
                *[
                    F.array(*[F.lit(float(x)) for x in codebooks[(mi, ki)]])
                    for ki in range(k)
                ]
            )
            for mi in range(m)
        ]
    )


def _sub(vec: Column, mi: int, dsub: int) -> Column:
    """Subvector ``m`` of a flat vector (1-based slice)."""
    return F.slice(vec, mi * dsub + 1, dsub)


def _sq_dist(a: Column, b: Column) -> Column:
    # ONE zip_with: (x−y)·(x−y) per element — bit-identical to the
    # former d=zip_with(a,b,−); zip_with(d,d,·) form (the two evals of
    # x−y were the same computation) at half the array allocations,
    # which matters at encode volume (corpus × m × k evaluations)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def train_pq_codebooks(
    residuals: DataFrame,
    m_subspaces: int = 8,
    k_codes: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    resid_col: str = "resid",
    dim: int | None = None,
) -> dict[tuple[int, int], list[float]]:
    """Per-subspace Lloyd k-means over residual subvectors.

    Each iteration: assignment is a codegen projection (literal
    codebook, argmin via ``array_position`` of the min distance), the
    recompute one keyed aggregation on ``(m, code, pos)``.  The
    codebook round-trips the driver per step — m·k·dsub doubles, KBs —
    exactly like the coarse-quantizer trainer it mirrors."""
    if dim is None:
        dim = len(residuals.select(resid_col).first()[0])
    dsub = dim // m_subspaces
    sub = residuals.select(
        F.col(id_col).alias("tid"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(mi).alias("m"), _sub(F.col(resid_col), mi, dsub).alias("sv"))
                    for mi in range(m_subspaces)
                ]
            )
        ).alias("e"),
    ).select("tid", "e.m", "e.sv")

    # deterministic seeds: the k lowest-id subvectors per subspace
    w = Window.partitionBy("m").orderBy("tid")
    seed_rows = (
        sub.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k_codes)
        .select("m", (F.col("rn") - 1).alias("code"), "sv")
        .collect()
    )
    cb: dict[tuple[int, int], list[float]] = {
        (r.m, r.code): list(r.sv) for r in seed_rows
    }
    for mi in range(m_subspaces):  # pad degenerate tiny inputs
        for ki in range(k_codes):
            cb.setdefault((mi, ki), [0.0] * dsub)

    for _ in range(max(iters, 0)):
        lit_cb = _codebook_literal(cb, m_subspaces, k_codes)
        cbm = F.element_at(lit_cb, F.col("m") + 1)
        dists = F.transform(cbm, lambda cv: _sq_dist(F.col("sv"), cv))
        # two-select split: the k-element distance array feeds BOTH
        # array_position and array_min — materialized once per row
        # here, it would be computed twice inlined (CollapseProject
        # keeps multi-referenced non-cheap producers, the minhash
        # fused-build pattern)
        assigned = sub.select("m", "sv", dists.alias("__d")).select(
            "m",
            "sv",
            (F.array_position(F.col("__d"), F.array_min(F.col("__d"))) - 1)
            .cast("int")
            .alias("code"),
        )
        new = (
            assigned.select("m", "code", F.posexplode("sv").alias("pos", "x"))
            .groupBy("m", "code", "pos")
            .agg(F.avg("x").alias("cx"))
            .groupBy("m", "code")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "cx"))).alias("pc"))
            .select("m", "code", F.expr("transform(pc, p -> p.cx)").alias("cv"))
            .collect()
        )
        cb = {**cb, **{(r.m, r.code): list(r.cv) for r in new}}
    return cb


def train_ivf_pq_artifacts(
    corpus: DataFrame,
    nlist: int = 16,
    m_subspaces: int = 8,
    k_codes: int = 16,
    train_iters: int = 2,
    pq_iters: int = 2,
    sample_pct: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[tuple[int, list[float]]], dict[tuple[int, int], list[float]]]:
    """The TRAINING half of :func:`ivf_pq_topk`, returned as plain
    driver values ``(centroid rows, codebooks)`` so a caller can
    persist them (both are KBs of doubles; JSON round-trips Python
    floats exactly via shortest-repr, so a reloaded artifact rebuilds
    the IDENTICAL literal expressions) and amortize training across
    runs — the offline-train / online-encode split every production
    IVF-PQ deployment uses.  Same determinism guarantees as the inline
    path: this IS the inline path, factored out."""
    centroids = train_ivf_centroids(
        corpus, nlist=nlist, iters=train_iters, sample_pct=sample_pct,
        id_col=id_col, vec_col=vec_col,
    )
    assigned = assign_cells(corpus, centroids, id_col=id_col, vec_col=vec_col)
    cmap = F.broadcast(centroids.select("cell", F.col("centroid").alias("c_vec")))
    with_resid = assigned.join(cmap, "cell").select(
        F.col(id_col),
        F.zip_with(vec_col, "c_vec", lambda x, c: x - c).alias("resid"),
    )
    dim = len(corpus.select(vec_col).first()[0])
    cb = train_pq_codebooks(
        with_resid,
        m_subspaces=m_subspaces,
        k_codes=k_codes,
        iters=pq_iters,
        id_col=id_col,
        dim=dim,
    )
    cent_rows = [
        (r.cell, list(r.centroid))
        for r in centroids.orderBy("cell").collect()
    ]
    return cent_rows, cb


def ivf_pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    m_subspaces: int = 8,
    k_codes: int = 16,
    train_iters: int = 2,
    pq_iters: int = 2,
    rerank: int = 4,
    sample_pct: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    codebooks: dict[tuple[int, int], list[float]] | None = None,
) -> DataFrame:
    """IVF-PQ ANN with exact re-ranking.

    1. coarse quantizer: sampled spherical k-means (shared with
       ``ann_ivf_trained_recall_contract``); corpus → cells via broadcast argmax.
    2. PQ codebooks on cell residuals; corpus encoded to ``m`` codes by
       a literal-codebook codegen projection.
    3. each query probes its ``nprobe`` best cells, scores in-cell
       candidates by ADC on the codes alone, keeps ``rerank·k`` per
       query, then re-ranks that shortlist with exact cosine.

    Returns ``(query_id, neighbor_id, cosine_sim)`` like the exact
    top-k — sims on the shortlist are exact, so downstream thresholds
    behave identically.

    ``centroids``/``codebooks`` inject pre-trained artifacts (from
    :func:`train_ivf_pq_artifacts`, possibly persisted) so the run
    measures encode + probe only; omitted, each trains inline —
    bit-identical results either way (training is deterministic and
    the artifacts round-trip the driver as plain floats in BOTH
    modes).  The two are COUPLED: codebooks quantize residuals
    *against these centroids*, so an injected codebook dict is only
    meaningful alongside the centroid frame from the SAME
    ``train_ivf_pq_artifacts`` run — codebooks without centroids
    would be applied to residuals of freshly-trained (different)
    centroids and silently produce garbage ADC scores, so that
    combination raises.  Centroids alone are fine (codebooks then
    train inline on the correct residuals)."""
    if codebooks is not None and centroids is None:
        raise ValueError(
            "ivf_pq_topk: injected codebooks require the centroids from "
            "the same train_ivf_pq_artifacts run (codebooks quantize "
            "residuals against those centroids); pass both or neither"
        )
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, nlist=nlist, iters=train_iters, sample_pct=sample_pct,
            id_col=id_col, vec_col=vec_col,
        )
    assigned = assign_cells(corpus, centroids, id_col=id_col, vec_col=vec_col)
    cmap = F.broadcast(centroids.select("cell", F.col("centroid").alias("c_vec")))
    with_resid = (
        assigned.join(cmap, "cell")
        .select(
            "cell",
            F.col(id_col).alias("nid"),
            F.col(vec_col).alias("vec"),
            F.zip_with(vec_col, "c_vec", lambda x, c: x - c).alias("resid"),
        )
    )
    # PQ training on the residuals (optionally sampled upstream),
    # unless pre-trained codebooks were injected
    dim = len(corpus.select(vec_col).first()[0])
    cb = codebooks if codebooks is not None else train_pq_codebooks(
        with_resid.select(F.col("nid").alias(id_col), "resid"),
        m_subspaces=m_subspaces,
        k_codes=k_codes,
        iters=pq_iters,
        id_col=id_col,
        dim=dim,
    )
    dsub = dim // m_subspaces
    lit_cb = _codebook_literal(cb, m_subspaces, k_codes)

    # encode in two projections (same split as the trainer): the m
    # k-element distance arrays materialize once per row, then the
    # argmin reads each twice for free — inlined, every array would be
    # evaluated 2× (array_position + array_min), doubling the encode,
    # the key's dominant cost at corpus scale
    def _dist_col(mi: int) -> Column:
        # bind mi through a def, NEVER a defaulted lambda parameter:
        # pyspark passes (element, index) to any 2-parameter lambda —
        # a `lambda cv, _mi=mi:` silently receives the CODEWORD INDEX
        # as _mi and encodes garbage (caught by the sf1 duplicate-probe
        # spot check; pinned by test_pq_adc_ranks_exact_duplicate_first)
        return F.transform(
            F.element_at(lit_cb, mi + 1),
            lambda cv: _sq_dist(_sub(F.col("resid"), mi, dsub), cv),
        ).alias(f"__d_{mi}")

    dist_cols = [_dist_col(mi) for mi in range(m_subspaces)]
    encoded = with_resid.select("cell", "nid", "vec", *dist_cols).select(
        "cell",
        "nid",
        "vec",
        F.array(
            *[
                (
                    F.array_position(
                        F.col(f"__d_{mi}"), F.array_min(F.col(f"__d_{mi}"))
                    )
                    - 1
                ).cast("int")
                for mi in range(m_subspaces)
            ]
        ).alias("codes"),
    )

    # query → nprobe cells (broadcast centroid table, like ivf_topk)
    q = with_double_embedding(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    qc = F.broadcast(centroids).crossJoin(q)
    csim = _dot(F.col("q_vec"), F.col("centroid")) / _nz(
        F.sqrt(_dot(F.col("q_vec"), F.col("q_vec")))
        * F.sqrt(_dot(F.col("centroid"), F.col("centroid")))
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("csim").desc(), F.col("cell").asc())
    probe = (
        qc.select("query_id", "q_vec", "cell", "centroid", csim.alias("csim"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "q_vec", "cell", "centroid")
    )

    # ADC: dot(q, centroid) + sum_m dot(q_sub_m, codebook[m][code_m])
    adc = _dot(F.col("q_vec"), F.col("centroid")) + F.aggregate(
        F.sequence(F.lit(0), F.lit(m_subspaces - 1)),
        F.lit(0.0),
        lambda acc, mi: acc
        + _dot(
            F.slice(F.col("q_vec"), mi * dsub + 1, dsub),
            F.element_at(
                F.element_at(lit_cb, mi + 1), F.element_at(F.col("codes"), mi + 1) + 1
            ),
        ),
    )
    cand = (
        probe.join(encoded, "cell")
        .filter(F.col("query_id") != F.col("nid"))
        .select("query_id", "q_vec", "nid", "vec", adc.alias("approx"))
    )
    ws = Window.partitionBy("query_id").orderBy(F.col("approx").desc(), F.col("nid").asc())
    shortlist = cand.withColumn("rn", F.row_number().over(ws)).filter(
        F.col("rn") <= rerank * k
    )
    sim = _dot(F.col("q_vec"), F.col("vec")) / _nz(
        F.sqrt(_dot(F.col("q_vec"), F.col("q_vec")))
        * F.sqrt(_dot(F.col("vec"), F.col("vec")))
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        shortlist.select(
            "query_id",
            F.col("nid").alias("neighbor_id"),
            F.round(sim, 6).alias("cosine_sim"),
        )
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine_sim")
    )
