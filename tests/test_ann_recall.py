"""ANN quality gate: IVF (cell-probed) top-k must recall most of the
exact brute-force top-k — the property that matters at lake scale,
where brute force is the oracle you can no longer afford to run."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: ANN recall + artifact cache-vs-fresh-training proofs (contracts also covered by oracle parity at sf0.001)
pytestmark = _pytest_tier.mark.slow

from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.extensions.similarity import cosine_topk, ivf_topk

SF_DIR = "/root/testdata/sf0.001"


def _fixture(spark):
    emb = load(spark, SF_DIR, "embeddings")
    return emb, emb.filter(F.col("vec_id") < 8)


def _topk_sets(df):
    rows = df.collect()
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_recall_vs_bruteforce(spark):
    emb = load(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = _topk_sets(cosine_topk(queries, emb, k=5))
    ivf = _topk_sets(ivf_topk(queries, emb, k=5, nprobe=2, auto_cells=10))
    assert set(ivf) == set(exact)  # every query answered
    hits = sum(len(ivf[q] & exact[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    recall = hits / total
    # geometry-derived cells (ivf_assign_cells) at nprobe=2/nlist=10:
    # measured 0.975 here, 0.925 at sf0.01 — metadata-label cells
    # scored 0.275, which is why auto_cells exists
    assert recall >= 0.8, f"IVF recall@5 collapsed: {recall:.2f}"


def test_ivf_pq_recall(spark):
    """IVF-PQ + exact rerank: codes are 8 ints per 64-dim vector (64×
    compression), yet the rerank shortlist must keep recall in the same
    band as the uncompressed trained-IVF path (deterministic: seeds,
    sampling, and argmin ties are all pinned; 0.9 at sf0.01 AND sf0.1
    with the r10 occupancy-scaled shortlist — rerank=6 measured 0.40
    at sf0.1, see _ann_ivf_pq's scale rule)."""
    from data_pipeline_bigquery_spark.extensions.pq import ivf_pq_topk

    emb, queries = _fixture(spark)
    exact = _topk_sets(cosine_topk(queries, emb, k=5))
    pq = _topk_sets(
        ivf_pq_topk(
            queries, emb, k=5, nlist=10, nprobe=4, rerank=32,
            train_iters=1, pq_iters=1,
        )
    )
    assert set(pq) == set(exact)
    hits = sum(len(exact[q] & pq[q]) for q in exact)
    recall = hits / sum(len(exact[q]) for q in exact)
    assert recall >= 0.7, f"IVF-PQ recall@5 collapsed: {recall:.2f}"


def test_pq_adc_ranks_exact_duplicate_first(spark):
    """ADC-sanity pin the small-SF recall gates CANNOT provide: when the
    probed candidate pool fits inside the rerank·k shortlist, the exact
    rerank hides ANY garbage in the ADC scoring/encode (this is how a
    broken encode — pyspark binding the codeword index into a defaulted
    lambda parameter — passed every sf0.001/sf0.01 gate and only
    surfaced at sf1).  Here the pool (≈ corpus/nlist·nprobe = 800) far
    exceeds the shortlist (rerank·k = 10), so the planted exact
    duplicates reach the output ONLY if their ADC ranks them into the
    shortlist."""
    import math

    from data_pipeline_bigquery_spark.extensions.pq import ivf_pq_topk

    dim, n = 16, 4000
    rows = []
    for i in range(n):
        # deterministic pseudo-random vectors, DISTINCT for every i (no
        # modular repetition — a corpus with accidental exact copies
        # gives PQ legitimate near-ties and makes top-1 meaningless)
        rows.append(
            (
                i,
                [
                    math.sin(i * 12.9898 + j * 78.233) * 43758.5453 % 1.0
                    - 0.5
                    for j in range(dim)
                ],
            )
        )
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.filter(F.col("vec_id") < 4)
    # plant one exact duplicate of each query deep in the id range
    dups = queries.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    full = corpus.unionByName(dups)
    out = ivf_pq_topk(
        queries, full, k=5, nlist=5, nprobe=1, rerank=2,
        train_iters=1, pq_iters=1,
    )
    got = {
        r.query_id: [r2.neighbor_id for r2 in out.filter(
            F.col("query_id") == r.query_id
        ).orderBy(F.col("cosine_sim").desc(), "neighbor_id").collect()]
        for r in queries.select(F.col("vec_id").alias("query_id")).collect()
    }
    for q, nids in got.items():
        assert nids and nids[0] == q + 1_000_000, (
            f"query {q}: exact duplicate not ranked first "
            f"(got {nids[:3]}) — ADC scoring/encode is broken"
        )


def test_pq_cached_artifacts_match_fresh_training(spark, tmp_path, monkeypatch):
    """The contract's artifact cache must be invisible in the results:
    JSON round-trips the trained floats exactly, so the cached run's
    literal expressions — and therefore every emitted row — are
    bit-identical to inline training.  Drives the REAL query fn twice
    (cold → trains + persists, warm → loads) against a fresh inline
    ivf_pq_topk, with the cache redirected under tmp_path."""
    import json

    from data_pipeline_bigquery_spark.extensions.pq import ivf_pq_topk
    from data_pipeline_bigquery_spark.queries import extensions as qext

    cache_dir = tmp_path / "pq_artifact_cache"
    monkeypatch.setattr(qext, "_PQ_CACHE_DIR", str(cache_dir))

    cold = sorted(map(tuple, qext._ann_ivf_pq(spark, SF_DIR).collect()))
    files = list(cache_dir.glob("*.json"))
    assert len(files) == 1  # trained once, persisted
    art = json.loads(files[0].read_text())
    assert art["centroids"] and art["codebooks"]

    warm = sorted(map(tuple, qext._ann_ivf_pq(spark, SF_DIR).collect()))
    assert list(cache_dir.glob("*.json")) == files  # cache HIT, no retrain
    fresh = sorted(
        map(
            tuple,
            ivf_pq_topk(
                *(lambda e: (e.filter(F.col("vec_id") < 8), e))(
                    load(spark, SF_DIR, "embeddings")
                ),
                k=5, nprobe=4, rerank=32, **qext._PQ_PARAMS,
            ).collect(),
        )
    )
    assert cold == warm == fresh


def test_reuse_centroids_cache_matches_fresh_training(spark, tmp_path, monkeypatch):
    """Same equivalence pin as the PQ cache, for the reuse-centroids
    contract: cold (train+persist) == warm (load) == fresh inline."""
    from data_pipeline_bigquery_spark.queries import extensions as qext

    cache_dir = tmp_path / "pq_artifact_cache"
    monkeypatch.setattr(qext, "_PQ_CACHE_DIR", str(cache_dir))
    cold = sorted(
        map(tuple, qext._ann_reuse_centroids_recall(spark, SF_DIR).collect())
    )
    files = list(cache_dir.glob("ivfcent-*.json"))
    assert len(files) == 1
    warm = sorted(
        map(tuple, qext._ann_reuse_centroids_recall(spark, SF_DIR).collect())
    )
    assert list(cache_dir.glob("ivfcent-*.json")) == files  # HIT
    assert cold == warm and cold  # non-empty: the recall gate passed


def test_ivf_trained_cache_matches_fresh_training(spark, tmp_path, monkeypatch):
    """Equivalence pin for the trained-IVF contract's quantizer cache:
    cold (train+persist) == warm (load) == the pre-cache inline form
    (ivf_topk training internally with the same hyperparameters)."""
    from data_pipeline_bigquery_spark.queries import extensions as qext

    cache_dir = tmp_path / "pq_artifact_cache"
    monkeypatch.setattr(qext, "_PQ_CACHE_DIR", str(cache_dir))
    cold = sorted(map(tuple, qext._ann_ivf_trained(spark, SF_DIR).collect()))
    assert len(list(cache_dir.glob("ivfcent-*.json"))) == 1
    warm = sorted(map(tuple, qext._ann_ivf_trained(spark, SF_DIR).collect()))
    emb = load(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    fresh = sorted(
        map(
            tuple,
            ivf_topk(
                queries, emb, k=5, nprobe=2, auto_cells=10, train_iters=2
            ).collect(),
        )
    )
    assert cold == warm == fresh and cold


def test_artifact_cache_misses_on_fixture_drift(spark, tmp_path, monkeypatch):
    """The cache key must track the SOURCE, not just the params: a
    changed embeddings file (same path, new mtime) must MISS and
    retrain — a stale quantizer served against new data is the silent
    failure mode of every persisted-index design."""
    import shutil

    from data_pipeline_bigquery_spark.queries import extensions as qext

    sfdir = tmp_path / "sf"
    sfdir.mkdir()
    shutil.copy(f"{SF_DIR}/embeddings.parquet", sfdir / "embeddings.parquet")
    cache_dir = tmp_path / "pq_artifact_cache"
    monkeypatch.setattr(qext, "_PQ_CACHE_DIR", str(cache_dir))

    qext._ann_ivf_trained(spark, str(sfdir)).collect()
    assert len(list(cache_dir.glob("ivfcent-*.json"))) == 1
    # same bytes, same mtime → HIT
    qext._ann_ivf_trained(spark, str(sfdir)).collect()
    assert len(list(cache_dir.glob("ivfcent-*.json"))) == 1
    # touch the fixture (mtime moves) → MISS, retrain under a new key
    import os

    st = os.stat(sfdir / "embeddings.parquet")
    os.utime(sfdir / "embeddings.parquet", ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    qext._ann_ivf_trained(spark, str(sfdir)).collect()
    assert len(list(cache_dir.glob("ivfcent-*.json"))) == 2


def test_artifact_cache_covers_directory_tables(spark, tmp_path, monkeypatch):
    """r14 (r13 VERDICT #9): a Spark-written parquet DIRECTORY must hit
    the artifact cache too — the old single-file-only fingerprint made
    every sf1 ANN-contract run retrain the quantizer from cold.  The
    key must cover every file under the path: an in-place part-file
    rewrite that leaves the directory mtime untouched must MISS."""
    import os
    import shutil

    from data_pipeline_bigquery_spark.queries import extensions as qext

    sfdir = tmp_path / "sf"
    sfdir.mkdir()
    # directory layout: the fixture file becomes a part file inside
    # embeddings.parquet/ (exactly how make_scaled_sf writes sf1)
    tdir = sfdir / "embeddings.parquet"
    tdir.mkdir()
    shutil.copy(f"{SF_DIR}/embeddings.parquet", tdir / "part-00000.parquet")
    cache_dir = tmp_path / "pq_artifact_cache"
    monkeypatch.setattr(qext, "_PQ_CACHE_DIR", str(cache_dir))

    cold = sorted(map(tuple, qext._ann_ivf_trained(spark, str(sfdir)).collect()))
    assert len(list(cache_dir.glob("ivfcent-*.json"))) == 1  # trained + persisted
    warm = sorted(map(tuple, qext._ann_ivf_trained(spark, str(sfdir)).collect()))
    assert len(list(cache_dir.glob("ivfcent-*.json"))) == 1  # HIT, no retrain
    assert cold == warm and cold

    # in-place part rewrite with the DIRECTORY mtime pinned → must MISS
    dir_st = os.stat(tdir)
    part = tdir / "part-00000.parquet"
    st = os.stat(part)
    os.utime(part, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    os.utime(tdir, ns=(dir_st.st_atime_ns, dir_st.st_mtime_ns))
    qext._ann_ivf_trained(spark, str(sfdir)).collect()
    assert len(list(cache_dir.glob("ivfcent-*.json"))) == 2  # retrained


def test_ivf_trained_quantizer_recall(spark):
    """Sampled-k-means quantizer: recall must stay usable.  On this
    fixture (10 planted label clusters) the lowest-id seeds already sit
    one-per-cluster, so training doesn't beat them — measured 0.90 here
    vs 0.975 for seeds; the gate guards against collapse, the win shows
    up on real (non-planted) distributions."""
    emb = load(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = _topk_sets(cosine_topk(queries, emb, k=5))
    ivf = _topk_sets(ivf_topk(queries, emb, k=5, nprobe=2, auto_cells=10, train_iters=2))
    assert set(ivf) == set(exact)
    hits = sum(len(ivf[q] & exact[q]) for q in exact)
    recall = hits / sum(len(exact[q]) for q in exact)
    assert recall >= 0.7, f"trained-IVF recall@5 collapsed: {recall:.2f}"


def test_trained_centroids_unit_norm_and_deterministic(spark):
    from data_pipeline_bigquery_spark.extensions.similarity import train_ivf_centroids

    emb = load(spark, SF_DIR, "embeddings")
    c1 = {r.cell: r.centroid for r in train_ivf_centroids(emb, nlist=6, iters=2).collect()}
    c2 = {
        r.cell: r.centroid
        for r in train_ivf_centroids(emb.repartition(5), nlist=6, iters=2).collect()
    }
    assert set(c1) == set(range(6))
    for cell, v in c1.items():
        assert abs(sum(x * x for x in v) - 1.0) < 1e-9  # spherical: unit norm
        # partition-layout independent up to fp summation noise in avg()
        assert max(abs(a - b) for a, b in zip(v, c2[cell])) < 1e-9


def test_similarity_topk_auto_routing(spark):
    """The measured routing rule (PERFORMANCE.md "ANN crossover"):
    brute force unless the work amortizes — a small corpus OR a query
    batch smaller than the cell count goes brute (one-shot assignment
    alone costs corpus×nlist folds vs brute's corpus×n_queries);
    supplied offline centroids take the IVF fast path, recall-gated."""
    from data_pipeline_bigquery_spark.extensions.similarity import (
        AUTO_TOPK_BRUTE_MAX,
        similarity_topk,
        train_ivf_centroids,
    )

    emb = load(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)

    exact = _topk_sets(cosine_topk(queries, emb, k=5))
    small = _topk_sets(similarity_topk(queries, emb, k=5))
    assert small == exact  # small corpus: identical to brute force

    # large corpus but a small batch (8 queries < 64 cells): brute is
    # provably cheaper than one-shot assignment -> still exact
    big_small_batch = _topk_sets(
        similarity_topk(queries, emb, k=5, corpus_rows=AUTO_TOPK_BRUTE_MAX + 1)
    )
    assert big_small_batch == exact

    # large corpus + batch larger than auto_cells: one-shot IVF with
    # sample-trained quantizer, recall-gated
    many = emb.filter(F.col("vec_id") < 40)
    exact_many = _topk_sets(cosine_topk(many, emb, k=5))
    # (corpus_rows is forced, so the auto sample pct is sized for a
    # 100k corpus over a 500-vector fixture — probe an extra cell to
    # compensate for the deliberately mis-scaled quantizer)
    ivf_many = _topk_sets(
        similarity_topk(
            many, emb, k=5, corpus_rows=AUTO_TOPK_BRUTE_MAX + 1,
            auto_cells=10, nprobe=4,
        )
    )
    hits = sum(len(ivf_many[q] & exact_many[q]) for q in exact_many)
    recall = hits / sum(len(exact_many[q]) for q in exact_many)
    assert recall >= 0.7, f"one-shot IVF recall collapsed: {recall:.2f}"

    # offline centroids: the amortized fast path, recall-gated
    cents = train_ivf_centroids(emb, nlist=10, iters=2)
    reuse = _topk_sets(similarity_topk(queries, emb, k=5, centroids=cents, nprobe=3))
    hits = sum(len(reuse[q] & exact[q]) for q in exact)
    recall = hits / sum(len(exact[q]) for q in exact)
    assert recall >= 0.7, f"centroid-reuse recall collapsed: {recall:.2f}"


def test_recall_contract_gate_empties_on_bad_approx(spark):
    """The DuckDB-independent recall contract (round-5 rework): output
    is the exact top-k pair set gated on recall.  A good approx arm
    passes the pairs through unchanged; a garbage approx arm (neighbors
    that exist nowhere in the exact set) must empty the output so the
    driver's row-count check goes red."""
    from data_pipeline_bigquery_spark.queries.extensions import _recall_contract

    emb = load(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = cosine_topk(queries, emb, k=5)

    good = _recall_contract(spark, SF_DIR, exact, bound=0.8)
    assert sorted(map(tuple, good.collect())) == sorted(map(tuple, exact.collect()))

    garbage = exact.select(
        "query_id", (F.col("neighbor_id") + F.lit(10_000_000)).alias("neighbor_id")
    )
    assert _recall_contract(spark, SF_DIR, garbage, bound=0.8).count() == 0


def test_assign_cells_arrow_agrees_with_fold(spark):
    """The Arrow matmul assignment must agree with the exact-fold form
    (disagreement is possible only on sub-rounding ties at the 6th
    decimal, which the fixture geometry doesn't produce)."""
    from data_pipeline_bigquery_spark.extensions.similarity import (
        assign_cells,
        assign_cells_arrow,
        train_ivf_centroids,
    )

    emb = load(spark, SF_DIR, "embeddings")
    cents = train_ivf_centroids(emb, nlist=10, iters=1)
    fold = {r.vec_id: r.cell for r in assign_cells(emb, cents).collect()}
    arrow = {r.vec_id: r.cell for r in assign_cells_arrow(emb, cents).collect()}
    assert set(fold) == set(arrow)
    agree = sum(fold[k] == arrow[k] for k in fold) / len(fold)
    assert agree >= 0.995, f"arrow assignment diverged: {agree:.4f}"


def test_pq_codebooks_without_centroids_rejected(spark):
    """Codebooks quantize residuals against the centroids they were
    trained with; injecting codebooks alone would apply them to
    residuals of freshly-trained (different) centroids and silently
    produce garbage ADC scores — the seam must raise instead
    (ADVICE r11)."""
    import pytest

    from data_pipeline_bigquery_spark.extensions.pq import ivf_pq_topk

    emb, queries = _fixture(spark)
    with pytest.raises(ValueError, match="both or neither"):
        ivf_pq_topk(queries, emb, codebooks={(0, 0): [0.0] * 8})
