"""Training-data pipeline batch 3 — feature-engineering and curation
staples a large-scale training pipeline needs beyond dedup/sampling:

- ``target_encoding_loo``: leave-one-out target encoding, THE classic
  high-cardinality categorical feature for tabular models.  Per order,
  the mean target (price cents) of its customer segment EXCLUDING the
  row itself — the exclusion is what stops the feature from leaking
  the label.  Scale shape: a 5-row per-segment aggregate broadcast back
  onto the fact table (NOT a window over giant low-cardinality
  partitions, which would put whole segments on single tasks).
- ``negative_sampling``: deterministic contrastive negatives — per
  user, the event types they never interacted with, ranked by md5 so
  every re-run (and the oracle) picks the identical negatives.  The
  candidate space is users × event-type dim (broadcast), minus
  positives via anti-join — never a shuffle of the fact table.
- ``cross_val_folds``: md5-bucket k-fold assignment with per-fold
  volume stats; deterministic folds are what make CV results
  reproducible across engines and re-runs.
- ``feature_hashing``: the hashing trick — vocabulary-free feature
  buckets from md5(word) % 64, with per-bucket token/doc/collision
  stats.  Per-bucket distinct-word counts make hash-collision load
  measurable before training eats it silently.
- ``reservoir_per_group``: fixed-size uniform-without-replacement
  sample per language via md5 ranking — one window over the group key,
  no driver-side reservoir state, identical sample every run.
- ``k_anonymity_audit``: privacy gate — quasi-identifier groups
  (segment × nation) smaller than k expose their members to
  re-identification; reports group and at-risk-row counts per segment.
- ``tokenizer_fertility``: chars-per-token by language — the
  tokenizer-efficiency metric multilingual corpus work tracks (high
  fertility = the tokenizer fragments that language).
- ``knn_label_accuracy``: leave-one-out 1-NN label agreement over the
  embedding corpus — the standard embedding-quality probe.  Exact
  brute-force here (it doubles as the exactness oracle); at corpus
  scale the same argmax routes through the IVF candidate path
  (`extensions/similarity.py`), which prunes the pair space to probed
  cells.

Parity discipline: money in integer cents (DECIMAL-free — floor(x*100
+ 0.5) like `ewma_event_value`), shares as integer permille (`div` /
`//`), md5 for every pseudo-random choice, and dot products rounded to
9 digits before ranking (the `ann_*_recall_contract` convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.functions.text import ascii_lower
from data_pipeline_bigquery_spark.extensions.sampling import hash_bucket
from data_pipeline_bigquery_spark.queries import QuerySpec

_N_FOLDS = 5
_N_HASH_BUCKETS = 64
_K_ANON = 5
_RESERVOIR_K = 5
_NEG_K = 2


def _target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOO mean segment price per order: (seg_sum − own) / (seg_n − 1).

    The per-segment totals are a 5-row aggregate joined back broadcast;
    the fact table is scanned once and never shuffles on the
    low-cardinality segment (a window would hash-partition 100 TB of
    orders onto 5 tasks)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("seg")
    )
    j = o.join(c, o.o_custkey == c.c_custkey).select("o_orderkey", "seg", "cents")
    seg_stats = j.groupBy("seg").agg(
        F.sum("cents").alias("seg_cents"), F.count(F.lit(1)).alias("seg_n")
    )
    return (
        j.join(F.broadcast(seg_stats), "seg")
        .select(
            "o_orderkey",
            "seg",
            (
                (F.col("seg_cents") - F.col("cents")).cast("double")
                / (F.col("seg_n") - F.lit(1)).cast("double")
            ).alias("loo_mean_cents"),
        )
    )


_TARGET_ENC_SQL = """
WITH j AS (
  SELECT o_orderkey, c_mktsegment AS seg,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey),
s AS (SELECT seg, CAST(sum(cents) AS BIGINT) AS seg_cents,
             CAST(count(*) AS BIGINT) AS seg_n
      FROM j GROUP BY seg)
SELECT o_orderkey, j.seg,
       CAST(seg_cents - cents AS DOUBLE) / CAST(seg_n - 1 AS DOUBLE)
         AS loo_mean_cents
FROM j JOIN s ON j.seg = s.seg
"""


def _negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user, the md5-top-{_NEG_K} event types they interact with
    LESS than their own per-type average — the implicit-feedback
    negative definition (dense logs have no never-touched items; the
    contrastive negative is the one the user demonstrably under-
    engages).  Membership is integer-exact (n_t·n_types < total, no
    float mean) and the ranking is md5(user:type), so the sample is
    identical across runs and engines.

    Scale shape: one (user, type)-keyed count, a broadcast of the tiny
    type dimension to materialize absent types as zero-count rows, one
    user-keyed top-k window — nothing scales beyond the first keyed
    aggregate."""
    ev = load(spark, sf_dir, "events")
    # ONE events scan: the type dimension and user domain both derive
    # from the (user, type) count frame (identical sets — a type or
    # user exists iff it has a count row), and the grid feeds both the
    # totals and the negative filter — lineage cuts (rule 14); the
    # pre-cut plan re-scanned events 6×
    counts = (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_t"))
        .localCheckpoint(eager=False)
    )
    types = counts.select("event_type").distinct()
    grid = (
        counts.select("user_id")
        .distinct()
        .join(F.broadcast(types), how="cross")
        .join(counts, ["user_id", "event_type"], "left")
        .withColumn("n_t", F.coalesce(F.col("n_t"), F.lit(0)))
        .localCheckpoint(eager=False)
    )
    totals = grid.groupBy("user_id").agg(
        F.sum("n_t").alias("total"), F.count(F.lit(1)).alias("n_types")
    )
    neg = grid.join(totals, "user_id").filter(
        F.col("n_t") * F.col("n_types") < F.col("total")
    )
    rk = F.row_number().over(
        Window.partitionBy("user_id").orderBy(
            F.md5(
                F.concat_ws(":", F.col("user_id").cast("string"), "event_type")
            ),
            "event_type",
        )
    )
    return (
        neg.withColumn("rk", rk)
        .filter(F.col("rk") <= _NEG_K)
        .select("user_id", F.col("event_type").alias("neg_event_type"), "rk")
    )


_NEG_SAMPLING_SQL = f"""
WITH counts AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_t
  FROM events GROUP BY 1, 2),
types AS (SELECT DISTINCT event_type FROM events),
grid AS (
  SELECT u.user_id, t.event_type, COALESCE(c.n_t, 0) AS n_t
  FROM (SELECT DISTINCT user_id FROM events) u
  CROSS JOIN types t
  LEFT JOIN counts c
    ON c.user_id = u.user_id AND c.event_type = t.event_type),
totals AS (
  SELECT user_id, CAST(sum(n_t) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS n_types
  FROM grid GROUP BY user_id),
ranked AS (
  SELECT g.user_id, g.event_type,
         CAST(row_number() OVER (
           PARTITION BY g.user_id
           ORDER BY md5(CAST(g.user_id AS VARCHAR) || ':' || g.event_type),
                    g.event_type) AS INT) AS rk
  FROM grid g JOIN totals t ON g.user_id = t.user_id
  WHERE g.n_t * t.n_types < t.total)
SELECT user_id, event_type AS neg_event_type, rk
FROM ranked WHERE rk <= {_NEG_K}
"""


def _cross_val_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment (md5(doc_id) % k) with per-fold
    doc, token, and char volumes — the reproducibility receipt a CV
    harness checks before trusting fold-to-fold comparisons."""
    docs = load(spark, sf_dir, "documents").select(
        hash_bucket(F.col("doc_id"), _N_FOLDS).alias("fold"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        "n_chars",
    )
    return docs.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )


_CV_FOLDS_SQL = f"""
WITH d AS (
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT)
           % {_N_FOLDS} AS fold,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, n_chars
  FROM documents)
SELECT fold, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM d GROUP BY fold
"""


def _feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick buckets: md5(word) % {_N_HASH_BUCKETS}, with token
    count, distinct-word count (collision load), and doc frequency per
    bucket.  One explode + one keyed agg; the bucket key bounds the
    shuffle at any corpus size."""
    words = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    return (
        words.withColumn("bucket", hash_bucket(F.col("word"), _N_HASH_BUCKETS))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("word").alias("n_distinct_words"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


_FEATURE_HASHING_SQL = f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
b AS (
  SELECT doc_id, word,
         CAST(('0x' || substr(md5(word), 1, 7)) AS BIGINT)
           % {_N_HASH_BUCKETS} AS bucket
  FROM w WHERE word <> '')
SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT word) AS BIGINT) AS n_distinct_words,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM b GROUP BY bucket
"""


def _reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform-without-replacement {_RESERVOIR_K} docs per language:
    rank by md5(doc_id) inside the group and keep the top k.  The md5
    order is a uniform permutation independent of ingest order, so this
    IS reservoir sampling with the randomness made deterministic; the
    window pushes down to a per-group top-k (WindowGroupLimit) instead
    of a full sort."""
    rk = F.row_number().over(
        Window.partitionBy("lang").orderBy(
            F.md5(F.col("doc_id").cast("string")), "doc_id"
        )
    )
    return (
        load(spark, sf_dir, "documents")
        .select("lang", "doc_id")
        .withColumn("rk", rk)
        .filter(F.col("rk") <= _RESERVOIR_K)
    )


_RESERVOIR_SQL = f"""
WITH ranked AS (
  SELECT lang, doc_id,
         CAST(row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rk
  FROM documents)
SELECT lang, doc_id, rk FROM ranked WHERE rk <= {_RESERVOIR_K}
"""


def _k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity over the quasi-identifier pair (segment, nation):
    per segment, how many QI groups exist, how many are smaller than
    k={_K_ANON}, how many customers those small groups expose, and the
    worst (smallest) group size.  Two keyed aggregates, both map-side
    combinable — the release gate runs in one pass at any table size."""
    groups = (
        load(spark, sf_dir, "customer")
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        groups.groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum((F.col("n") < _K_ANON).cast("long")).alias("n_small_groups"),
            F.sum(
                F.when(F.col("n") < _K_ANON, F.col("n")).otherwise(F.lit(0))
            ).alias("n_customers_at_risk"),
            F.min("n").alias("min_group_size"),
        )
    )


_K_ANON_SQL = f"""
WITH g AS (
  SELECT c_mktsegment AS seg, c_nationkey, CAST(count(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2)
SELECT seg, CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN n < {_K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_small_groups,
       CAST(sum(CASE WHEN n < {_K_ANON} THEN n ELSE 0 END) AS BIGINT)
         AS n_customers_at_risk,
       min(n) AS min_group_size
FROM g GROUP BY seg
"""


def _tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chars-per-token by language — the multilingual tokenizer-cost
    metric (a language with 2× fertility costs 2× the context budget).
    Whitespace tokens here; the BPE-grain twin is `bpe_pair_stats`."""
    docs = load(spark, sf_dir, "documents").select(
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        "n_chars",
    )
    agg = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )
    return agg.withColumn(
        "chars_per_token",
        F.col("total_chars").cast("double") / F.col("total_tokens").cast("double"),
    )


_FERTILITY_SQL = """
WITH d AS (
  SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         n_chars
  FROM documents),
a AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         CAST(sum(n_chars) AS BIGINT) AS total_chars
  FROM d GROUP BY lang)
SELECT lang, n_docs, total_tokens, total_chars,
       CAST(total_chars AS DOUBLE) / CAST(total_tokens AS DOUBLE)
         AS chars_per_token
FROM a
"""


def _knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 1-NN label agreement: for every vector, find its
    nearest neighbor by dot product (9-digit round + vec_id tie-break,
    the recall-contract convention) and score label agreement.

    Brute force is intentional — this is the exact probe the IVF path
    is measured against; at corpus scale the identical argmax runs over
    IVF-probed candidates (`extensions/similarity.py:513`) so the pair
    space is nlist-pruned, never all-pairs.

    r10 rewrite — BLAS shortlist, fold verdict: the r9 form fold-scored
    all |corpus|² pairs in Catalyst (30 s at sf0.1, 144 s at sf1, the
    registry's tallest cost).  The EXACT result only needs the fold on
    pairs that can win, and a numpy matmul bounds those provably: for
    64 float64 products, |blas − fold| ≤ 2·64·u·Σ|aᵢbᵢ| ≲ 1e-12, so
    every fold-winner AND every rounded-to-9-digits tie sits within
    MARGIN = 1e-6 of the per-row blas max (1e-6 ≫ 2ε + the 5e-10
    rounding granularity).  The kernel emits that shortlist (~1–2
    candidates/row) and the SAME fold + round(,9) + (sim DESC, b_id
    ASC) argmax as before decides among them — the emitted aggregate
    is provably identical to full enumeration, and the oracle parity
    sweep re-proves it against DuckDB's all-pairs form every round.
    The corpus matrix is collected at build time — the same broadcast
    envelope the old form's ``F.broadcast(b)`` required (note: that
    makes constructing this DataFrame run one embeddings scan, like an
    eager checkpoint — plan-audit/explain sweeps pay it; the fixture
    matrix is ~10 MB), shipped to executors as a broadcast variable so
    tasks don't re-serialize the closure matrix; IVF remains the
    beyond-broadcast scale path."""
    import numpy as np
    import pandas as pd

    from data_pipeline_bigquery_spark.extensions.dedup_text import (
        spread_small_input,
    )

    emb = (
        load(spark, sf_dir, "embeddings")
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
        )
    )
    # Broadcast-envelope guard BEFORE the collect: this key is the
    # exact-by-contract quality oracle and its corpus matrix must fit
    # the driver + executor broadcast envelope.  Estimate the matrix
    # bytes from a cheap count/dim aggregate and raise with a pointer
    # to the IVF candidate path instead of driver-OOMing at lake scale.
    import os as _os

    cap_mb = int(_os.environ.get("SPARK_GRAFT_KNN_BROADCAST_MB", "2048"))
    stats = emb.agg(
        F.count("v").alias("n"), F.max(F.size("v")).alias("dim")
    ).first()
    n_vec, dim = int(stats["n"] or 0), int(stats["dim"] or 0)
    # the guarded peak is NOT the final float64 matrix (n*dim*8): the
    # collect below first materializes boxed Python floats + per-row
    # list/Row overhead (~4x per element + ~200 B/row measured), all
    # outside spark.driver.memory — guard on that transient estimate
    est_bytes = n_vec * (dim * 32 + 200)
    if est_bytes > cap_mb * 1024 * 1024:
        raise ValueError(
            f"knn_label_accuracy: collecting the embedding corpus would peak "
            f"~{est_bytes >> 20} MiB of driver-process memory "
            f"({n_vec} vectors x {dim} dims incl. Python boxing), over the "
            f"exact-probe envelope ({cap_mb} MiB, override via "
            "SPARK_GRAFT_KNN_BROADCAST_MB); this key is the brute-force "
            "exactness oracle — at this scale use the IVF candidate path "
            "(extensions/similarity.py ann_ivf_topk / ann_auto_topk) instead"
        )
    corpus_rows = sorted(
        (
            (r["vec_id"], r["v"], r["label"])
            for r in emb.collect()
            if r["v"] is not None
        ),
        key=lambda t: t[0],
    )
    corpus_ids = np.array([i for i, _, _ in corpus_rows], dtype=np.int64)
    # the kernel's self-exclusion binary-searches ids and masks ONE
    # position, which is only correct when vec_id is unique — assert it
    # here rather than silently scoring a row against its duplicate
    if len(corpus_ids) != len(np.unique(corpus_ids)):
        raise ValueError(
            "knn_label_accuracy: duplicate vec_id in embeddings corpus; "
            "the leave-one-out kernel assumes unique ids"
        )
    bc = spark.sparkContext.broadcast(
        (
            corpus_ids,
            np.array([v for _, v, _ in corpus_rows], dtype=np.float64),
        )
    )
    margin = 1e-6

    label_t = emb.schema["label"].dataType.simpleString()
    schema = (
        f"a_id long, a_label {label_t}, a_v array<double>, b_id long"
    )

    def gen(batches):
        ids, mat = bc.value
        # BLOCK rows into one gemm per chunk: a per-row gemv re-reads
        # the whole corpus matrix from memory for EVERY row (at 3M
        # vectors that is ~1.5 GB of traffic per row — the r12 sf10
        # probe measured 359 s, a 61x step for 10x data on a key whose
        # flops are quadratic by contract).  One (corpus x block) gemm
        # amortizes that read across the block — same flops, ~block x
        # less memory traffic (sf10: 359 -> gemm-blocked time below).
        # Output is unchanged: the matmul only proposes the
        # margin-bounded shortlist; the exact Catalyst fold decides.
        n = len(mat)
        block = int(max(1, min(64, 40_000_000 // max(n, 1))))
        for pdf in batches:
            rows = [
                (int(a_id), a_v, a_label)
                for a_id, a_v, a_label in zip(
                    pdf["vec_id"], pdf["v"], pdf["label"]
                )
                if a_v is not None and n > 0
            ]
            out = []
            for i in range(0, len(rows), block):
                chunk = rows[i : i + block]
                a_mat = np.array([v for _, v, _ in chunk], dtype=np.float64)
                s_all = mat @ a_mat.T  # (corpus, block): ONE matrix read
                # vectorized self-exclusion + shortlist over the WHOLE
                # block: the per-row form re-ran ~5 O(corpus) passes
                # per row (mask alloc, gather, max, nonzero), which
                # dominated once the gemm amortized the matrix read.
                # ids is sorted (corpus_rows sorts by vec_id), so each
                # row's self position is a binary search; masking it to
                # -inf excludes it from both the max and the shortlist.
                for col, (a_id, _, _) in enumerate(chunk):
                    p = int(np.searchsorted(ids, a_id))
                    if p < n and ids[p] == a_id:
                        s_all[p, col] = -np.inf
                best = s_all.max(axis=0)  # one pass over (corpus, block)
                # guard degenerate columns (corpus == {self}): best is
                # -inf there and `>= -inf - margin` would keep all rows
                hits = s_all >= (best - margin)  # one comparison pass
                hits[:, ~np.isfinite(best)] = False
                hit_r, hit_c = np.nonzero(hits)
                for r_, c_ in zip(hit_r.tolist(), hit_c.tolist()):
                    a_id, a_v, a_label = chunk[c_]
                    out.append((a_id, a_label, list(a_v), int(ids[r_])))
            yield pd.DataFrame(
                out, columns=["a_id", "a_label", "a_v", "b_id"]
            )

    shortlist = spread_small_input(emb, key="vec_id").mapInPandas(gen, schema)
    b = emb.select(
        F.col("vec_id").alias("b_id"), F.col("v").alias("b_v"),
        F.col("label").alias("b_label"),
    )
    # fold verdict on the shortlist only: the sequential left-fold is
    # the ONE summation order DuckDB's list_dot_product reproduces
    # (rule 30) — it decides the winner; blas only bounded the field
    dot = F.aggregate(
        F.zip_with("a_v", "b_v", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = shortlist.join(F.broadcast(b), "b_id").withColumn(
        "sim", F.round(dot, 9)
    )
    # argmax via max(struct(sim, -b_id, b_label)) — field-wise struct
    # ordering is exactly (sim DESC, b_id ASC), partial-aggregated
    # map-side (rule 31)
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
    return nn.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("a_label") == F.col("b_label")).cast("long")).alias(
            "n_correct"
        ),
    ).select(
        "n",
        "n_correct",
        F.expr("n_correct * 1000 div n").alias("accuracy_permille"),
    )


_KNN_ACC_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
           FROM embeddings),
pairs AS (
  SELECT a.vec_id AS a_id, a.label AS a_label, b.vec_id AS b_id,
         b.label AS b_label,
         round(list_dot_product(a.v, b.v), 9) AS sim
  FROM e a JOIN e b ON a.vec_id <> b.vec_id),
nn AS (
  SELECT a_label, b_label,
         row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id) AS rk
  FROM pairs),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN a_label = b_label THEN 1 ELSE 0 END) AS BIGINT)
           AS n_correct
  FROM nn WHERE rk = 1)
SELECT n, n_correct, CAST(n_correct * 1000 // n AS BIGINT)
         AS accuracy_permille
FROM agg
"""


def _embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label ‖v‖² distribution — the embedding-health check run
    before any cosine-based pipeline (a label whose norms collapse or
    explode poisons similarity search and k-means alike).  Norms are
    scaled to integer e9 units (floor(‖v‖²·10⁹ + 0.5)) so the per-label
    SUM is order-independent integer arithmetic; min/max are
    order-independent anyway.  One map-side fold per row, one keyed
    agg — no pair joins, scales linearly."""
    normsq = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.col("embedding").cast("array<double>"),
            lambda x, y: x * y,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    emb = load(spark, sf_dir, "embeddings").select(
        "label",
        F.floor(normsq * 1000000000.0 + F.lit(0.5)).cast("long").alias(
            "normsq_e9"
        ),
    )
    agg = emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.min("normsq_e9").alias("min_normsq_e9"),
        F.max("normsq_e9").alias("max_normsq_e9"),
        F.sum("normsq_e9").alias("sum_e9"),
    )
    return agg.select(
        "label",
        "n_vecs",
        "min_normsq_e9",
        "max_normsq_e9",
        (
            F.col("sum_e9").cast("double") / F.col("n_vecs").cast("double")
            / F.lit(1000000000.0)
        ).alias("mean_normsq"),
    )


_NORM_AUDIT_SQL = """
WITH e AS (
  SELECT label,
         CAST(floor(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))
                    * 1000000000.0 + 0.5) AS BIGINT) AS normsq_e9
  FROM embeddings),
a AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
         min(normsq_e9) AS min_normsq_e9,
         max(normsq_e9) AS max_normsq_e9,
         CAST(sum(normsq_e9) AS BIGINT) AS sum_e9
  FROM e GROUP BY label)
SELECT label, n_vecs, min_normsq_e9, max_normsq_e9,
       CAST(sum_e9 AS DOUBLE) / CAST(n_vecs AS DOUBLE) / 1000000000.0
         AS mean_normsq
FROM a
"""


_BPE_ITERS = 3


def bpe_merge_pair(seq_col, a: str, b: str):
    """Greedy symbol-boundary BPE merge: fold the space-split symbol
    array left to right, replacing the accumulator's tail symbol when
    (tail, x) == (a, b).  A just-merged symbol equals ``a+b``, not
    ``a``, so it is never re-consumed — greedy non-overlapping, the
    standard BPE application.  Boundary-aware by construction: a plain
    substring replace would merge "b c" INSIDE "ab c" (round-7 review
    finding).  try_element_at: NULL (no match) on the empty accumulator
    instead of an ANSI index error."""
    return F.array_join(
        F.aggregate(
            F.split(seq_col, " "),
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.try_element_at(acc, F.lit(-1)) == F.lit(a))
                & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1),
                    F.array(F.lit(a + b)),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        ),
        " ",
    )


def _bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITERATIVE BPE merge training — the real tokenizer-training loop,
    not just pair statistics (`bpe_pair_stats` is the one-shot census):
    {_BPE_ITERS} rounds of "count adjacent symbol pairs weighted by
    word frequency → merge the globally most frequent pair everywhere".
    Output: one row per round (iteration, the merged pair, its count).

    Distribution shape per round: one pair-explode + one keyed agg over
    the word-frequency table (vocabulary grain, ≪ corpus — the corpus
    is read once, up front); the ONLY driver transfer is the single
    winning pair per round (top-1, `orderBy().limit(1)` — bounded by
    construction, the `kmeans_refine_iterations` discipline).

    Merging is SYMBOL-BOUNDARY aware (round-7 review finding: a plain
    substring replace on the space-joined sequence merges "b c" INSIDE
    "ab c", which is not BPE): a greedy left-to-right fold over the
    symbol array replaces (a, b) only where both are whole adjacent
    symbols, never re-consuming a just-merged symbol — the standard BPE
    application.  The oracle reaches the same result via POSITION
    algebra (adjacency matches → gaps-and-islands greedy alternation →
    rebuild), a genuinely independent formulation, so a boundary bug or
    greedy-overlap bug on either side mismatches."""
    vocab = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split(ascii_lower("text"), " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(F.concat_ws(" ", F.split("word", "")).alias("seq"), "freq")
    )
    pair_expr = F.expr(
        "transform(sequence(1, size(split(seq, ' ')) - 1),"
        " i -> concat(element_at(split(seq, ' '), i), ' ',"
        "             element_at(split(seq, ' '), i + 1)))"
    )
    results = []
    for it in range(1, _BPE_ITERS + 1):
        counts = (
            vocab.filter(F.size(F.split("seq", " ")) >= 2)
            .select(F.explode(pair_expr).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
        )
        top = counts.orderBy(F.col("cnt").desc(), "pair").limit(1).collect()[0]
        results.append((it, top["pair"], int(top["cnt"])))
        a, b = top["pair"].split(" ")
        vocab = vocab.select(
            bpe_merge_pair(F.col("seq"), a, b).alias("seq"), "freq"
        )
    return spark.createDataFrame(
        results, "iteration int, pair string, cnt long"
    )


def _bpe_merges_sql() -> str:
    ctes = [
        """
v0 AS (
  SELECT array_to_string(string_split(word, ''), ' ') AS seq,
         CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS word
        FROM documents)
  WHERE len(word) >= 2
  GROUP BY word)"""
    ]
    selects = []
    for it in range(1, _BPE_ITERS + 1):
        prev = f"v{it - 1}"
        # merge application by POSITION ALGEBRA (independent of the
        # Spark fold): adjacency matches -> greedy alternation inside
        # each island of consecutive matches (rn odd) -> rebuild,
        # dropping each selected position's consumed right neighbor
        ctes.append(
            f"""
c{it} AS (
  SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    SELECT unnest(list_transform(range(1, len(string_split(seq, ' '))),
                  i -> string_split(seq, ' ')[i] || ' '
                       || string_split(seq, ' ')[i + 1])) AS pair,
           freq
    FROM {prev} WHERE len(string_split(seq, ' ')) >= 2)
  GROUP BY pair),
t{it} AS (SELECT pair, cnt FROM c{it} ORDER BY cnt DESC, pair LIMIT 1),
x{it} AS (
  SELECT seq, freq, ws, t.i AS i
  FROM (SELECT seq, freq, string_split(seq, ' ') AS ws FROM {prev}),
       UNNEST(range(1, len(ws) + 1)) AS t(i)),
m{it} AS (
  SELECT seq, freq, ws, i,
         (i < len(ws)
          AND ws[i] = string_split((SELECT pair FROM t{it}), ' ')[1]
          AND ws[i + 1] = string_split((SELECT pair FROM t{it}), ' ')[2])
           AS mt
  FROM x{it}),
sel{it} AS (
  SELECT seq, i FROM (
    SELECT seq, i,
           row_number() OVER (
             PARTITION BY seq, grp ORDER BY i) AS rn
    FROM (SELECT seq, i,
                 i - row_number() OVER (PARTITION BY seq ORDER BY i) AS grp
          FROM m{it} WHERE mt))
  WHERE rn % 2 = 1),
v{it} AS (
  SELECT string_agg(
           CASE WHEN s.i IS NOT NULL
                THEN replace((SELECT pair FROM t{it}), ' ', '')
                ELSE m.ws[m.i] END, ' ' ORDER BY m.i) AS seq,
         m.freq AS freq
  FROM m{it} m
  LEFT JOIN sel{it} s ON m.seq = s.seq AND m.i = s.i
  LEFT JOIN sel{it} p ON m.seq = p.seq AND m.i = p.i + 1
  WHERE p.i IS NULL
  GROUP BY m.seq, m.freq)"""
        )
        selects.append(
            f"SELECT {it} AS iteration, pair, cnt FROM t{it}"
        )
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL ".join(selects)


_SPLIT_FRACS = (70, 15, 15)  # train / val / test percent
_EMBARGO_DAYS = 2


def _grouped_split_no_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware train/val/test split: ALL documents of a source land
    in the same split (md5 on the GROUP key, not the row key) — the
    leakage guard for grouped data (near-dup docs cluster within a
    source; splitting rows independently leaks them across splits).
    Output is the per-split receipt: group count, doc count, and —
    the actual contract — the number of groups that span >1 split,
    provably zero by construction."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    b = hash_bucket(F.col("source"), 100)
    split = (
        F.when(b < _SPLIT_FRACS[0], "train")
        .when(b < _SPLIT_FRACS[0] + _SPLIT_FRACS[1], "val")
        .otherwise("test")
    )
    tagged = docs.withColumn("split", split)
    spans = (
        tagged.groupBy("source")
        .agg(F.countDistinct("split").alias("n_splits"))
        .agg(
            F.sum((F.col("n_splits") > 1).cast("long")).alias("leaked")
        )
    )
    per_split = tagged.groupBy("split").agg(
        F.countDistinct("source").alias("n_groups"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return per_split.join(F.broadcast(spans), how="cross").select(
        "split", "n_groups", "n_docs", F.col("leaked").alias("groups_leaked")
    )


_GROUPED_SPLIT_SQL = f"""
WITH tagged AS (
  SELECT doc_id, source,
         CASE
           WHEN CAST(('0x' || substr(md5(source), 1, 7)) AS BIGINT) % 100
                < {_SPLIT_FRACS[0]} THEN 'train'
           WHEN CAST(('0x' || substr(md5(source), 1, 7)) AS BIGINT) % 100
                < {_SPLIT_FRACS[0] + _SPLIT_FRACS[1]} THEN 'val'
           ELSE 'test'
         END AS split
  FROM documents),
spans AS (
  SELECT CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS groups_leaked
  FROM (SELECT source, count(DISTINCT split) AS n_splits
        FROM tagged GROUP BY source)),
per_split AS (
  SELECT split, CAST(count(DISTINCT source) AS BIGINT) AS n_groups,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM tagged GROUP BY split)
SELECT split, n_groups, n_docs, groups_leaked
FROM per_split CROSS JOIN spans
"""


def _temporal_split_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series split with an embargo gap: train = everything before
    the cutoff, test = everything after cutoff + {_EMBARGO_DAYS} days,
    embargo = the gap rows EXCLUDED from both (they leak label-window
    information across the boundary in forecasting setups).  Cutoff is
    the 70th-percentile day, derived from day-grain counts so the split
    is stable under event-level churn.  Output: per-bucket row counts
    and day spans — the receipt a temporal-CV harness checks."""
    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("day")
    )
    days = ev.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy().orderBy("day")
    ranked = days.withColumn("rk", F.row_number().over(w)).withColumn(
        "n_days", F.count(F.lit(1)).over(Window.partitionBy())
    )
    cutoff = ranked.filter(
        F.col("rk") == F.expr("cast((n_days * 70 + 99) div 100 as int)")
    ).select(F.col("day").alias("cutoff_day"))
    tagged = ev.join(F.broadcast(cutoff), how="cross").select(
        F.when(F.col("day") <= F.col("cutoff_day"), "train")
        .when(
            F.col("day")
            > F.col("cutoff_day") + F.expr(f"INTERVAL {_EMBARGO_DAYS} DAYS"),
            "test",
        )
        .otherwise("embargo")
        .alias("bucket"),
        "day",
    )
    return tagged.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("day").alias("n_days"),
        F.min("day").alias("first_day"),
        F.max("day").alias("last_day"),
    )


_TEMPORAL_SPLIT_SQL = f"""
WITH ev AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM events),
days AS (SELECT day, count(*) AS n FROM ev GROUP BY day),
ranked AS (
  SELECT day, row_number() OVER (ORDER BY day) AS rk,
         count(*) OVER () AS n_days
  FROM days),
cutoff AS (
  SELECT day AS cutoff_day FROM ranked
  WHERE rk = CAST((n_days * 70 + 99) // 100 AS INT)),
tagged AS (
  SELECT CASE
           WHEN day <= cutoff_day THEN 'train'
           WHEN day > cutoff_day + INTERVAL {_EMBARGO_DAYS} DAY THEN 'test'
           ELSE 'embargo'
         END AS bucket, day
  FROM ev CROSS JOIN cutoff)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT day) AS BIGINT) AS n_days,
       min(day) AS first_day, max(day) AS last_day
FROM tagged GROUP BY bucket
"""


def _winsorize_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization receipt per event type: clamp bounds at the exact
    discrete p05/p95 (rank-based — the value at row_number ⌈q·n⌉, no
    interpolation, so the bounds are real observed cents), plus how
    many rows each side clamps and the post-clamp sum.  The standard
    robust-feature preprocessing step, with the receipt the pipeline
    logs.  One ordered window per type + one keyed agg."""
    # rule 11: a NULL value would enter the rank window (NULLS FIRST
    # on Spark, LAST on DuckDB) — a valueless event clamps nothing
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("c"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("c")
    ranked = (
        ev.withColumn("rk", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("event_type")))
    )
    bounds = (
        ranked.filter(
            (F.col("rk") == F.expr("cast((n * 5 + 99) div 100 as int)"))
            | (F.col("rk") == F.expr("cast((n * 95 + 99) div 100 as int)"))
        )
        .groupBy("event_type")
        .agg(F.min("c").alias("lo_cents"), F.max("c").alias("hi_cents"))
    )
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("lo_cents").alias("lo_cents"),
            F.min("hi_cents").alias("hi_cents"),
            F.sum((F.col("c") < F.col("lo_cents")).cast("long")).alias(
                "n_clamped_lo"
            ),
            F.sum((F.col("c") > F.col("hi_cents")).cast("long")).alias(
                "n_clamped_hi"
            ),
            F.sum(
                F.greatest(
                    F.col("lo_cents"), F.least(F.col("hi_cents"), F.col("c"))
                )
            ).alias("sum_cents_winsorized"),
        )
    )


_WINSORIZE_SQL = """
WITH ev AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL),
ranked AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY c) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM ev),
bounds AS (
  SELECT event_type, min(c) AS lo_cents, max(c) AS hi_cents
  FROM ranked
  WHERE rk = CAST((n * 5 + 99) // 100 AS INT)
     OR rk = CAST((n * 95 + 99) // 100 AS INT)
  GROUP BY event_type)
SELECT ev.event_type, min(lo_cents) AS lo_cents, min(hi_cents) AS hi_cents,
       CAST(sum(CASE WHEN c < lo_cents THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clamped_lo,
       CAST(sum(CASE WHEN c > hi_cents THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clamped_hi,
       CAST(sum(greatest(lo_cents, least(hi_cents, c))) AS BIGINT)
         AS sum_cents_winsorized
FROM ev JOIN bounds ON ev.event_type = bounds.event_type
GROUP BY ev.event_type
"""


def _ngram_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc novelty: the permille of its distinct word 3-grams that
    occur in NO other document — the memorization/boilerplate audit
    run before a corpus ships (low novelty = the doc is assembled from
    corpus-common spans).  One explode + a gram-keyed doc-frequency agg
    + a doc-keyed rollup; grams shuffle as md5 digests at scale (the
    `chunk_dedup_ratio` discipline applies verbatim)."""
    grams = (
        load(spark, sf_dir, "documents")
        # guard: sequence(1, 0) generates DESCENDING [1, 0] in Spark —
        # a <3-word doc must be excluded, not fed an empty-range hack
        .filter(F.size(F.split("text", " ")) >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(split(text, ' ')) - 2,"
                    " 1),"
                    " i -> concat_ws(' ', element_at(split(text, ' '), i),"
                    "                element_at(split(text, ' '), i + 1),"
                    "                element_at(split(text, ' '), i + 2)))"
                )
            ).alias("gram"),
        )
        .distinct()
    )
    df_per_gram = grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("doc_freq")
    )
    return (
        grams.join(df_per_gram, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("doc_freq") == 1).cast("long")).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.expr("n_novel * 1000 div n_grams").alias("novelty_permille"),
        )
    )


_NOVELTY_SQL = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(ws) - 1, 1)),
                i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])) AS gram
  FROM w WHERE len(ws) >= 3),
df AS (SELECT gram, CAST(count(*) AS BIGINT) AS doc_freq
       FROM grams GROUP BY gram)
SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN doc_freq = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       CAST(sum(CASE WHEN doc_freq = 1 THEN 1 ELSE 0 END) * 1000
            // count(*) AS BIGINT) AS novelty_permille
FROM grams g JOIN df ON g.gram = df.gram
GROUP BY g.doc_id
"""


QUERIES: dict[str, QuerySpec] = {
    "embedding_norm_audit": QuerySpec(_embedding_norm_audit, _NORM_AUDIT_SQL),
    "winsorize_report": QuerySpec(_winsorize_report, _WINSORIZE_SQL),
    "ngram_novelty_score": QuerySpec(_ngram_novelty_score, _NOVELTY_SQL),
    "bpe_train_merges": QuerySpec(_bpe_train_merges, _bpe_merges_sql()),
    "grouped_split_no_leakage": QuerySpec(
        _grouped_split_no_leakage, _GROUPED_SPLIT_SQL
    ),
    "temporal_split_embargo": QuerySpec(
        _temporal_split_embargo, _TEMPORAL_SPLIT_SQL
    ),
    "target_encoding_loo": QuerySpec(_target_encoding_loo, _TARGET_ENC_SQL),
    "negative_sampling": QuerySpec(_negative_sampling, _NEG_SAMPLING_SQL),
    "cross_val_folds": QuerySpec(_cross_val_folds, _CV_FOLDS_SQL),
    "feature_hashing": QuerySpec(_feature_hashing, _FEATURE_HASHING_SQL),
    "reservoir_per_group": QuerySpec(_reservoir_per_group, _RESERVOIR_SQL),
    "k_anonymity_audit": QuerySpec(_k_anonymity_audit, _K_ANON_SQL),
    "tokenizer_fertility": QuerySpec(_tokenizer_fertility, _FERTILITY_SQL),
    "knn_label_accuracy": QuerySpec(_knn_label_accuracy, _KNN_ACC_SQL),
}
