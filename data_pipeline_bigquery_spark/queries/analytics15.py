"""Analytics batch 15 — corpus growth law and sketch calibration:

- ``heaps_law_vocab_growth``: Heaps'-law curve — vocabulary size vs
  corpus size across the NESTED md5 document samples (10%…100%, the
  same nesting as ``learning_curve_quality``): per sample, document
  count, token count, distinct-token count, and vocabulary density in
  permille.  Sub-linear vocab growth is the expected law; a LINEAR
  curve means unbounded id-like tokens are flooding the vocabulary —
  the tokenizer-budget alarm.
- ``minhash_estimate_calibration``: sketch-accuracy audit — for every
  LSH candidate pair, the MinHash ESTIMATE of Jaccard (matching
  signature components out of 16) against the EXACT char-shingle-set
  Jaccard (integer permille), histogrammed by match count.  The
  calibration table that tells you what a "14/16 match" actually
  means before you trust the sketch at lake scale.  Reuses the ONE
  signature/banding implementation (``dedup_text``) and the ONE
  oracle generator (``extensions._minhash_ctes``).

Reference parity: the reference pipeline (main.py:13-54) has no
corpus-statistics layer — scale-out extensions in the same spirit as
batches 5-14.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.extensions.dedup_text import (
    DEFAULT_NUM_PERM,
    lsh_candidate_pairs,
    shingle_array_sql,
)
from data_pipeline_bigquery_spark.extensions.sampling import hash_bucket
from data_pipeline_bigquery_spark.queries import QuerySpec
from data_pipeline_bigquery_spark.queries.analytics9 import _md5_bucket_sql


# --- heaps_law_vocab_growth --------------------------------------------------


def _heaps_law_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-sample vocabulary curve WITHOUT replaying the stream per
    size: because the samples nest, every curve point is a CUMULATIVE
    sum over per-decile histograms — token occurrences and distinct
    docs histogram by their own decile (each doc lives in exactly
    one), and a token joins the vocabulary at the decile of its FIRST
    appearance (min bucket).  One token-keyed exchange + one 10-row
    histogram instead of a 10× stream explode; the cumulative windows
    run over the 10-row decile domain.
    """
    toks = load(spark, sf_dir, "documents").select(
        "doc_id",
        hash_bucket(F.col("doc_id"), 1000).alias("bucket"),
        F.explode(F.split("text", " ")).alias("token"),
    ).localCheckpoint(eager=False)  # feeds the histogram AND the vocab agg
    per_decile = toks.groupBy(
        F.expr("bucket div 100").alias("decile")
    ).agg(
        F.count(F.lit(1)).alias("occ"),
        F.countDistinct("doc_id").alias("docs"),
    )
    vocab = (
        toks.groupBy("token")
        .agg(F.min("bucket").alias("min_bucket"))
        .groupBy(F.expr("min_bucket div 100").alias("decile"))
        .agg(F.count(F.lit(1)).alias("new_vocab"))
    )
    grid = spark.createDataFrame(
        [(d,) for d in range(10)], "decile long"
    )
    from pyspark.sql import Window

    w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    filled = (
        grid.join(per_decile, "decile", "left")
        .join(vocab, "decile", "left")
        .select(
            "decile",
            F.coalesce(F.col("occ"), F.lit(0)).alias("occ"),
            F.coalesce(F.col("docs"), F.lit(0)).alias("docs"),
            F.coalesce(F.col("new_vocab"), F.lit(0)).alias("new_vocab"),
        )
    )
    return (
        filled.select(
            ((F.col("decile") + 1) * 100).cast("int").alias(
                "sample_permille"
            ),
            F.sum("docs").over(w).cast("long").alias("n_docs"),
            F.sum("occ").over(w).cast("long").alias("n_tokens"),
            F.sum("new_vocab").over(w).cast("long").alias("vocab_size"),
        )
        .withColumn(
            "vocab_permille",
            F.expr(
                "CAST(vocab_size * 1000 div nullif(n_tokens, 0) AS BIGINT)"
            ),
        )
        .orderBy("sample_permille")
    )


_HEAPS_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         {_md5_bucket_sql('doc_id', 1000)} AS bucket,
         unnest(string_split(text, ' ')) AS token
  FROM documents),
per_decile AS (
  SELECT bucket // 100 AS decile,
         count(*) AS occ,
         count(DISTINCT doc_id) AS docs
  FROM toks GROUP BY 1),
vocab AS (
  SELECT min_bucket // 100 AS decile, count(*) AS new_vocab
  FROM (SELECT token, min(bucket) AS min_bucket FROM toks GROUP BY 1)
  GROUP BY 1),
grid AS (SELECT unnest(range(0, 10)) AS decile),
filled AS (
  SELECT grid.decile,
         coalesce(occ, 0) AS occ,
         coalesce(docs, 0) AS docs,
         coalesce(new_vocab, 0) AS new_vocab
  FROM grid
  LEFT JOIN per_decile USING (decile)
  LEFT JOIN vocab USING (decile)),
cum AS (
  SELECT CAST((decile + 1) * 100 AS INTEGER) AS sample_permille,
         CAST(sum(docs) OVER w AS BIGINT) AS n_docs,
         CAST(sum(occ) OVER w AS BIGINT) AS n_tokens,
         CAST(sum(new_vocab) OVER w AS BIGINT) AS vocab_size
  FROM filled
  WINDOW w AS (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT sample_permille, n_docs, n_tokens, vocab_size,
       CAST(vocab_size * 1000 // nullif(n_tokens, 0) AS BIGINT)
         AS vocab_permille
FROM cum ORDER BY sample_permille
"""


# --- minhash_estimate_calibration --------------------------------------------


def _minhash_estimate_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Estimated-vs-exact Jaccard per LSH candidate pair.

    One signature build feeds BOTH the candidate pairs and the
    component-match estimate; the exact side reuses the gram-bucket
    stats over the DISTINCT char-shingle sets (the very sets MinHash
    sketches).  Output is (match count → pair count + exact-Jaccard
    mass), ~17 rows regardless of corpus size.
    """
    from data_pipeline_bigquery_spark.queries.extensions import (
        _aug_minhash_signatures,
        _augmented_docs,
    )

    # aug feeds the shingle-set projection — deliberately NOT
    # lineage-cut: a checkpointed frame loses its file lineage, which
    # blinds spread_small_input's split probe and runs the md5-heavy
    # work on the source's ~4 splits instead of the cluster's
    # parallelism (measured 6.0 s vs 1.4 s at sf0.1); re-scanning the
    # documents parquet costs ~0.2 s
    aug = _augmented_docs(spark, sf_dir)
    # cut lineage: signatures feed the pair generation AND both sides
    # of the estimate join.  Slice-CSE build (bit-identical rows, half
    # the md5/permutation work — queries.extensions._aug_minhash_signatures)
    sigs = _aug_minhash_signatures(spark, sf_dir).localCheckpoint(
        eager=False
    )
    # pairs feed the estimate join, the candidate-doc filter, AND the
    # exact join — cut, or each reference rebuilds the banding
    pairs = lsh_candidate_pairs(sigs).localCheckpoint(eager=False)
    # ONE parsed SQL string, not 16 when-Columns — per dedup_text's
    # measured note, primitive-built Columns cost ~6 py4j round-trips
    # each at plan-build time
    est = F.expr(
        " + ".join(
            f"(CASE WHEN a.sig_{j} = b.sig_{j} THEN 1 ELSE 0 END)"
            for j in range(DEFAULT_NUM_PERM)
        )
    )
    a = sigs.alias("a")
    b = sigs.alias("b")
    estimated = (
        pairs.join(a, pairs.doc_a == F.col("a.doc_id"))
        .join(b, pairs.doc_b == F.col("b.doc_id"))
        .select("doc_a", "doc_b", est.alias("est_matches"))
    )
    # Exact Jaccard ONLY for the candidate pairs (r9): the oracle's
    # corpus-wide gram self-join feeds a LEFT join from the candidates,
    # so every non-candidate pair it builds is discarded — and common
    # 12-char shingles make that self-join quadratic in hot buckets
    # (measured 96 s at sf0.1, the whole registry's worst key).  Value-
    # identical shortcut: per-doc DISTINCT shingle sets for the ~2 docs
    # per pair (semi-filtered before the collect), then
    # |A∩B| via array_intersect — n_inter over shared grams is exactly
    # what the oracle's cinter counts, and a pair with no shared gram
    # (absent from cinter → coalesce 0) is size(∩)=0 here.  Work is
    # O(candidate docs × shingles/doc), independent of corpus gram
    # popularity — the 100 TB-safe shape.
    docs_in_pairs = pairs.select(
        F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
    ).distinct()
    # per-doc DISTINCT shingle set as ONE fused projection — identical
    # to collect_set over the char_shingles explode (same transform
    # expression; collect_set drops NULLs, the filter() here likewise)
    # but with zero explode rows and zero aggregation shuffle
    # prefolded: aug's `t` is already ascii_lower'd once per row —
    # refolding here would land inside the shingle lambda (per element)
    shingle_set_expr = (
        f"array_distinct(filter({shingle_array_sql('t', prefolded=True)},"
        f" x -> x IS NOT NULL))"
    )
    # explicit repartition: the semi-join output's split count follows
    # the (few-file) source, and the per-doc distinct-set projection is
    # the compute-heavy step here
    shingle_sets = (
        aug.join(F.broadcast(docs_in_pairs), "doc_id", "semi")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", F.expr(shingle_set_expr).alias("gs"))
    )
    # shuffle_hash hints: the shingle-set frame's PRE-execution size
    # estimate counts rows, not the ~300-element string arrays behind
    # them, so AQE promotes these joins to broadcast and pays a ~1 GB
    # single-threaded broadcast build at sf1 (measured: the whole key
    # 31 s → 9 s with the hint) — and a 1 GB broadcast × N executors
    # is exactly the wrong shape at lake scale.  Shuffle-hash keys the
    # arrays by doc id once and never sorts or broadcasts them.
    exact = (
        pairs.join(
            shingle_sets.select(
                F.col("doc_id").alias("doc_a"), F.col("gs").alias("gs_a")
            ).hint("shuffle_hash"),
            "doc_a",
        )
        .join(
            shingle_sets.select(
                F.col("doc_id").alias("doc_b"), F.col("gs").alias("gs_b")
            ).hint("shuffle_hash"),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("gs_a", "gs_b")).alias("n_inter"),
            (F.size("gs_a") + F.size("gs_b")).alias("n_sum"),
        )
        .select(
            "doc_a",
            "doc_b",
            # all-NULL-shingle docs collect to EMPTY sets (collect_set
            # skips NULLs, rule 21): den 0 ≡ "no cinter row" → 0, like
            # the oracle's left-join coalesce
            F.expr(
                "CASE WHEN n_sum - n_inter > 0 THEN"
                " CAST(n_inter * 1000 div (n_sum - n_inter) AS BIGINT)"
                " ELSE 0 END"
            ).alias("exact_permille"),
        )
    )
    joined = estimated.join(exact, ["doc_a", "doc_b"], "left").select(
        "est_matches",
        F.coalesce(F.col("exact_permille"), F.lit(0)).alias(
            "exact_permille"
        ),
    )
    return (
        joined.groupBy("est_matches")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("exact_permille").cast("long").alias(
                "sum_exact_permille"
            ),
        )
        .withColumn(
            "mean_exact_permille",
            F.expr(
                "CAST(sum_exact_permille div nullif(n_pairs, 0) AS BIGINT)"
            ),
        )
        .orderBy("est_matches")
    )


def _calibration_sql() -> str:
    from data_pipeline_bigquery_spark.queries.extensions import (
        _minhash_ctes,
    )

    from data_pipeline_bigquery_spark.extensions.dedup_text import (
        DEFAULT_SHINGLE_K as K,
        DEFAULT_SHINGLE_STRIDE as STRIDE,
    )

    est = " + ".join(
        f"(CASE WHEN a.s{j} = b.s{j} THEN 1 ELSE 0 END)"
        for j in range(DEFAULT_NUM_PERM)
    )
    return (
        "WITH "
        + _minhash_ctes()
        + f""",
estimated AS (
  SELECT p.doc_a, p.doc_b, {est} AS est_matches
  FROM pairs p
  JOIN sig a ON p.doc_a = a.doc_id
  JOIN sig b ON p.doc_b = b.doc_id),
csh AS (
  SELECT DISTINCT doc_id, substr(t, CAST(i AS INT), {K}) AS g
  FROM aug,
       UNNEST(range(1, greatest(length(t) - {K - 1}, 1) + 1, {STRIDE}))
         AS u(i)),
csizes AS (SELECT doc_id, count(*) AS n FROM csh GROUP BY 1),
cinter AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_inter
  FROM csh x JOIN csh y ON x.g = y.g AND x.doc_id < y.doc_id
  GROUP BY 1, 2),
exact AS (
  SELECT doc_a, doc_b,
         CAST(n_inter * 1000 // (sa.n + sb.n - n_inter) AS BIGINT)
           AS exact_permille
  FROM cinter
  JOIN csizes sa ON sa.doc_id = doc_a
  JOIN csizes sb ON sb.doc_id = doc_b),
joined AS (
  SELECT est_matches, coalesce(exact_permille, 0) AS exact_permille
  FROM estimated LEFT JOIN exact USING (doc_a, doc_b)),
agg AS (
  SELECT est_matches, count(*) AS n_pairs,
         CAST(sum(exact_permille) AS BIGINT) AS sum_exact_permille
  FROM joined GROUP BY 1)
SELECT est_matches, n_pairs, sum_exact_permille,
       CAST(sum_exact_permille // nullif(n_pairs, 0) AS BIGINT)
         AS mean_exact_permille
FROM agg ORDER BY est_matches
"""
    )


QUERIES: dict[str, QuerySpec] = {
    "heaps_law_vocab_growth": QuerySpec(
        _heaps_law_vocab_growth, _HEAPS_SQL
    ),
    "minhash_estimate_calibration": QuerySpec(
        _minhash_estimate_calibration, _calibration_sql()
    ),
}
