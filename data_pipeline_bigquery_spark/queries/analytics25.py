"""Analytics batch 25 — curation-planning diagnostics (round 12): the
numbers an operator needs BEFORE committing a 100 TB curation run.

- ``minhash_band_tuning_curve``: the LSH parameter-selection table.
  For each banding config (bands × rows_per_band = 16, the signature
  budget of ``minhash_signatures``) evaluate the S-curve detection
  probability p = 1 − (1 − j^r)^b against the CORPUS'S OWN measured
  pairwise-Jaccard spectrum (the gram-overlap pair base shared with
  ``dedup_ngram_jaccard``), emitting expected detected pairs per
  config.  This is how you pick (b, r) at lake scale — the recall
  contracts gate ONE operating point; this shows the whole tradeoff.
  Cross-engine float discipline: j^r and (1−j^r)^b are built from
  SQUARINGS ONLY (both exponents are powers of two) because IEEE
  multiplication is bit-identical across engines while libm ``pow``
  is not, and per-pair p quantizes to integer micro-units BEFORE the
  sum so no order-dependent double accumulation is compared.
- ``packing_waste_curve``: padding waste at context lengths
  {128, 256, 512} under the two packing strategies — per-document
  chunking (ceil(n/ctx) bins each, no cross-doc packing) vs per-shard
  concat-and-chunk (the ``sequence_packing`` model) — quantifying
  what cross-document packing saves at each context length.  One
  documents scan (context lengths explode inline), integer-exact.
- ``dedup_pair_source_mix``: provenance of near-duplication — the
  ngram-Jaccard pair set grouped by normalized (source_lo, source_hi),
  separating intra-source duplication (mirrors, reposts) from
  cross-source contamination; the number that decides whether dedup
  should run per-source or globally.
- ``minhash_recall_by_jaccard_band``: the EMPIRICAL S-curve — LSH
  detection rate per true-Jaccard bucket in the detector's own
  shingle space; the measured counterpart the tuning curve predicts
  (947‰ at j∈[0.9,1) with the production 16×2 banding at sf0.01,
  agreeing with the gated contract's 0.948).
- ``lsh_bucket_size_histogram``: band-bucket occupancy histogram with
  per-size candidate-pair contribution and the ``over_cap`` flag —
  the skew diagnostic that justifies (and sizes) the ``max_bucket``
  hot-bucket cap before the pair stage pays the quadratic bill.
- ``dup_token_inflation_by_source``: per-source token mass sitting in
  non-canonical exact-duplicate rows (digest-grain, the
  ``dedup_exact`` union fixture) — the "how much of this source is
  copies" number that feeds source mixture weights.  Digests and
  counts shuffle; payloads never do.

Scale shapes: tuning curve and source mix ride the one-exchange gram
bucket pipeline (`extensions/dedup_text.py::_gram_pair_stats`);
packing curve is scan → two hash aggs; inflation is one digest window
over 32-byte keys.  No cross joins, no driver loops.

Reference parity: beyond the reference surface (its pandas pipelines
dedup by pk only — `pipeline/functions/functions.py:91-105`
``drop_duplicates_by_id``); these are the curation-planning
extensions BASELINE.json names.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.extensions.dedup_text import (
    _gram_pair_stats,  # unrounded pair stats: the oracle uses the same unrounded jac
    ngram_jaccard_pairs,
    word_ngrams,
)
from data_pipeline_bigquery_spark.functions.text import LOWER_TEXT_SQL, ascii_lower
from data_pipeline_bigquery_spark.queries import QuerySpec
from data_pipeline_bigquery_spark.queries.extensions import (
    _GRAM_STATS_CTES,
    AUG_ID_SHIFT,
    _aug_cte,
    _augmented_docs,
    char_truth_ctes,
)

# --- minhash_band_tuning_curve ------------------------------------------------

# (bands, rows_per_band, log2(r), log2(b)) — every config spends the
# same 16-hash signature budget; exponents are powers of two so both
# engines compute them by bit-identical squaring chains
_BAND_CONFIGS = ((16, 1, 0, 4), (8, 2, 1, 3), (4, 4, 2, 2), (2, 8, 3, 1))


def _sq(col: Column, times: int) -> Column:
    """x^(2^times) by repeated squaring — IEEE multiplication only,
    mirrored textually in the oracle's chained CTEs (libm pow is NOT
    cross-engine bit-stable; squaring is)."""
    for _ in range(times):
        col = col * col
    return col


def _band_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug = _augmented_docs(spark, sf_dir, max_doc=150)
    stats = _gram_pair_stats(word_ngrams(aug, "doc_id", "t"))
    pairs = stats.select(
        (
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
        ).alias("j")
    ).filter(F.col("j") >= 0.25)
    aggs = [F.count(F.lit(1)).alias("n_pairs")]
    for bands, rpb, lr, lb in _BAND_CONFIGS:
        p = F.lit(1.0) - _sq(F.lit(1.0) - _sq(F.col("j"), lr), lb)
        aggs.append(
            F.sum(F.when(p >= 0.5, 1).otherwise(0))
            .cast("bigint")
            .alias(f"d_{bands}_{rpb}")
        )
        # floor(p·1e6) is an integer-valued LONG per pair; summing
        # integers is order-independent, unlike summing raw doubles
        aggs.append(F.sum(F.floor(p * F.lit(1000000.0))).alias(f"e_{bands}_{rpb}"))
    one = pairs.agg(*aggs)
    stack = ", ".join(
        f"{bands}, {rpb}, n_pairs, d_{bands}_{rpb}, e_{bands}_{rpb}"
        for bands, rpb, _, _ in _BAND_CONFIGS
    )
    return one.selectExpr(
        f"stack(4, {stack}) AS (bands, rows_per_band, n_pairs,"
        " detect_ge_half, expected_detected_micro)"
    )


def _band_tuning_sql() -> str:
    # chained-CTE squaring mirrors _sq's structure exactly: u1..u4 each
    # square once more toward u^16 / u^8 / u^4 / u^2 respectively
    per_cfg = []
    for bands, rpb, col in ((16, 1, "a"), (8, 2, "b"), (4, 4, "c"), (2, 8, "d")):
        per_cfg.append(
            f"CAST(sum(CASE WHEN p_{col} >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS d_{bands}_{rpb},\n"
            f"  CAST(sum(CAST(floor(p_{col} * CAST(1000000 AS DOUBLE)) AS BIGINT))"
            f" AS BIGINT) AS e_{bands}_{rpb}"
        )
    agg_cols = ",\n  ".join(per_cfg)
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({bands} AS INT) AS bands, CAST({rpb} AS INT) AS rows_per_band,"
        f" n_pairs, d_{bands}_{rpb} AS detect_ge_half,"
        f" e_{bands}_{rpb} AS expected_detected_micro FROM agg"
        for bands, rpb, _, _ in _BAND_CONFIGS
    )
    return (
        "WITH "
        + _aug_cte(max_doc=150)
        + _GRAM_STATS_CTES
        + f""",
q0 AS (
  SELECT CAST(n_inter AS DOUBLE) / CAST(sa.n_grams + sb.n_grams - n_inter AS DOUBLE) AS j
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b),
q1 AS (SELECT j FROM q0 WHERE j >= 0.25),
r1 AS (SELECT j, (j*j) AS j2 FROM q1),
r2 AS (SELECT j, j2, (j2*j2) AS j4 FROM r1),
r3 AS (SELECT j, j2, j4, (j4*j4) AS j8 FROM r2),
u0 AS (SELECT (CAST(1 AS DOUBLE) - j)  AS a, (CAST(1 AS DOUBLE) - j2) AS b,
              (CAST(1 AS DOUBLE) - j4) AS c, (CAST(1 AS DOUBLE) - j8) AS d FROM r3),
u1 AS (SELECT (a*a) AS a, (b*b) AS b, (c*c) AS c, (d*d) AS d FROM u0),
u2 AS (SELECT (a*a) AS a, (b*b) AS b, (c*c) AS c, d FROM u1),
u3 AS (SELECT (a*a) AS a, (b*b) AS b, c, d FROM u2),
u4 AS (SELECT (a*a) AS a, b, c, d FROM u3),
p AS (SELECT (CAST(1 AS DOUBLE) - a) AS p_a, (CAST(1 AS DOUBLE) - b) AS p_b,
             (CAST(1 AS DOUBLE) - c) AS p_c, (CAST(1 AS DOUBLE) - d) AS p_d FROM u4),
agg AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
  {agg_cols}
  FROM p)
{rows}
"""
    )


# --- packing_waste_curve -------------------------------------------------------

def _packing_waste_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    t = docs.select(
        "lang",
        F.size(F.split(ascii_lower(F.col("text")), " ")).cast("bigint").alias("n"),
    )
    x = t.withColumn("ctx", F.explode(F.array(F.lit(128), F.lit(256), F.lit(512))))
    s = x.groupBy("ctx", "lang").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("n").alias("tok"),
        F.sum(F.expr("(n + ctx - 1) DIV ctx")).alias("cb"),
    )
    agg = s.groupBy("ctx").agg(
        F.sum("nd").alias("n_docs"),
        F.sum("tok").alias("total_tokens"),
        F.sum("cb").alias("chunk_bins"),
        F.sum(F.expr("(tok + ctx - 1) DIV ctx")).alias("concat_bins"),
    )
    return agg.select(
        F.col("ctx").cast("int").alias("ctx"),
        "n_docs",
        "total_tokens",
        "chunk_bins",
        (F.col("chunk_bins") * F.col("ctx") - F.col("total_tokens")).alias(
            "chunk_waste"
        ),
        "concat_bins",
        (F.col("concat_bins") * F.col("ctx") - F.col("total_tokens")).alias(
            "concat_waste"
        ),
    )


_PACKING_WASTE_SQL = f"""
WITH t AS (
  SELECT lang, CAST(len(string_split({LOWER_TEXT_SQL}, ' ')) AS BIGINT) AS n
  FROM documents WHERE text IS NOT NULL),
x AS (SELECT lang, n, ctx FROM t, UNNEST([128, 256, 512]) AS u(ctx)),
s AS (SELECT ctx, lang, count(*) AS nd, CAST(sum(n) AS BIGINT) AS tok,
             CAST(sum((n + ctx - 1) // ctx) AS BIGINT) AS cb
      FROM x GROUP BY ctx, lang)
SELECT CAST(ctx AS INT) AS ctx,
       CAST(sum(nd) AS BIGINT) AS n_docs,
       CAST(sum(tok) AS BIGINT) AS total_tokens,
       CAST(sum(cb) AS BIGINT) AS chunk_bins,
       CAST(sum(cb) * ctx - sum(tok) AS BIGINT) AS chunk_waste,
       CAST(sum((tok + ctx - 1) // ctx) AS BIGINT) AS concat_bins,
       CAST(sum((tok + ctx - 1) // ctx) * ctx - sum(tok) AS BIGINT) AS concat_waste
FROM s GROUP BY ctx
"""


# --- dedup_pair_source_mix -----------------------------------------------------

def _pair_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by source pair.  The aug fixture's planted copies
    carry ``doc_id + 1e6``, so ``% 1e6`` maps every pair side back to
    its real document row for the source lookup.  At lake scale the
    pair set is the SMALL side — the source dimension joins shuffle
    pair rows, never the corpus."""
    aug = _augmented_docs(spark, sf_dir, max_doc=150)
    pairs = ngram_jaccard_pairs(
        word_ngrams(aug, "doc_id", "t"), threshold=0.5
    ).select("doc_a", "doc_b")
    src = load(spark, sf_dir, "documents").select("doc_id", "source")
    withs = pairs.join(
        src.select(F.col("doc_id").alias("ka"), F.col("source").alias("sa")),
        pairs.doc_a % AUG_ID_SHIFT == F.col("ka"),
    ).join(
        src.select(F.col("doc_id").alias("kb"), F.col("source").alias("sb")),
        F.col("doc_b") % AUG_ID_SHIFT == F.col("kb"),
    )
    return (
        withs.select(
            F.least("sa", "sb").alias("source_lo"),
            F.greatest("sa", "sb").alias("source_hi"),
        )
        .groupBy("source_lo", "source_hi")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


_PAIR_SOURCE_MIX_SQL = (
    "WITH "
    + _aug_cte(max_doc=150)
    + _GRAM_STATS_CTES
    + """,
j AS (
  SELECT doc_a, doc_b,
         CAST(n_inter AS DOUBLE) / CAST(sa.n_grams + sb.n_grams - n_inter AS DOUBLE) AS jac
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b),
pairs AS (SELECT doc_a, doc_b FROM j WHERE jac >= 0.5)
SELECT least(da.source, db.source) AS source_lo,
       greatest(da.source, db.source) AS source_hi,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs p
JOIN documents da ON p.doc_a % {shift} = da.doc_id
JOIN documents db ON p.doc_b % {shift} = db.doc_id
GROUP BY 1, 2
""".format(shift=AUG_ID_SHIFT)
)


# --- minhash_recall_by_jaccard_band ------------------------------------------------

def _minhash_recall_by_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EMPIRICAL S-curve: LSH detection rate per true-Jaccard
    bucket, across the whole spectrum (j ≥ 0.25), in the detector's
    own similarity space (char-12 shingles — the very sets MinHash
    sketches).  ``minhash_lsh_recall_contract`` gates ONE operating
    point (overall recall at j ≥ 0.8); this key shows the measured
    curve that ``minhash_band_tuning_curve`` predicts theoretically —
    together they are the calibration pair an operator reads before
    re-banding a 100 TB dedup run.  Ground truth comes from the
    gram-bucket pipeline (never from signatures), so a banding bug
    shows up as a recall dip, not as self-consistent garbage."""
    from data_pipeline_bigquery_spark.extensions.dedup_text import (
        char_shingles,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    aug = _augmented_docs(spark, sf_dir, max_doc=150)
    # one materialized shingle stream feeds both arms (contract's note:
    # different agg keys → no exchange reuse without the checkpoint;
    # corpus capped at 300 docs by construction)
    shingles = char_shingles(aug, "doc_id", "t").localCheckpoint(eager=False)
    grams = shingles.withColumnRenamed("shingle", "gram").distinct()
    truth = (
        _gram_pair_stats(grams)
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
            ).alias("j"),
        )
        .filter(F.col("j") >= 0.25)
        .withColumn("j_bucket", F.floor(F.col("j") * F.lit(10.0)).cast("int"))
    )
    lsh = lsh_candidate_pairs(minhash_signatures(shingles))
    hits = truth.join(
        lsh.withColumn("hit", F.lit(1)), ["doc_a", "doc_b"], "left"
    )
    return (
        hits.groupBy("j_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_detected"),
        )
        .select(
            "j_bucket",
            "n_true",
            "n_detected",
            F.expr("(n_detected * 1000) DIV n_true").alias("recall_permille"),
        )
    )


def _minhash_recall_by_band_sql() -> str:
    from data_pipeline_bigquery_spark.extensions.dedup_text import (
        DEFAULT_MAX_BUCKET,
    )
    from data_pipeline_bigquery_spark.queries.extensions import minhash_lng_ctes

    # truth CTEs renamed t* — minhash_lng_ctes also defines an `sh`
    return (
        "WITH "
        + _aug_cte(max_doc=150)
        + ",\n"
        + minhash_lng_ctes("aug")
        + f""",
bucket_sizes AS (
  SELECT band_idx, band_hash, count(*) AS n_in_bucket
  FROM lng GROUP BY 1, 2),
det AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM lng a
  JOIN lng b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
  JOIN bucket_sizes s
    ON a.band_idx = s.band_idx AND a.band_hash = s.band_hash
  WHERE s.n_in_bucket <= {DEFAULT_MAX_BUCKET}),
{char_truth_ctes()},
tp AS (
  SELECT doc_a, doc_b, CAST(floor(j * CAST(10 AS DOUBLE)) AS INT) AS j_bucket
  FROM tj WHERE j >= 0.25)
SELECT j_bucket,
       CAST(count(*) AS BIGINT) AS n_true,
       CAST(sum(CASE WHEN d.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_detected,
       CAST(sum(CASE WHEN d.doc_a IS NOT NULL THEN 1 ELSE 0 END) * 1000
            // count(*) AS BIGINT) AS recall_permille
FROM tp
LEFT JOIN det d ON tp.doc_a = d.doc_a AND tp.doc_b = d.doc_b
GROUP BY j_bucket
"""
    )


# --- lsh_bucket_size_histogram ---------------------------------------------------

def _lsh_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-bucket occupancy histogram — the skew diagnostic behind the
    ``max_bucket`` hot-bucket cap: at lake scale a single boilerplate
    bucket of n docs contributes n·(n−1)/2 junk pairs, and THIS is the
    table that shows the tail before the pair stage pays for it.
    ``candidate_pairs`` is each size's total pair contribution were it
    NOT capped; ``over_cap`` marks sizes the pair generator drops.
    Engine note: Spark buckets by xxhash64 over the band's signature
    longs, the oracle by the md5-string band key — DIFFERENT key
    values, identical partitions (both key on equality of the same
    signature slice), so sizes compare exactly."""
    from data_pipeline_bigquery_spark.extensions.dedup_text import (
        DEFAULT_MAX_BUCKET,
        band_hashes,
    )
    from data_pipeline_bigquery_spark.queries.extensions import (
        _aug_minhash_signatures,
    )

    # slice-CSE aug signature build (bit-identical rows; half the md5 /
    # permutation work — see queries.extensions._aug_minhash_signatures)
    sigs = _aug_minhash_signatures(spark, sf_dir)
    sizes = (
        band_hashes(sigs)
        .groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        sizes.groupBy("n")
        .agg(F.count(F.lit(1)).alias("n_buckets"))
        .select(
            F.col("n").alias("bucket_size"),
            "n_buckets",
            F.expr("n_buckets * (n * (n - 1) DIV 2)").alias("candidate_pairs"),
            (F.col("n") > DEFAULT_MAX_BUCKET).cast("int").alias("over_cap"),
        )
    )


def _lsh_bucket_histogram_sql() -> str:
    from data_pipeline_bigquery_spark.extensions.dedup_text import (
        DEFAULT_MAX_BUCKET,
    )
    from data_pipeline_bigquery_spark.queries.extensions import minhash_lng_ctes

    return (
        "WITH "
        + _aug_cte()
        + ",\n"
        + minhash_lng_ctes("aug")
        + f""",
bucket_sizes AS (
  SELECT band_idx, band_hash, count(*) AS n FROM lng GROUP BY 1, 2)
SELECT CAST(n AS BIGINT) AS bucket_size,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(count(*) * (n * (n - 1) // 2) AS BIGINT) AS candidate_pairs,
       CAST(CASE WHEN n > {DEFAULT_MAX_BUCKET} THEN 1 ELSE 0 END AS INT) AS over_cap
FROM bucket_sizes GROUP BY n
"""
    )


# --- dup_token_inflation_by_source ----------------------------------------------

def _dup_token_inflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token mass in non-canonical exact-dup rows, per source.  Digest
    and token count project BEFORE the window so the shuffle carries
    32-byte keys + ints, never text.  ``inflation_micro`` overflows
    BIGINT only past ~9e12 dup tokens — beyond any single source's
    fixture-contract range; at true lake scale emit per-mille instead."""
    docs = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    both = docs.select("doc_id", "source", "text").unionByName(
        docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + AUG_ID_SHIFT).alias("doc_id"), "source", "text"
        )
    )
    pre = both.select(
        "source",
        "doc_id",
        F.md5("text").alias("d"),
        F.size(F.split(ascii_lower(F.col("text")), " ")).cast("bigint").alias("n"),
    )
    w = Window.partitionBy("d").orderBy("doc_id")
    flagged = pre.select(
        "source", "n", (F.row_number().over(w) > 1).cast("int").alias("is_dup")
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("total_tokens"),
            F.sum("is_dup").alias("dup_docs"),
            F.sum(F.when(F.col("is_dup") == 1, F.col("n")).otherwise(F.lit(0)))
            .alias("dup_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "dup_docs",
            "dup_tokens",
            F.expr("(dup_tokens * 1000000) DIV total_tokens").alias(
                "inflation_micro"
            ),
        )
    )


_DUP_INFLATION_SQL = f"""
WITH unioned AS (
  SELECT doc_id, source, text FROM documents WHERE text IS NOT NULL
  UNION ALL
  SELECT doc_id + {AUG_ID_SHIFT}, source, text FROM documents
  WHERE text IS NOT NULL AND doc_id % 5 = 0),
pre AS (
  SELECT source, doc_id, md5(text) AS d,
         CAST(len(string_split({LOWER_TEXT_SQL}, ' ')) AS BIGINT) AS n
  FROM unioned),
flagged AS (
  SELECT source, n,
         CASE WHEN row_number() OVER (PARTITION BY d ORDER BY doc_id) > 1
              THEN 1 ELSE 0 END AS is_dup
  FROM pre)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS total_tokens,
       CAST(sum(is_dup) AS BIGINT) AS dup_docs,
       CAST(sum(CASE WHEN is_dup = 1 THEN n ELSE 0 END) AS BIGINT) AS dup_tokens,
       CAST(sum(CASE WHEN is_dup = 1 THEN n ELSE 0 END) * 1000000
            // CAST(sum(n) AS BIGINT) AS BIGINT) AS inflation_micro
FROM flagged GROUP BY source
"""


QUERIES: dict[str, QuerySpec] = {
    "minhash_band_tuning_curve": QuerySpec(_band_tuning_curve, _band_tuning_sql()),
    "packing_waste_curve": QuerySpec(_packing_waste_curve, _PACKING_WASTE_SQL),
    "dedup_pair_source_mix": QuerySpec(_pair_source_mix, _PAIR_SOURCE_MIX_SQL),
    "lsh_bucket_size_histogram": QuerySpec(
        _lsh_bucket_histogram, _lsh_bucket_histogram_sql()
    ),
    "minhash_recall_by_jaccard_band": QuerySpec(
        _minhash_recall_by_band, _minhash_recall_by_band_sql()
    ),
    "dup_token_inflation_by_source": QuerySpec(
        _dup_token_inflation, _DUP_INFLATION_SQL
    ),
}
