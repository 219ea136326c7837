"""Analytics batch 26 — pre-run planning ops for a 100 TB curation job
(round 13): the mixture, dedup-scope, span-dedup, chaining-risk, and
shuffle-skew numbers an operator computes BEFORE the expensive pass.

- ``token_budget_allocation``: the flattened-mixture plan — divide a
  token budget (half the corpus) EQUALLY across sources, capping each
  source's allocation at 2 epochs of its own tokens (upsampling
  low-resource sources without unbounded repetition).  Per source:
  allocation, implied epochs (micro-units), and whether the cap bound.
  One scan → one tiny per-source aggregate; the mixture math runs on a
  #sources-row frame.
- ``dedup_scope_comparison``: tokens dropped under GLOBAL-scope exact
  dedup vs PER-SOURCE scope, on a fixture that plants cross-source
  mirrors (``doc_id % 5`` copies re-sourced ``mirror:<source>``).  The
  delta is the number ``dedup_pair_source_mix`` motivates: how much a
  per-source-sharded dedup run (cheap, no cross-shard shuffle) leaves
  on the table vs a global one.  Digests + token ints shuffle;
  payloads never do.
- ``dup_span_window_mass``: cross-document duplicated SPAN mass — the
  suffix-array-style span-dedup diagnostic (dedup at substring grain,
  not whole-doc): 16-token windows at stride 8, md5 per window,
  windows whose digest appears in >1 distinct doc are duplicated span
  mass, reported per source.  Linear in corpus tokens; only 32-byte
  digests shuffle.  Whole-doc detectors (``dedup_exact``/minhash) miss
  a big doc quoting another — this is the mass they miss.
- ``dedup_chain_transitivity_audit``: the cluster-chaining risk gate —
  connected-component dedup merges a∼b∼c even when jaccard(a,c) is
  below threshold (transitive over-merge).  On a 3-copy fixture
  (base, −4 chars, −8 chars) it measures the 2-path closure rate in
  the ≥0.5 word-3-gram pair graph: LOW closure ⇒ CC-based kill lists
  over-merge and need cluster verification; high ⇒ safe.  Bounded
  calibration corpus (150 base docs), same gram bucket pipeline as
  the pair keys.
- ``shuffle_skew_preflight``: partition-balance audit BEFORE keying a
  1000-executor shuffle: rows per md5-derived 64-bucket of
  ``l_orderkey`` (the repo's portable bucket — `hash_bucket`), max/min
  bucket load vs the uniform mean (micro-units), plus the hottest
  single key's share — the straggler predictor that says whether this
  key needs salting.  Two hash aggregates over key columns only.
- ``minhash_precision_by_band``: the PRECISION half of the r12
  calibration pair (``minhash_recall_by_jaccard_band`` measures
  recall): for each banding config (bands × rows/band = 16), the
  fraction of LSH candidate pairs that are TRUE near-dups (char-12
  Jaccard ≥ 0.5) — candidate precision is the verify-stage cost knob
  (every false candidate pays an exact-Jaccard check at lake scale).
  ONE signature table banded four ways (Spark: `lsh_candidate_pairs`
  per config over a checkpointed sig; oracle: `band_lng_ctes`, the
  single banding-SQL generator, per config over one ``sig`` CTE).

Parity discipline: counts/tokens integer-exact; rates in integer
permille/micro via integer division (`DIV` / `//`); jaccard is an
int/int IEEE divide (bit-identical); md5-derived buckets via the
`hash_bucket` expression mirrored digit-for-digit; no libm, no raw
double sums.

Reference parity: beyond the reference surface (its pandas pipelines
have no corpus ops — `pipeline/functions/functions.py:91-105` is
pk-grain `drop_duplicates_by_id`); these extend the curation-planning
family of batches 24-25.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.extensions.dedup_text import (
    DEFAULT_MAX_BUCKET,
    _gram_pair_stats,
    char_shingles,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    word_ngrams,
)
from data_pipeline_bigquery_spark.extensions.sampling import hash_bucket
from data_pipeline_bigquery_spark.functions.text import LOWER_TEXT_SQL, ascii_lower
from data_pipeline_bigquery_spark.queries import QuerySpec
from data_pipeline_bigquery_spark.queries.extensions import (
    _GRAM_STATS_CTES,
    AUG_ID_SHIFT,
    _aug_cte,
    _augmented_docs,
    band_lng_ctes,
    char_truth_ctes,
    minhash_lng_ctes,
)

def _tokens():
    """Whitespace token count of ``text`` — built lazily: a module-level
    Column invokes the JVM at import time and imports must work without
    a live SparkContext (registry enumeration, pytest collection)."""
    return F.size(F.split(ascii_lower(F.col("text")), " ")).cast("bigint")


_TOKENS_SQL = f"CAST(len(string_split({LOWER_TEXT_SQL}, ' ')) AS BIGINT)"


# --- token_budget_allocation --------------------------------------------------

_MAX_EPOCHS = 2


def _token_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-share mixture plan under a token budget with an epoch cap.

    budget = total_tokens div 2; each source's slice = budget div
    n_sources; allocation = min(slice, 2 × source_tokens).  The
    unallocated remainder (sources that hit the cap) is what an
    operator redistributes on the next planning iteration — reported
    via ``capped`` so the table shows WHERE the budget stalls."""
    per_source = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum(_tokens()).alias("tokens"))
    )
    w = Window.partitionBy()
    planned = per_source.select(
        "source",
        "n_docs",
        "tokens",
        F.sum("tokens").over(w).alias("total_tokens"),
        F.count(F.lit(1)).over(w).alias("n_sources"),
    ).select(
        "source",
        "n_docs",
        "tokens",
        F.expr("(total_tokens DIV 2) DIV n_sources").alias("slice_tokens"),
    )
    return planned.select(
        "source",
        "n_docs",
        "tokens",
        "slice_tokens",
        F.least(F.col("slice_tokens"), F.col("tokens") * _MAX_EPOCHS).alias(
            "alloc_tokens"
        ),
    ).select(
        "source",
        "n_docs",
        "tokens",
        "slice_tokens",
        "alloc_tokens",
        F.expr("(alloc_tokens * 1000000) DIV tokens").alias("epochs_micro"),
        (F.col("alloc_tokens") < F.col("slice_tokens")).cast("int").alias("capped"),
    )


_TOKEN_BUDGET_SQL = f"""
WITH per_source AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum({_TOKENS_SQL}) AS BIGINT) AS tokens
  FROM documents WHERE text IS NOT NULL GROUP BY source),
planned AS (
  SELECT source, n_docs, tokens,
         CAST((sum(tokens) OVER () // 2) // (count(*) OVER ()) AS BIGINT)
           AS slice_tokens
  FROM per_source),
alloc AS (
  SELECT source, n_docs, tokens, slice_tokens,
         CAST(least(slice_tokens, tokens * {_MAX_EPOCHS}) AS BIGINT) AS alloc_tokens
  FROM planned)
SELECT source, n_docs, tokens, slice_tokens, alloc_tokens,
       CAST(alloc_tokens * 1000000 // tokens AS BIGINT) AS epochs_micro,
       CAST(CASE WHEN alloc_tokens < slice_tokens THEN 1 ELSE 0 END AS INT) AS capped
FROM alloc
"""


# --- dedup_scope_comparison -----------------------------------------------------

def _dedup_scope_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global vs per-source exact-dedup drop mass.  The mirror fixture
    re-sources every planted copy (``mirror:<source>``) so the two
    scopes genuinely diverge: per-source dedup can't see a mirror of
    another source's doc.  Projection puts digest + token count BEFORE
    the windows — the shuffles carry 32-byte keys and ints, never
    text."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "source", "text")
    )
    mirrored = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + AUG_ID_SHIFT).alias("doc_id"),
        F.concat(F.lit("mirror:"), F.col("source")).alias("source"),
        "text",
    )
    pre = docs.unionByName(mirrored).select(
        "source", "doc_id", F.md5("text").alias("d"), _tokens().alias("n")
    )
    wg = Window.partitionBy("d").orderBy("doc_id")
    ws = Window.partitionBy("source", "d").orderBy("doc_id")
    flagged = pre.select(
        "source",
        "n",
        (F.row_number().over(wg) > 1).cast("long").alias("dup_g"),
        (F.row_number().over(ws) > 1).cast("long").alias("dup_s"),
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n").alias("tokens"),
        F.sum("dup_g").alias("dropped_docs_global"),
        F.sum(F.col("dup_g") * F.col("n")).alias("dropped_tokens_global"),
        F.sum("dup_s").alias("dropped_docs_scoped"),
        F.sum(F.col("dup_s") * F.col("n")).alias("dropped_tokens_scoped"),
        F.sum((F.col("dup_g") - F.col("dup_s")) * F.col("n")).alias(
            "scope_delta_tokens"
        ),
    )


_DEDUP_SCOPE_SQL = f"""
WITH unioned AS (
  SELECT doc_id, source, text FROM documents WHERE text IS NOT NULL
  UNION ALL
  SELECT doc_id + {AUG_ID_SHIFT}, 'mirror:' || source, text FROM documents
  WHERE text IS NOT NULL AND doc_id % 5 = 0),
pre AS (
  SELECT source, doc_id, md5(text) AS d, {_TOKENS_SQL} AS n FROM unioned),
flagged AS (
  SELECT source, n,
         CASE WHEN row_number() OVER (PARTITION BY d ORDER BY doc_id) > 1
              THEN 1 ELSE 0 END AS dup_g,
         CASE WHEN row_number() OVER (PARTITION BY source, d ORDER BY doc_id) > 1
              THEN 1 ELSE 0 END AS dup_s
  FROM pre)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS tokens,
       CAST(sum(dup_g) AS BIGINT) AS dropped_docs_global,
       CAST(sum(dup_g * n) AS BIGINT) AS dropped_tokens_global,
       CAST(sum(dup_s) AS BIGINT) AS dropped_docs_scoped,
       CAST(sum(dup_s * n) AS BIGINT) AS dropped_tokens_scoped,
       CAST(sum((dup_g - dup_s) * n) AS BIGINT) AS scope_delta_tokens
FROM flagged GROUP BY source
"""


# --- dup_span_window_mass -------------------------------------------------------

_SPAN_W = 16
_SPAN_STRIDE = 8


def _dup_span_window_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated 16-token-window mass per source (stride 8).  A window
    is duplicated when its md5 appears in >1 DISTINCT doc — intra-doc
    repetition doesn't count (that's ``repetition_filter``'s axis).
    The window stream is linear in corpus tokens; the digest groupBy
    shuffles 32-byte keys only."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id", "source", F.split(ascii_lower(F.col("text")), " ").alias("w")
        )
    )
    unioned = docs.unionByName(
        docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + AUG_ID_SHIFT).alias("doc_id"), "source", "w"
        )
    ).filter(F.size("w") >= _SPAN_W)
    win = unioned.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(w) - {_SPAN_W - 1}, {_SPAN_STRIDE}),"
                f" p -> md5(concat_ws(' ', slice(w, p, {_SPAN_W}))))"
            )
        ).alias("d"),
    )
    # ONE pass over the window stream: reduce to (digest, source) grain
    # first (a doc_id lives in exactly one source, so the per-digest
    # distinct-doc total is the sum of per-source distincts), then a
    # window over the reduced frame — no join-back of the big stream
    per_src = win.groupBy("d", "source").agg(
        F.count(F.lit(1)).alias("nw"),
        F.count_distinct("doc_id").alias("nd_s"),
    )
    wd = Window.partitionBy("d")
    flagged = per_src.select(
        "source",
        "nw",
        (F.sum("nd_s").over(wd) > 1).cast("long").alias("is_dup"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.sum("nw").alias("n_windows"),
            F.sum(F.col("is_dup") * F.col("nw")).alias("dup_windows"),
        )
        .select(
            "source",
            "n_windows",
            "dup_windows",
            F.expr("(dup_windows * 1000) DIV n_windows").alias("dup_permille"),
        )
    )


_DUP_SPAN_SQL = f"""
WITH u AS (
  SELECT doc_id, source, string_split({LOWER_TEXT_SQL}, ' ') AS w
  FROM documents WHERE text IS NOT NULL
  UNION ALL
  SELECT doc_id + {AUG_ID_SHIFT}, source, string_split({LOWER_TEXT_SQL}, ' ')
  FROM documents WHERE text IS NOT NULL AND doc_id % 5 = 0),
eligible AS (SELECT doc_id, source, w FROM u WHERE len(w) >= {_SPAN_W}),
win AS (
  SELECT doc_id, source,
         md5(array_to_string(
           w[CAST(i AS INT):CAST(i AS INT) + {_SPAN_W - 1}], ' ')) AS d
  FROM eligible,
       UNNEST(range(1, len(w) - {_SPAN_W - 1} + 1, {_SPAN_STRIDE})) AS u2(i)),
per_src AS (
  SELECT d, source, count(*) AS nw, count(DISTINCT doc_id) AS nd_s
  FROM win GROUP BY d, source),
flagged AS (
  SELECT source, nw,
         CASE WHEN sum(nd_s) OVER (PARTITION BY d) > 1 THEN 1 ELSE 0 END AS is_dup
  FROM per_src)
SELECT source,
       CAST(sum(nw) AS BIGINT) AS n_windows,
       CAST(sum(is_dup * nw) AS BIGINT) AS dup_windows,
       CAST(sum(is_dup * nw) * 1000 // sum(nw) AS BIGINT) AS dup_permille
FROM flagged GROUP BY source
"""


# --- dedup_chain_transitivity_audit ---------------------------------------------

def _chain_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-path closure rate of the ≥0.5 word-3-gram pair graph on a
    3-copy fixture (base, first 4 chars dropped, first 8 dropped).
    Closure < 1000‰ quantifies exactly how often connected-component
    dedup (``dedup_clusters``) merges pairs that are NOT themselves
    near-dups — the over-merge risk a kill-list run takes at scale."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .select("doc_id", ascii_lower(F.col("text")).alias("t"))
    )
    aug3 = docs.unionByName(
        docs.select(
            (F.col("doc_id") + AUG_ID_SHIFT).alias("doc_id"),
            F.expr("substring(t, 5)").alias("t"),
        )
    ).unionByName(
        docs.select(
            (F.col("doc_id") + 2 * AUG_ID_SHIFT).alias("doc_id"),
            F.expr("substring(t, 9)").alias("t"),
        )
    )
    # lineage cut on the REDUCED pair list: five downstream readers
    # (sym x2, closure probe, edge count) would otherwise each re-derive
    # the whole gram-bucket pipeline from base scans (54 scans measured)
    pairs = (
        ngram_jaccard_pairs(word_ngrams(aug3, "doc_id", "t"), threshold=0.5)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=False)
    )
    sym = pairs.unionByName(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    paths = (
        sym.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .join(
            sym.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c")), "b"
        )
        .filter(F.col("a") < F.col("c"))
    )
    closed = paths.join(
        pairs.select(
            F.col("doc_a").alias("a"), F.col("doc_b").alias("c"), F.lit(1).alias("hit")
        ),
        ["a", "c"],
        "left",
    )
    edges = pairs.agg(F.count(F.lit(1)).alias("n_edges"))
    stats = closed.agg(
        F.count(F.lit(1)).alias("n_two_paths"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0)).cast("long")).alias("n_closed"),
    )
    return edges.crossJoin(stats).select(
        "n_edges",
        "n_two_paths",
        "n_closed",
        F.expr("(n_closed * 1000) DIV nullif(n_two_paths, 0)").alias(
            "closure_permille"
        ),
    )


_CHAIN_TRANSITIVITY_SQL = (
    f"""
WITH base AS (
  SELECT doc_id, {LOWER_TEXT_SQL} AS t FROM documents WHERE doc_id < 150),
aug AS (SELECT doc_id, t FROM base
        UNION ALL
        SELECT doc_id + {AUG_ID_SHIFT}, substr(t, 5) FROM base
        UNION ALL
        SELECT doc_id + {2 * AUG_ID_SHIFT}, substr(t, 9) FROM base)"""
    # w/grams/sizes/inter come from the ONE shared word-3-gram CTE
    # block (it reads the `aug` CTE defined above)
    + _GRAM_STATS_CTES
    + """,
pairs AS (
  SELECT doc_a, doc_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_inter AS DOUBLE)
        / CAST(sa.n_grams + sb.n_grams - n_inter AS DOUBLE) >= 0.5),
sym AS (SELECT doc_a, doc_b FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs),
paths AS (
  SELECT e1.doc_a AS a, e2.doc_b AS c
  FROM sym e1 JOIN sym e2 ON e1.doc_b = e2.doc_a
  WHERE e1.doc_a < e2.doc_b),
closed AS (
  SELECT CAST(count(*) AS BIGINT) AS n_two_paths,
         CAST(sum(CASE WHEN p.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_closed
  FROM paths
  LEFT JOIN pairs p ON paths.a = p.doc_a AND paths.c = p.doc_b),
edges AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM pairs)
SELECT n_edges, n_two_paths, n_closed,
       CAST(n_closed * 1000 // nullif(n_two_paths, 0) AS BIGINT)
         AS closure_permille
FROM edges, closed
"""
)


# --- shuffle_skew_preflight -----------------------------------------------------

_SKEW_BUCKETS = 64


def _shuffle_skew_preflight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-shuffle balance audit for ``l_orderkey``: per-bucket load of
    the 64-way md5 bucket (`hash_bucket` — the repo's engine-portable
    partitioner model) plus the hottest single key's share.  Only key
    columns aggregate; the fact payload never moves."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    buckets = (
        li.groupBy(hash_bucket("l_orderkey", _SKEW_BUCKETS))
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.count(F.lit(1)).alias("n_nonempty_buckets"),
            F.sum("n").alias("n_rows"),
            F.max("n").alias("max_bucket_rows"),
            F.min("n").alias("min_bucket_rows"),
        )
    )
    top = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("top_key_rows"))
    )
    return buckets.crossJoin(top).select(
        "n_rows",
        "n_nonempty_buckets",
        "max_bucket_rows",
        "min_bucket_rows",
        F.expr(
            f"(max_bucket_rows * {_SKEW_BUCKETS} * 1000000) DIV n_rows"
        ).alias("max_load_micro"),
        "top_key_rows",
        F.expr("(top_key_rows * 1000000) DIV n_rows").alias("top_key_micro"),
    )


_SKEW_PREFLIGHT_SQL = f"""
WITH bucketed AS (
  SELECT CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 7)) AS BIGINT)
           % {_SKEW_BUCKETS} AS bucket
  FROM lineitem),
b AS (SELECT bucket, count(*) AS n FROM bucketed GROUP BY bucket),
s AS (SELECT CAST(count(*) AS BIGINT) AS n_nonempty_buckets,
             CAST(sum(n) AS BIGINT) AS n_rows,
             CAST(max(n) AS BIGINT) AS max_bucket_rows,
             CAST(min(n) AS BIGINT) AS min_bucket_rows
      FROM b),
k AS (SELECT CAST(max(n) AS BIGINT) AS top_key_rows
      FROM (SELECT count(*) AS n FROM lineitem GROUP BY l_orderkey))
SELECT n_rows, n_nonempty_buckets, max_bucket_rows, min_bucket_rows,
       CAST(max_bucket_rows * {_SKEW_BUCKETS} * 1000000 // n_rows AS BIGINT)
         AS max_load_micro,
       top_key_rows,
       CAST(top_key_rows * 1000000 // n_rows AS BIGINT) AS top_key_micro
FROM s, k
"""


# --- minhash_precision_by_band --------------------------------------------------

_BAND_CONFIGS = (2, 4, 8, 16)  # bands; rows/band = 16 // bands


def _minhash_precision_by_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate precision per banding config: of the pairs LSH would
    send to the (expensive) exact-verify stage, how many are true
    near-dups (char-12 Jaccard ≥ 0.5)?  More bands / fewer rows per
    band buys recall (the r12 S-curve) by PAYING precision — this
    table prices that trade.  One checkpointed signature table feeds
    all four configs; truth comes from the gram-bucket pipeline, never
    from the signatures being judged."""
    aug = _augmented_docs(spark, sf_dir, max_doc=150)
    shingles = char_shingles(aug, "doc_id", "t").localCheckpoint(eager=False)
    sig = minhash_signatures(shingles).localCheckpoint(eager=False)
    truth = _gram_pair_stats(
        shingles.withColumnRenamed("shingle", "gram").distinct()
    ).select(
        "doc_a",
        "doc_b",
        (
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
        ).alias("j"),
    )
    arms = [
        lsh_candidate_pairs(sig, bands=b).select(
            F.lit(b).alias("n_bands"),
            F.lit(16 // b).alias("rows_per_band"),
            "doc_a",
            "doc_b",
        )
        for b in _BAND_CONFIGS
    ]
    cand = arms[0]
    for arm in arms[1:]:
        cand = cand.unionByName(arm)
    hits = cand.join(truth, ["doc_a", "doc_b"], "left")
    return (
        hits.groupBy("n_bands", "rows_per_band")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(
                F.when(F.col("j") >= 0.5, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_true"),
        )
        .select(
            "n_bands",
            "rows_per_band",
            "n_candidates",
            "n_true",
            F.expr("(n_true * 1000) DIV n_candidates").alias("precision_permille"),
        )
    )


def _minhash_precision_sql() -> str:
    # default-banding CTEs (sh/sig/bands/lng) come from the ONE
    # generator; extra configs band the same `sig` via band_lng_ctes
    per_config = []
    for b in _BAND_CONFIGS:
        pfx = "" if b == 2 else f"c{b}_"
        extra = "" if b == 2 else band_lng_ctes(b, prefix=pfx) + ",\n"
        per_config.append(
            extra
            + f"""{pfx}bucket_sizes AS (
  SELECT band_idx, band_hash, count(*) AS n_in_bucket
  FROM {pfx}lng GROUP BY 1, 2),
{pfx}det AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM {pfx}lng a
  JOIN {pfx}lng b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
  JOIN {pfx}bucket_sizes s
    ON a.band_idx = s.band_idx AND a.band_hash = s.band_hash
  WHERE s.n_in_bucket <= {DEFAULT_MAX_BUCKET})"""
        )
    cand = "\n  UNION ALL ".join(
        f"SELECT CAST({b} AS INT) AS n_bands, CAST({16 // b} AS INT) AS rows_per_band,"
        f" doc_a, doc_b FROM {'' if b == 2 else f'c{b}_'}det"
        for b in _BAND_CONFIGS
    )
    return (
        "WITH "
        + _aug_cte(max_doc=150)
        + ",\n"
        + minhash_lng_ctes("aug")
        + ",\n"
        + ",\n".join(per_config)
        + f""",
cand AS ({cand}),
{char_truth_ctes()}
SELECT n_bands, rows_per_band,
       CAST(count(*) AS BIGINT) AS n_candidates,
       CAST(sum(CASE WHEN tj.j >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
       CAST(sum(CASE WHEN tj.j >= 0.5 THEN 1 ELSE 0 END) * 1000
            // count(*) AS BIGINT) AS precision_permille
FROM cand
LEFT JOIN tj ON cand.doc_a = tj.doc_a AND cand.doc_b = tj.doc_b
GROUP BY n_bands, rows_per_band
"""
    )


QUERIES: dict[str, QuerySpec] = {
    "token_budget_allocation": QuerySpec(
        _token_budget_allocation, _TOKEN_BUDGET_SQL
    ),
    "dedup_scope_comparison": QuerySpec(_dedup_scope_comparison, _DEDUP_SCOPE_SQL),
    "dup_span_window_mass": QuerySpec(_dup_span_window_mass, _DUP_SPAN_SQL),
    "dedup_chain_transitivity_audit": QuerySpec(
        _chain_transitivity, _CHAIN_TRANSITIVITY_SQL
    ),
    "shuffle_skew_preflight": QuerySpec(
        _shuffle_skew_preflight, _SKEW_PREFLIGHT_SQL
    ),
    "minhash_precision_by_band": QuerySpec(
        _minhash_precision_by_band, _minhash_precision_sql()
    ),
}
