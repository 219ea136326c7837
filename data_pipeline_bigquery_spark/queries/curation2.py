"""Corpus curation batch 2 — the web-pipeline staples the first batch
(`extensions/curation.py`, `extensions/sampling.py`) didn't cover:

- ``quality_filter_cascade``: a C4-style rule cascade with per-rule
  drop accounting in ONE corpus pass — every production filter pipeline
  reports "how many documents did each rule kill", because a rule that
  suddenly drops 40% is a bug in the rule, not the corpus.  Attribution
  is first-failing-rule in a fixed order (the cascade semantics of
  C4/Gopher/RefinedWeb).
- ``training_shard_manifest``: deterministic md5-bucket shard
  assignment plus a per-shard manifest (row count, token sum, digest of
  the ordered member ids).  Shard writers need the manifest to verify a
  re-run produced byte-identical membership — the digest makes shard
  assignment drift (a changed hash seed, a lost doc) loud.
- ``doc_commonness_score``: a unigram-LM perplexity proxy (CCNet
  filters on LM perplexity; the integer-exact stand-in is the mean
  corpus frequency of the document's words — low = rare/noisy tokens,
  high = boilerplate).  All math is integer sums plus one IEEE double
  division, so the DuckDB oracle hash-matches bit for bit.

All three are single-plan Catalyst jobs: explode → keyed agg (+ a
vocabulary-sized join for the commonness score).  Nothing touches the
driver; nothing is quadratic; the shuffles key on words, digests, or
shard ids — never on document text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.queries import QuerySpec

# cascade thresholds (integer-exact forms; see docstrings)
_MIN_WORDS = 30
_MIN_DISTINCT_PCT = 30  # distinct/total >= 30%
_MEAN_LEN_MIN, _MEAN_LEN_MAX = 2, 12  # mean word length band
_N_SHARDS = 8


def cascade_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cascade's input grain — doc_id, words (space split), text —
    so the tokenization too has exactly one definition across the
    cascade key and the learning-curve key (analytics14)."""
    return load(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("words"), F.col("text")
    )


def cascade_metrics(docs: DataFrame) -> DataFrame:
    """Per-doc cascade inputs (n_words, n_distinct, sum_chars,
    has_stop) from one array pass — the ONE Spark-side source of the
    cascade arithmetic, shared with the learning-curve key
    (analytics14).  ``docs`` must carry doc_id, words, text."""
    return docs.select(
        "doc_id",
        F.size("words").alias("n_words"),
        F.size(F.array_distinct("words")).alias("n_distinct"),
        # sum of word lengths == chars minus separators
        (F.length("text") - (F.size("words") - 1)).alias("sum_chars"),
        F.arrays_overlap(
            "words", F.array(F.lit("the"), F.lit("a"))
        ).alias("has_stop"),
    )


def cascade_reason():
    """The first-failure attribution Column over cascade metrics."""
    return (
        F.when(F.col("n_words") < _MIN_WORDS, "min_words")
        .when(
            F.col("n_distinct") * 100
            < F.col("n_words") * _MIN_DISTINCT_PCT,
            "repetition",
        )
        .when(~F.col("has_stop"), "stopword")
        .when(
            (F.col("sum_chars") < _MEAN_LEN_MIN * F.col("n_words"))
            | (F.col("sum_chars") > _MEAN_LEN_MAX * F.col("n_words")),
            "word_length",
        )
        .otherwise("pass")
    )


def _quality_filter_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule drop accounting for a 4-rule C4-style cascade.

    Rules, in cascade order (a doc counts against its FIRST failure):

    1. ``min_words``      — at least {_MIN_WORDS} words;
    2. ``repetition``     — distinct words ≥ 30% of total (the Gopher
       repetition family, integer-exact: ``distinct*100 >= total*30``);
    3. ``stopword``       — contains a common-English stopword
       ('the'/'a'), C4's natural-language check;
    4. ``word_length``    — mean word length in [2, 12], integer-exact
       as ``sum_chars between 2*n and 12*n``.

    One corpus pass: per-doc metrics from pure array functions, a CASE
    chain for attribution, one tiny groupBy.  At 100 TB the output is
    five rows — the shuffle carries per-partition partial counts only.
    """
    return (
        cascade_metrics(cascade_docs(spark, sf_dir))
        .select(cascade_reason().alias("rule"))
        .groupBy("rule")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# the oracle twins of cascade_metrics / cascade_reason — interpolated
# into this key's SQL and the learning-curve oracle (analytics14)
CASCADE_METRICS_SQL = """SELECT doc_id,
         len(string_split(text, ' ')) AS n_words,
         len(list_distinct(string_split(text, ' '))) AS n_distinct,
         length(text) - (len(string_split(text, ' ')) - 1) AS sum_chars,
         list_has_any(string_split(text, ' '), ['the', 'a']) AS has_stop
  FROM documents"""

CASCADE_REASON_SQL = f"""CASE
           WHEN n_words < {_MIN_WORDS} THEN 'min_words'
           WHEN n_distinct * 100 < n_words * {_MIN_DISTINCT_PCT} THEN 'repetition'
           WHEN NOT has_stop THEN 'stopword'
           WHEN sum_chars < {_MEAN_LEN_MIN} * n_words
             OR sum_chars > {_MEAN_LEN_MAX} * n_words THEN 'word_length'
           ELSE 'pass'
         END"""

_CASCADE_SQL = f"""
WITH m AS ({CASCADE_METRICS_SQL}),
r AS (
  SELECT {CASCADE_REASON_SQL} AS rule
  FROM m)
SELECT rule, count(*) AS n_docs FROM r GROUP BY rule
"""


def _training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard manifest: every document lands in
    ``md5-bucket % {_N_SHARDS}`` (the same digit-for-digit portable
    bucket as ``extensions.sampling.hash_bucket``), and each shard
    reports row count, token sum, and an order-insensitive membership
    digest (md5 of the comma-joined SORTED doc ids).

    The digest is the drift alarm: if a re-run assigns even one doc to
    a different shard, that shard's digest changes.  At 100 TB: one
    keyed agg over {_N_SHARDS} groups; the ids inside a group are
    collected post-aggregation per shard — bounded by shard membership,
    exactly what the manifest must enumerate anyway (production would
    digest incrementally via sorted write order instead)."""
    from data_pipeline_bigquery_spark.extensions.sampling import hash_bucket

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        (hash_bucket(F.col("doc_id"), _N_SHARDS)).alias("shard"),
    )
    return (
        docs.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.md5(
                F.concat_ws(",", F.array_sort(F.collect_list(F.col("doc_id").cast("string"))))
            ).alias("ids_md5"),
        )
    )


_SHARD_MANIFEST_SQL = f"""
WITH d AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % {_N_SHARDS} AS shard
  FROM documents)
SELECT shard, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY CAST(doc_id AS VARCHAR))) AS ids_md5
FROM d GROUP BY shard
"""


def _doc_commonness_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM perplexity proxy, integer-exact: per document, the
    mean corpus frequency of its words (CCNet keeps middle-perplexity
    documents; rank-by-commonness gives the same ordering without
    transcendental math, so the oracle hash-matches).

    Two passes over the exploded words — count, then join back.  The
    frequency table is vocabulary-sized; no broadcast hint, so AQE
    broadcasts when it fits and co-partitions when it doesn't (the
    100 TB vocabulary can exceed a broadcast budget)."""
    words = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
    )
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    return (
        words.join(wc, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("freq").alias("freq_sum"),
        )
        .select(
            "doc_id",
            "n_words",
            "freq_sum",
            (F.col("freq_sum").cast("double") / F.col("n_words").cast("double")).alias(
                "avg_word_freq"
            ),
        )
    )


_COMMONNESS_SQL = """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
wc AS (SELECT w, count(*) AS freq FROM words GROUP BY w),
per_doc AS (
  SELECT doc_id, count(*) AS n_words, sum(freq) AS freq_sum
  FROM words JOIN wc USING (w) GROUP BY doc_id)
SELECT doc_id, n_words, CAST(freq_sum AS BIGINT) AS freq_sum,
       CAST(freq_sum AS DOUBLE) / CAST(n_words AS DOUBLE) AS avg_word_freq
FROM per_doc
"""


def _model_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear quality model (fasttext shape): md5-hashed
    bag-of-words → broadcast ``(fid, wt)`` table → integer-exact margin
    → rational squash.  The weight table is a frozen md5-derived init
    the oracle rebuilds via ``generate_series``; production swaps in a
    learned table through the ``weights`` parameter
    (`extensions/curation.py::model_quality_score`)."""
    from data_pipeline_bigquery_spark.extensions.curation import model_quality_score

    return model_quality_score(load(spark, sf_dir, "documents"))


_MODEL_SCORE_SQL = """
WITH w AS (
  SELECT i AS fid,
         CAST(('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 7)) AS BIGINT) % 2001 - 1000
           AS wt_millis
  FROM generate_series(0, 1023) t(i)),
tok AS (
  SELECT doc_id, w AS tok
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''),
f AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(tok), 1, 7)) AS BIGINT) % 1024 AS fid
  FROM tok),
s AS (
  SELECT doc_id, count(*) AS n_tok, sum(wt_millis) AS sw_millis
  FROM f JOIN w USING (fid) GROUP BY doc_id),
-- token-less docs still score (neutral 0.5) instead of vanishing
d AS (
  SELECT documents.doc_id,
         CAST(coalesce(n_tok, 0) AS BIGINT) AS n_tok,
         CAST(coalesce(sw_millis, 0) AS BIGINT) AS sw_millis
  FROM documents LEFT JOIN s ON documents.doc_id = s.doc_id)
SELECT doc_id, n_tok, sw_millis,
       round(0.5 + (CAST(sw_millis AS DOUBLE) / (greatest(n_tok, 1) * 1000.0))
                   / (2.0 * (1.0 + abs(CAST(sw_millis AS DOUBLE) / (greatest(n_tok, 1) * 1000.0)))),
             6) AS model_score
FROM d
"""


def _chi_square_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical-independence audit: the chi-square statistic between
    ``lang`` and ``source`` over the documents table — the check that
    catches a crawler whose language mix depends on the source (a
    biased shard) before it skews the training recipe.

    One contingency pass (groupBy lang, source) plus broadcast
    marginals; the per-cell term uses the cross-multiplied form
    ``(o·N − r·c)² / (r·c·N)`` so every numerator is exact integer
    arithmetic and only ONE IEEE division happens per cell.  ZERO cells
    (pairs that never co-occur, absent from the groupBy) contribute
    ``r·c/N`` each, handled ALGEBRAICALLY instead of materializing the
    full grid: ``Σ_zero r·c/N = N − Σ_observed r·c/N`` (the marginals'
    product sums to N over the complete grid), so
    ``chi² = Σ_obs term + N − Σ_obs r·c/N`` — perfect-association
    grids score the textbook N·(k−1) (unit-tested) with no cartesian
    join anywhere."""
    docs = load(spark, sf_dir, "documents")
    # ONE corpus pass: marginals and the total derive from the tiny
    # contingency aggregate, not from re-scanning documents
    cells = (
        docs.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("o"))
        # the cut makes the docstring true in the PLAN too: marginals,
        # total and the cell readout all reuse one materialized
        # contingency frame instead of four document scans (rule 14)
        .localCheckpoint(eager=False)
    )
    rows = cells.groupBy("lang").agg(F.sum("o").alias("r"))
    cols = cells.groupBy("source").agg(F.sum("o").alias("c"))
    n = cells.agg(F.sum("o").alias("n"))
    # num stays exact int64 up to ~3e9 docs (o·N ≤ N²); the SQUARE is
    # computed in double — it feeds an IEEE division anyway, and int64
    # squaring would overflow at ~1e5 docs on a skewed grid
    num = (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast("double")
    term = (num * num) / (
        (F.col("r") * F.col("c") * F.col("n")).cast("double")
    )
    # identical IEEE divisions on both engines produce identical term
    # doubles; summing DOUBLES would reintroduce order dependence, so
    # each term routes through DECIMAL(38,12) (deterministic rounding
    # of an identical input) and the SUM is exact decimal arithmetic
    term_dec = term.cast("decimal(38,12)")
    rc_over_n = (
        (F.col("r") * F.col("c")).cast("double") / F.col("n").cast("double")
    ).cast("decimal(38,12)")
    return (
        cells.join(F.broadcast(rows), "lang")
        .join(F.broadcast(cols), "source")
        .crossJoin(F.broadcast(n))
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.round(
                F.sum(term_dec)
                + F.max(F.col("n")).cast("decimal(38,12)")
                - F.sum(rc_over_n),
                6,
            )
            .cast("double")
            .alias("chi_square"),
        )
    )


_CHI_SQUARE_SQL = """
WITH cells AS (SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
r AS (SELECT lang, sum(o) AS r FROM cells GROUP BY 1),
c AS (SELECT source, sum(o) AS c FROM cells GROUP BY 1),
n AS (SELECT sum(o) AS n FROM cells)
SELECT CAST(count(*) AS BIGINT) AS n_cells,
       CAST(round(sum(CAST(
                 CAST(o * n - r * c AS DOUBLE) * CAST(o * n - r * c AS DOUBLE)
                 / CAST(r * c * n AS DOUBLE) AS DECIMAL(38,12)))
                 + CAST(max(n) AS DECIMAL(38,12))
                 - sum(CAST(CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE)
                            AS DECIMAL(38,12))), 6)
            AS DOUBLE) AS chi_square
FROM cells JOIN r USING (lang) JOIN c USING (source) CROSS JOIN n
"""


QUERIES: dict[str, QuerySpec] = {
    "quality_filter_cascade": QuerySpec(_quality_filter_cascade, _CASCADE_SQL),
    "chi_square_lang_source": QuerySpec(_chi_square_lang_source, _CHI_SQUARE_SQL),
    "quality_model_score": QuerySpec(_model_quality_score, _MODEL_SCORE_SQL),
    "training_shard_manifest": QuerySpec(_training_shard_manifest, _SHARD_MANIFEST_SQL),
    "doc_commonness_score": QuerySpec(_doc_commonness_score, _COMMONNESS_SQL),
}
