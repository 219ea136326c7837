"""Corpus-level training-data ops: chunk-grain dedup and vocabulary
coverage.

Doc-grain exact/near dedup lives in `extensions/dedup_text.py`; the two
ops here work at finer grain, the way production corpus pipelines do
(C4 deduplicates three-sentence spans, MassiveText fixed-size chunks):

- `chunk_dedup_ratio`: split every document into fixed 20-word chunks,
  count how many of each document's chunks also appear elsewhere in the
  corpus.  The duplicate test joins on md5(chunk) so the shuffle moves
  16-byte digests, not chunk text — same scale posture as
  `dedup_exact`.
- `vocab_oov_rate`: corpus top-K vocabulary (total order: count desc,
  word asc) broadcast back over the exploded corpus for a per-document
  out-of-vocabulary rate — the cheap proxy for "will my tokenizer
  fragment this document".

Both produce integer counts plus one int/int double division (IEEE
division is correctly rounded → engine-portable)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.queries import QuerySpec

_CHUNK = 20
_VOCAB_K = 10


def _word_spans(width: int):
    """Fixed-``width``-word spans of a ``words`` array column, as an
    array expression (sequence → slice → array_join) — pure array
    functions, no UDF.  The ONE home for the span arithmetic shared by
    chunk dedup (20-word grain) and boilerplate removal (3-word)."""
    n = F.ceil(F.size("words") / F.lit(float(width))).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n - F.lit(1)),
        lambda i: F.array_join(F.slice("words", i * width + 1, width), " "),
    )


def _chunk_dedup_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicate-chunk statistics at 20-word grain.

    Global occurrence counts group on the md5 digest; the join back to
    per-document rows is digest-keyed, so both shuffles carry fixed
    16-byte keys regardless of chunk length."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("words")
    )
    chunks = docs.select(
        "doc_id",
        F.explode(_word_spans(_CHUNK)).alias("chunk"),
    ).select("doc_id", F.md5("chunk").alias("h"))
    occ = chunks.groupBy("h").agg(F.count(F.lit(1)).alias("occ"))
    per_doc = (
        chunks.join(occ, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("occ") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_chunks"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_chunks",
        "n_dup_chunks",
        (
            F.col("n_dup_chunks").cast("double")
            / F.col("n_chunks").cast("double")
        ).alias("dup_ratio"),
    )


_CHUNK_DEDUP_SQL = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
chunks AS (
  SELECT doc_id,
         md5(unnest([array_to_string(words[i*{_CHUNK}+1 : i*{_CHUNK}+{_CHUNK}], ' ')
                     for i in generate_series(0, CAST(ceil(len(words)/{_CHUNK}.0) AS BIGINT)-1)])) AS h
  FROM w),
occ AS (SELECT h, count(*) AS occ FROM chunks GROUP BY h),
per_doc AS (
  SELECT doc_id, count(*) AS n_chunks,
         sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS n_dup_chunks
  FROM chunks JOIN occ USING (h) GROUP BY doc_id)
SELECT doc_id, n_chunks, CAST(n_dup_chunks AS BIGINT) AS n_dup_chunks,
       CAST(n_dup_chunks AS DOUBLE) / CAST(n_chunks AS DOUBLE) AS dup_ratio
FROM per_doc
"""


def _vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document OOV rate against the corpus top-{K} vocabulary.

    The vocabulary is a post-aggregation artifact (≤ distinct-word
    count rows), so the global row_number window and the broadcast are
    both trivially small; the corpus itself is touched twice but only
    as exploded (doc_id, word) pairs — at 100 TB the second pass would
    reuse the first's shuffle output via an explicit checkpoint of the
    exploded view, which the fixture scale doesn't warrant."""
    words = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
    )
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    rank_w = Window.orderBy(F.col("cnt").desc(), F.col("w"))
    vocab = (
        wc.withColumn("r", F.row_number().over(rank_w))
        .filter(F.col("r") <= _VOCAB_K)
        .select("w", F.lit(True).alias("in_vocab"))
    )
    return (
        words.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_oov",
            (
                F.col("n_oov").cast("double") / F.col("n_words").cast("double")
            ).alias("oov_rate"),
        )
    )


_VOCAB_OOV_SQL = f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
vocab AS (
  SELECT w FROM (
    SELECT w, row_number() OVER (ORDER BY count(*) DESC, w) AS r
    FROM words GROUP BY w)
  WHERE r <= {_VOCAB_K}),
per_doc AS (
  SELECT d.doc_id, count(*) AS n_words,
         sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS n_oov
  FROM words d LEFT JOIN vocab v ON d.w = v.w
  GROUP BY d.doc_id)
SELECT doc_id, n_words, CAST(n_oov AS BIGINT) AS n_oov,
       CAST(n_oov AS DOUBLE) / CAST(n_words AS DOUBLE) AS oov_rate
FROM per_doc
"""


# boilerplate spans: 3-word grain (collisions actually occur in the
# fixture's ~30-word vocabulary), dropped when seen >= 2 times corpus-wide
_SPAN = 3
_BOILER_K = 2


def _boilerplate_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style global span removal — the TRANSFORM twin of
    `chunk_dedup_ratio`'s statistics: every fixed 3-word span
    (``_SPAN``) that appears twice or more anywhere in the corpus
    (``_BOILER_K``) is dropped
    from every document, and each document is reassembled from its
    surviving spans in order.

    Scale shape: span explode is map-side; the global occurrence count
    groups on md5(span) (16-byte keys); the reassembly groupBy is
    keyed on doc_id and carries only SURVIVING span text — for
    boilerplate-heavy corpora the rewrite shuffle is smaller than the
    input.  Documents whose every span is boilerplate still emit a row
    (n_kept = 0, empty text) — collect_list ignores the nulls the
    keep-condition leaves, so no doc is lost to the filter.  Output
    hashes the cleaned text (md5) to keep driver rows small."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("words")
    )
    spans = docs.select(
        "doc_id",
        F.posexplode(_word_spans(_SPAN)).alias("pos", "span"),
    )
    occ = spans.groupBy(F.md5("span").alias("h")).agg(F.count(F.lit(1)).alias("occ"))
    keep = F.col("occ") < _BOILER_K
    per_doc = (
        spans.withColumn("h", F.md5("span"))
        .join(occ, "h")
        .groupBy("doc_id")
        .agg(
            F.sum(keep.cast("int")).cast("bigint").alias("n_kept"),
            F.sum((~keep).cast("int")).cast("bigint").alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(keep, F.struct(F.col("pos"), F.col("span")))
                        )
                    ),
                    lambda s: s["span"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )
    return per_doc.select(
        "doc_id", "n_kept", "n_dropped", F.md5("clean_text").alias("clean_digest")
    )


_BOILER_SQL = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
spans AS (
  SELECT doc_id, u.i AS pos, u.c AS span
  FROM (
    SELECT doc_id,
           unnest([struct_pack(i := i,
                               c := array_to_string(words[i*{_SPAN}+1 : i*{_SPAN}+{_SPAN}], ' '))
                   for i in generate_series(0, CAST(ceil(len(words)/{_SPAN}.0) AS BIGINT)-1)]) AS u
    FROM w)),
occ AS (SELECT md5(span) AS h, count(*) AS occ FROM spans GROUP BY 1),
per_doc AS (
  SELECT doc_id,
         sum(CASE WHEN occ < {_BOILER_K} THEN 1 ELSE 0 END) AS n_kept,
         sum(CASE WHEN occ >= {_BOILER_K} THEN 1 ELSE 0 END) AS n_dropped,
         coalesce(string_agg(span, ' ' ORDER BY pos)
                    FILTER (WHERE occ < {_BOILER_K}), '') AS clean_text
  FROM spans JOIN occ ON occ.h = md5(span)
  GROUP BY doc_id)
SELECT doc_id, CAST(n_kept AS BIGINT) AS n_kept,
       CAST(n_dropped AS BIGINT) AS n_dropped,
       md5(clean_text) AS clean_digest
FROM per_doc
"""


_DRIFT_TOP = 15


def _corpus_drift_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus drift monitor: which terms shifted most between a
    baseline corpus and a candidate batch — the check a production
    pipeline runs on every new crawl delivery before letting it into
    the training mix (a crawler regression or a spam flood shows up
    here first).

    The two "corpora" are the stable md5-halves of the documents table
    (the same split machinery as ``train_test_split``, so the key is
    deterministic and self-contained).  Drift per term is integer-exact
    by cross-multiplication: ``|c_new·N_old − c_old·N_new|`` compares
    the frequencies ``c_new/N_new`` vs ``c_old/N_old`` without a
    division, so the ranking hash-matches across engines.  One word
    explode, one term-keyed agg, a broadcast 1-row totals join, and a
    TakeOrdered top-15 (``_DRIFT_TOP``) — linear, shuffle keyed on terms."""
    from data_pipeline_bigquery_spark.extensions.sampling import hash_bucket

    words = (
        load(spark, sf_dir, "documents")
        .select(
            (hash_bucket(F.col("doc_id")) < 50).alias("is_old"),
            F.explode(F.split(F.col("text"), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    counts = words.groupBy("term").agg(
        F.sum(F.col("is_old").cast("long")).alias("c_old"),
        F.sum((~F.col("is_old")).cast("long")).alias("c_new"),
    )
    totals = counts.agg(
        F.sum("c_old").alias("n_old"), F.sum("c_new").alias("n_new")
    )
    scored = counts.crossJoin(F.broadcast(totals)).select(
        "term",
        "c_old",
        "c_new",
        F.abs(
            F.col("c_new") * F.col("n_old") - F.col("c_old") * F.col("n_new")
        ).alias("drift_num"),
    )
    return scored.orderBy(F.col("drift_num").desc(), F.col("term")).limit(_DRIFT_TOP)


_DRIFT_SQL = f"""
WITH words AS (
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 100 < 50
           AS is_old,
         w AS term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''),
counts AS (
  SELECT term,
         sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS c_old,
         sum(CASE WHEN is_old THEN 0 ELSE 1 END) AS c_new
  FROM words GROUP BY term),
totals AS (SELECT sum(c_old) AS n_old, sum(c_new) AS n_new FROM counts)
SELECT term, CAST(c_old AS BIGINT) AS c_old, CAST(c_new AS BIGINT) AS c_new,
       CAST(abs(c_new * n_old - c_old * n_new) AS BIGINT) AS drift_num
FROM counts CROSS JOIN totals
ORDER BY drift_num DESC, term
LIMIT {_DRIFT_TOP}
"""


_BPE_TOP = 20
_BPE_EOW = "\x01"  # out-of-alphabet end-of-word sentinel (</w>)


def _bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first step of BPE tokenizer training, distributed: count
    adjacent character pairs across the word-frequency table and rank
    the merge candidates.  Real BPE iterates this (merge the top pair,
    recount); one exact iteration at corpus scale is the primitive the
    loop is made of, and the word-frequency pre-aggregation is the
    classic trick — pairs are counted per DISTINCT word weighted by its
    corpus frequency, so the explode is vocabulary-sized, not
    corpus-sized (a 100 TB corpus has a few-million-row vocabulary).

    Word-end is marked with the out-of-alphabet sentinel ``\\x01``
    (the </w> convention; a literal ``_`` would collide with
    snake_case tokens and merge end-of-word counts into mid-word
    pairs).  Output: top candidates by weighted count
    (count desc, pair asc — total order)."""
    words = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # adjacent char pairs of word + sentinel: positions 1..len(word)
    marked = words.select(
        F.concat(F.col("word"), F.lit(_BPE_EOW)).alias("w"), "freq"
    )
    pairs = marked.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "freq",
    )
    counted = pairs.groupBy("pair").agg(F.sum("freq").alias("weighted_count"))
    return counted.orderBy(
        F.col("weighted_count").desc(), F.col("pair")
    ).limit(_BPE_TOP)


_BPE_SQL = f"""
WITH words AS (
  SELECT w AS word, count(*) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY 1),
pairs AS (
  SELECT unnest([substr(word || chr(1), CAST(i AS INT), 2)
                 for i in generate_series(1, len(word))]) AS pair,
         freq
  FROM words)
SELECT pair, CAST(sum(freq) AS BIGINT) AS weighted_count
FROM pairs GROUP BY pair
ORDER BY weighted_count DESC, pair
LIMIT {_BPE_TOP}
"""


QUERIES: dict[str, QuerySpec] = {
    "chunk_dedup_ratio": QuerySpec(_chunk_dedup_ratio, _CHUNK_DEDUP_SQL),
    "vocab_oov_rate": QuerySpec(_vocab_oov_rate, _VOCAB_OOV_SQL),
    "boilerplate_span_removal": QuerySpec(_boilerplate_span_removal, _BOILER_SQL),
    "corpus_drift_topterms": QuerySpec(_corpus_drift_topterms, _DRIFT_SQL),
    "bpe_pair_stats": QuerySpec(_bpe_pair_stats, _BPE_SQL),
}
