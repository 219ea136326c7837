"""Corpus-curation operators: PII redaction, repetition filtering,
per-source caps, sequence packing.

The quality-filter half of a pretraining pipeline (the dedup half lives
in ``dedup_text.py``).  Every operator is a narrow map or a keyed
window/agg — nothing global, nothing driver-side — so each scales as a
scan plus at most one shuffle on a high-cardinality key:

- :func:`redact_pii` — per-row regex work, JVM-side (``regexp_replace``
  / ``regexp_count``), zero shuffles.
- :func:`repetition_stats` — Gopher/C4-style duplicate-n-gram fraction;
  one explode + one agg keyed on doc_id.
- :func:`cap_per_group` — keep at most N rows per group (domain/source
  caps against boilerplate farms); rank window keyed on the group.
- :func:`pack_sequences` — greedy context-window packing; cumulative
  window keyed on the shard column, because at 100 TB you pack within
  a shard (each packer instance owns a shard), never via a global
  cumulative sum.

Reference parity: none of these exist in llgx10/data_pipeline_bigquery
(its transforms are row-level casts/renames, SURVEY §2.10); they are
part of the scale-out training-data extension set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.functions.text import ascii_lower

# Deliberately RE2-safe, lowercase-input patterns — identical semantics
# in Spark (Java regex) and DuckDB (RE2): no backrefs, no lookaround.
EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
PHONE_RE = "\\+[0-9][0-9()\\- ]{7,}[0-9]"


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Count and strip emails/phone numbers from ``text_col``.

    Returns ``(doc_id, n_emails, n_phones, redacted_md5)`` — the digest
    of the redacted text proves byte-identical replacement without
    hauling full texts around.
    """
    t = ascii_lower(F.col(text_col))
    redacted = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "<email>"), PHONE_RE, "<phone>"
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Duplicate word-n-gram fraction per doc (1 - distinct/total).

    The Gopher-style repetition signal: templated/boilerplate pages
    repeat themselves; prose doesn't.  Total and distinct gram counts
    come from one explode + one agg keyed on doc_id.
    """
    # try_element_at + NULL-text filter: a <n-word doc indexes past its
    # token array (ANSI element_at THROWS where the oracle's list slice
    # clamps to a partial gram), and a NULL-text doc must yield NO
    # grams (the oracle's range(NULL) emits no rows) — the same two
    # degenerate-corpus traps fixed in dedup_text.word_ngrams
    parts = ", ".join(f"try_element_at(__w, i + {d})" for d in range(n))
    expr = (
        f"transform(sequence(1, greatest(size(__w) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', {parts}))"
    )
    # fold+split hoisted per ROW (see dedup_text.word_ngrams)
    grams = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            F.split(ascii_lower(F.col(text_col)), " ").alias("__w"),
        )
        .select("doc_id", F.explode(F.expr(expr)).alias("gram"))
    )
    return grams.groupBy("doc_id").agg(
        F.count("*").alias("total_grams"),
        F.countDistinct("gram").alias("distinct_grams"),
        F.round(1 - F.countDistinct("gram") / F.count("*"), 6).alias("dup_fraction"),
    )


def cap_per_group(
    df: DataFrame, group_col: str, order_exprs: list, n: int
) -> DataFrame:
    """Keep at most ``n`` rows per group, by an explicit deterministic
    order (pass a tie-breaking key last).  The anti-boilerplate cap:
    no single domain/source may dominate the corpus."""
    w = Window.partitionBy(group_col).orderBy(*order_exprs)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def pack_sequences(
    df: DataFrame,
    shard_col: str,
    id_col: str,
    tokens_col,
    ctx: int = 512,
) -> DataFrame:
    """Assign docs to context-window bins: within each shard, docs in
    ``id_col`` order fill bin ``floor(cum_tokens_before / ctx)``.

    Greedy first-fit packing as a pure window expression — the exact
    assignment every run, on any cluster.  Keyed on the shard column:
    the cumulative sum never crosses shard boundaries, so there is no
    global sequential dependency (the classic packing-parallelization
    trick).  Returns one row per doc with its bin.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return df.select(
        F.col(shard_col).alias("shard"),
        F.col(id_col).alias("doc_id"),
        tokens_col.cast("long").alias("n_tokens"),
        F.floor(cum_before / ctx).cast("long").alias("bin_id"),
    )


def model_quality_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1024,
    weights: DataFrame | None = None,
) -> DataFrame:
    """Linear quality model over hashed bag-of-words features — the
    fasttext-style classifier shape (hashing trick + weight vector +
    squash) that production pipelines run after the cheap rule filters.

    Plumbing is the point: tokens explode map-side, each token hashes to
    a feature id in ``[0, dim)`` (the md5-hex7 idiom shared with
    ``sampling.hash_bucket``), features join a ``dim``-row ``(fid, wt)``
    weight table — broadcast, it is KBs even at fasttext's 2M buckets —
    and one keyed agg produces the per-doc margin.  Swap ``weights``
    for a learned table and this IS the production scorer; the default
    is a frozen pseudo-random init derived from the same md5 idiom so
    an external oracle can rebuild it exactly.

    Numerics are drift-proof by construction: weights are integer
    millis (order-independent exact sum), the margin is ONE double
    division, and the squash is the rational ``0.5 + m/(2(1+|m|))`` —
    no transcendental calls, so engines agree bit for bit.
    """
    spark = df.sparkSession
    if weights is None:
        wt_m = (
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 7), 16, 10)
            .cast("long") % 2001 - 1000
        )
        weights = spark.range(dim).select(
            F.col("id").alias("fid"), wt_m.alias("wt_millis")
        )
    tok = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    fid = F.conv(F.substring(F.md5(F.col("tok")), 1, 7), 16, 10).cast("long") % dim
    agg = (
        tok.select(id_col, fid.alias("fid"))
        .join(F.broadcast(weights), "fid")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tok"), F.sum("wt_millis").alias("sw_millis"))
    )
    # a doc with no non-empty tokens must still score (neutral 0.5),
    # not vanish — downstream inner-joins would silently drop it
    scored = df.select(id_col).join(agg, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_tok"), F.lit(0)).alias("n_tok"),
        F.coalesce(F.col("sw_millis"), F.lit(0)).alias("sw_millis"),
    )
    margin = F.col("sw_millis").cast("double") / (
        F.greatest(F.col("n_tok"), F.lit(1)).cast("double") * 1000.0
    )
    return scored.select(
        id_col,
        "n_tok",
        "sw_millis",
        F.round(F.lit(0.5) + margin / (2.0 * (1.0 + F.abs(margin))), 6).alias(
            "model_score"
        ),
    )
