"""Analytics batch 12 — intermittent-demand forecasting and three
corpus-curation data products:

- ``croston_intermittent_forecast``: Croston's method per customer —
  the standard forecaster for SPARSE demand (most users purchase on
  few days): separate exponential smoothing of demand SIZES and of
  inter-demand INTERVALS, forecast rate = ẑ/p̂ per day.  Both EWMAs
  reuse ``ewma_event_value``'s exact dyadic closed form (α = ½,
  30-term truncation, int64 bit-shifts); because both carry the same
  2⁻³⁰ scale, the rate is ONE IEEE division of two exact BIGINTs —
  bit-identical across engines, no float accumulation anywhere.
- ``semantic_diversity_sample``: SemDeDup-style diversity
  downsampling — per nearest-centroid cell keep exactly the vector
  CLOSEST to its cell centroid (full (dist, vec_id) tie-break) plus
  the cell population, i.e. the representative manifest a curation
  run feeds to training while dropping semantic redundancy.  The
  assignment arithmetic is ``analytics5.assigned_label_cells`` /
  ``assigned_cells_ctes`` — ONE shared implementation with the
  confusion audit, so the two can never drift.
- ``dedup_signature_manifest``: the MinHash LSH band table
  (doc_id, band_idx, band_hash) exported as a join-ready artifact —
  cross-corpus dedup joins a FUTURE corpus's bands against this
  manifest instead of re-shingling the union (the incremental-dedup
  contract at lake scale).  Bands come from the same
  ``dedup_text`` constants and banding code as ``dedup_minhash_lsh``.
- ``source_overlap_matrix``: inter-source contamination diagnostic —
  for every source pair, how many DISTINCT 20-word chunks (the
  ``chunk_dedup_ratio`` grain) appear in both, and what share of the
  smaller source's chunk inventory that overlap is.  The matrix that
  tells you which feeds copy from each other before you mix them.

Reference parity: the reference pipeline (main.py:13-54) has no
forecasting or curation layer — scale-out extensions in the same
spirit as batches 5-11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.extensions.dedup_text import (
    banded_signatures,
    minhash_signatures_from_docs,
)
from data_pipeline_bigquery_spark.queries import QuerySpec
from data_pipeline_bigquery_spark.queries.analytics5 import (
    assigned_cells_ctes,
    assigned_label_cells,
)
from data_pipeline_bigquery_spark.queries.corpus_ops import (
    _CHUNK,
    _word_spans,
)


# --- croston_intermittent_forecast -------------------------------------------


def _shift_sum(arr: str) -> str:
    """Exact dyadic EWMA (α=½, ≤30 terms) of a BIGINT array as int64
    bit-shifts — ``Σ a_i · 2^(29 − L + i)`` (1-based i), the
    ``ewma_event_value`` closed form.  Callers divide two of these, so
    the shared 2⁻³⁰ scale cancels and no float ever accumulates."""
    return (
        f"aggregate(transform({arr}, (x, i) ->"
        f" x * shiftleft(CAST(1 AS BIGINT), 29 - size({arr}) + i + 1)),"
        " CAST(0 AS BIGINT), (acc, y) -> acc + y)"
    )


def demand_day_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered (day, cents) purchase arrays — the ONE exact
    demand-series preparation (floor-cents daily aggregate, zero days
    dropped, ordered collect) shared by ``croston_intermittent_forecast``
    and ``ewma_trend_forecast`` (analytics17); its oracle twin is
    :func:`demand_day_ctes`.  One exchange to the (user, day) grain,
    one groupBy to the user grain; arrays are calendar-bounded."""
    events = load(spark, sf_dir, "events")
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(
            F.coalesce(
                F.sum(
                    F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                ),
                F.lit(0),
            ).alias("cents")
        )
        .filter(F.col("cents") > 0)
    )
    return daily.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("d", "cents"))).alias("arr")
    )


def demand_day_ctes() -> str:
    """The ``daily``/``per_user`` CTE pair (cents + dates lists per
    user) — DuckDB twin of :func:`demand_day_arrays`."""
    return """daily AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         CAST(coalesce(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)), 0)
              AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2 HAVING cents > 0),
per_user AS (
  SELECT user_id,
         list(cents ORDER BY d) AS sizes,
         list(d ORDER BY d) AS dates
  FROM daily GROUP BY 1)"""


def _croston_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Croston demand-rate forecast from purchase days.

    Series preparation is the shared :func:`demand_day_arrays`; the
    whole computation is whole-stage codegen.
    """
    per_user = demand_day_arrays(spark, sf_dir)
    prepared = per_user.select(
        "user_id",
        F.size("arr").cast("long").alias("n_demands"),
        # last ≤30 demand sizes, oldest→newest
        F.expr(
            "slice(transform(arr, x -> x.cents),"
            " greatest(1, size(arr) - 29), 30)"
        ).alias("z_arr"),
        # last ≤30 inter-demand gaps in days (needs ≥2 demands)
        F.when(
            F.size("arr") >= 2,
            F.expr(
                "slice(transform(sequence(2, size(arr)), i ->"
                " CAST(datediff(element_at(arr, i).d,"
                "               element_at(arr, i - 1).d) AS BIGINT)),"
                " greatest(1, size(arr) - 30), 30)"
            ),
        ).alias("p_arr"),
    )
    return prepared.select(
        "user_id",
        "n_demands",
        F.expr(_shift_sum("z_arr")).alias("z30"),
        F.expr(_shift_sum("p_arr")).alias("p30"),
        (
            F.expr(_shift_sum("z_arr")).cast("double")
            / F.expr(_shift_sum("p_arr"))
        ).alias("croston_rate"),
    ).orderBy("user_id")


def shift_sum_sql(arr: str) -> str:
    """DuckDB twin of :func:`_shift_sum` — the ONE oracle-side
    generator of the exact dyadic-EWMA arithmetic (callers: the
    Croston oracle here and ``ewma_trend_forecast``'s in
    analytics17)."""
    return (
        f"CAST(list_sum([{arr}[i]"
        f" * (CAST(1 AS BIGINT) << (29 - len({arr}) + i))"
        f" for i in generate_series(1, len({arr}))]) AS BIGINT)"
    )


def _croston_sql() -> str:
    return f"""
WITH {demand_day_ctes()},
prepared AS (
  SELECT user_id,
         CAST(len(sizes) AS BIGINT) AS n_demands,
         sizes[greatest(1, len(sizes) - 29) : len(sizes)] AS z_arr,
         CASE WHEN len(dates) >= 2 THEN
           ([CAST(dates[i] - dates[i - 1] AS BIGINT)
             for i in generate_series(2, len(dates))]
            )[greatest(1, len(dates) - 1 - 29) : len(dates) - 1]
         END AS p_arr
  FROM per_user)
SELECT user_id, n_demands,
       {shift_sum_sql("z_arr")} AS z30,
       {shift_sum_sql("p_arr")} AS p30,
       CAST({shift_sum_sql("z_arr")} AS DOUBLE) / {shift_sum_sql("p_arr")}
         AS croston_rate
FROM prepared ORDER BY user_id
"""


# --- semantic_diversity_sample -----------------------------------------------


def _semantic_diversity_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One representative per nearest-centroid cell (argmin distance,
    vec_id tie-break) + cell population — one pass over the shared
    assignment (count and argmin from the same cell window)."""
    assigned = assigned_label_cells(spark, sf_dir)
    # rank on the EXACT DECIMAL numerator: within a cell every row
    # shares n_l, so dist_num orders identically to dist — but without
    # the double cast whose last ulp differs between engines (a near-
    # tie under one ulp would otherwise pick different representatives)
    w = Window.partitionBy("c_label").orderBy("dist_num", "vec_id")
    wc = Window.partitionBy("c_label")
    return (
        assigned.select("vec_id", "c_label", "dist_num")
        .withColumn("rk", F.row_number().over(w))
        .withColumn("n_in_cell", F.count(F.lit(1)).over(wc).cast("long"))
        .filter(F.col("rk") == 1)
        .select(
            F.col("c_label").alias("cell"),
            F.col("vec_id").alias("rep_vec_id"),
            "n_in_cell",
            # NO dist column: the DECIMAL(38,6)→DOUBLE conversion is
            # double-rounded in DuckDB (significand → double, then
            # ×10⁻⁶) and differs from Spark's BigDecimal.doubleValue
            # by an ulp at this ~1e12 magnitude — the argmin itself is
            # ulp-stable here (ties break on vec_id), but the VALUE is
            # not hashable cross-engine
        )
        .orderBy("cell")
    )


_DIVERSITY_SQL = f"""
WITH {assigned_cells_ctes()},
win AS (
  SELECT c_label, vec_id,
         row_number() OVER (PARTITION BY c_label
                            ORDER BY dist_num, vec_id) AS rk,
         count(*) OVER (PARTITION BY c_label) AS n_in_cell
  FROM assigned)
SELECT c_label AS cell, vec_id AS rep_vec_id,
       CAST(n_in_cell AS BIGINT) AS n_in_cell
FROM win WHERE rk = 1 ORDER BY cell
"""


# --- dedup_signature_manifest ------------------------------------------------


def _dedup_signature_manifest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(doc_id, band_idx, band_hash) over the RAW corpus — the
    persistable artifact cross-corpus incremental dedup joins against.
    One shingle scan, one signature groupBy, map-side banding."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = minhash_signatures_from_docs(docs, "doc_id", "text")
    return banded_signatures(sigs).orderBy("doc_id", "band_idx")


def _manifest_sql() -> str:
    """Oracle built by the SAME generator as the ``dedup_minhash_lsh``
    oracle (``extensions.minhash_lng_ctes``), pointed at the raw
    corpus — one oracle-side implementation of the band arithmetic,
    matching the one Spark-side implementation."""
    from data_pipeline_bigquery_spark.queries.extensions import (
        minhash_lng_ctes,
    )

    return f"""
WITH raw AS (SELECT doc_id, translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') AS t FROM documents),
{minhash_lng_ctes("raw")}
SELECT doc_id, band_idx, band_hash FROM lng ORDER BY doc_id, band_idx
"""


# --- source_overlap_matrix ---------------------------------------------------


def _source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct shared 20-word chunks per source pair + the share of
    the smaller source's inventory they represent.

    The (source, digest) grain is checkpointed — it feeds the totals,
    and both sides of the digest-keyed pair join; chunks shuffle as
    16-byte digests, never as text."""
    docs = load(spark, sf_dir, "documents").select(
        "source", F.split("text", " ").alias("words")
    )
    ch = (
        docs.select(
            "source", F.explode(_word_spans(_CHUNK)).alias("chunk")
        )
        .select("source", F.md5("chunk").alias("h"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    totals = ch.groupBy("source").agg(F.count(F.lit(1)).alias("n_chunks"))
    a, b = ch.alias("a"), ch.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        pairs.join(
            F.broadcast(
                totals.select(
                    F.col("source").alias("source_a"),
                    F.col("n_chunks").alias("n_a"),
                )
            ),
            "source_a",
        )
        .join(
            F.broadcast(
                totals.select(
                    F.col("source").alias("source_b"),
                    F.col("n_chunks").alias("n_b"),
                )
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            F.expr(
                "CAST(n_shared * 1000 div least(n_a, n_b) AS BIGINT)"
            ).alias("share_of_smaller_permille"),
        )
        .orderBy("source_a", "source_b")
    )


_OVERLAP_SQL = f"""
WITH w AS (SELECT source, string_split(text, ' ') AS words FROM documents),
ch AS (
  SELECT DISTINCT source,
         md5(unnest([array_to_string(
                 words[i*{_CHUNK}+1 : i*{_CHUNK}+{_CHUNK}], ' ')
             for i in generate_series(0,
                 CAST(ceil(len(words)/{_CHUNK}.0) AS BIGINT)-1)])) AS h
  FROM w),
totals AS (SELECT source, count(*) AS n_chunks FROM ch GROUP BY 1),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         count(*) AS n_shared
  FROM ch a JOIN ch b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2)
SELECT source_a, source_b, n_shared,
       ta.n_chunks AS n_a, tb.n_chunks AS n_b,
       CAST(n_shared * 1000 // least(ta.n_chunks, tb.n_chunks) AS BIGINT)
         AS share_of_smaller_permille
FROM pairs
JOIN totals ta ON pairs.source_a = ta.source
JOIN totals tb ON pairs.source_b = tb.source
ORDER BY source_a, source_b
"""


QUERIES: dict[str, QuerySpec] = {
    "croston_intermittent_forecast": QuerySpec(
        _croston_forecast, _croston_sql()
    ),
    "semantic_diversity_sample": QuerySpec(
        _semantic_diversity_sample, _DIVERSITY_SQL
    ),
    "dedup_signature_manifest": QuerySpec(
        _dedup_signature_manifest, _manifest_sql()
    ),
    "source_overlap_matrix": QuerySpec(
        _source_overlap_matrix, _OVERLAP_SQL
    ),
}
