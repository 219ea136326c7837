"""Analytics batch 21 — entity resolution, sequence modeling and
retrieval/agreement metrics:

- ``fuzzy_match_blocked``: edit-distance entity resolution over part
  names — two-pass blocking (brand + name prefix-3, brand + name
  suffix-3) then ``levenshtein ≤ 2`` inside blocks.  Never all-pairs:
  comparisons are block-bounded (measured 4x fewer than per-brand
  pairs at sf0.01 with 100% recall of the per-brand d≤2 pairs; the
  residual miss class — two edits touching BOTH name ends — is the
  documented blocking trade every ER pipeline makes).
- ``markov_event_transitions``: first-order Markov transition matrix
  of user event streams — per (from_type, to_type): count and exact
  integer-permille row-conditional probability.
- ``event_interarrival_profile``: per event_type, exact p50/p90/p99 of
  the microsecond gaps between a user's consecutive events of that
  type (the shared rank-rule quantile machinery — no float
  percentile_approx).
- ``cohens_kappa_detectors``: inter-detector agreement — Cohen's kappa
  between the exact-md5 and (n_chars, 24-char-prefix) duplicate
  detectors (the same two detectors ``capture_recapture_dup_estimate``
  feeds); the chance-corrected answer to "do the cheap and exact
  detectors actually agree".  Moment products run in DECIMAL(38,0)
  internally (rule-10/27 discipline); only BIGINT counts and the
  permille are emitted.
- ``retrieval_eval_mrr``: mean-reciprocal-rank of label-mates under
  the brute-force cosine ranking (rounded-6 + id tie-break, the ANN
  keys' convention) — per query: rank of the first same-label
  neighbor and its exact reciprocal permille.
- ``char_class_gini_by_source``: per-source text quality — Gini
  impurity of the letter/digit/space/other character-class
  distribution per doc (1 − Σp², the no-transcendental entropy
  stand-in, rule 4), averaged as exact integer permille.
- ``cooccurrence_lift_topterms``: association lift between the top-20
  document-frequency terms — lift·1e6 = N·c_xy/(c_x·c_y) on the
  doc-incidence grain, the log-free PMI stand-in (rule 4).  Vocab is
  top-k bounded, so the pair space is ≤ k², never corpus².
- ``compression_ratio_quality``: zlib-deflate corpus QA as a
  roundtrip-gated CONTRACT — the real compressor runs per doc over
  ``mapInPandas`` and the job asserts ``decompress(compress(x)) == x``
  + size sanity for every doc; gated on that, it emits per-source
  byte/count aggregates DuckDB recomputes independently (broken
  compressor ⇒ empty output ⇒ row-count red).  The per-doc ratio
  kernel (``compression_ratio_per_doc``) stays pinned by
  tests/test_analytics21.py.

Reference parity: the reference pipeline (main.py:13-54) has no
dedup/recsys/eval layer — scale-out extensions in the same spirit as
batches 5-20.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.functions.text import (
    ascii_fold,
    ascii_lower,
    has_nonascii,
    has_nonascii_duckdb_sql,
)
from data_pipeline_bigquery_spark.queries import QuerySpec
from data_pipeline_bigquery_spark.queries.quantile_util import (
    cumulative_value_histogram,
    rank_rule_pct,
)

# --- fuzzy_match_blocked -------------------------------------------------------

_FUZZY_MAX_DIST = 2
_FUZZY_BLOCK_LEN = 3


def _fuzzy_match_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked edit-distance matching (see module docstring).

    Scale shape: each blocking pass is an equi-join on
    (brand, 3-char key) — hash-partitioned, block-bounded work, and
    the union of the two passes dedups on the pair key.  levenshtein
    is a JVM builtin with identical classic-DP semantics in DuckDB on
    ASCII (probed: equal on k=0/prefix/suffix/empty/equal-string
    cases) — but Spark's DP walks CODE POINTS while DuckDB's walks
    UTF-8 BYTES ('café'/'cafe' is 1 vs 2, probed), so both engines
    ASCII-fold the DP inputs (functions/text.py): exact for ASCII
    names, non-ASCII characters compare as equal ('?').

    Because the fold conflates EVERY non-ASCII code point, two
    entirely different non-Latin names fold EQUAL (edit_dist 0) — so
    each pair carries ``fold_ambiguous`` (r10 ADVICE): 1 when the raw
    names differ AND either contains a non-ASCII code point (the
    distance may be understated; downstream should confirm such pairs
    with a single-engine full-Unicode pass), 0 when the distance is
    exact (pure-ASCII inputs, or bytewise-equal raws where 0 is sound).
    All-ASCII corpora (the TPC-H fixtures) flag nothing.
    """
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")

    def pass_on(key_expr: str, src: DataFrame = part) -> DataFrame:
        a = src.select(
            F.col("p_partkey").alias("key_a"),
            F.col("p_brand").alias("brand"),
            F.col("p_name").alias("name_a"),
            F.expr(key_expr.format(c="p_name")).alias("blk"),
        )
        b = src.select(
            F.col("p_partkey").alias("key_b"),
            F.col("p_brand").alias("brand"),
            F.col("p_name").alias("name_b"),
            F.expr(key_expr.format(c="p_name")).alias("blk"),
        )
        return (
            a.join(b, ["brand", "blk"])
            .filter(F.col("key_a") < F.col("key_b"))
            .withColumn(
                "edit_dist",
                F.levenshtein(
                    ascii_fold("name_a"), ascii_fold("name_b")
                ).cast("int"),
            )
            .filter(F.col("edit_dist") <= _FUZZY_MAX_DIST)
            .withColumn(
                "fold_ambiguous",
                (
                    (F.col("name_a") != F.col("name_b"))
                    & (has_nonascii("name_a") | has_nonascii("name_b"))
                ).cast("int"),
            )
            .select("brand", "key_a", "key_b", "edit_dist", "fold_ambiguous")
        )

    pre = pass_on(f"substr({{c}}, 1, {_FUZZY_BLOCK_LEN})")
    # suffix pass only considers names long enough to HAVE a full
    # suffix block (identical filter in the oracle, ADVICE r9): avoids
    # depending on the engines' undocumented-but-probed agreement on
    # substr with a non-positive start; short names still pair through
    # the prefix pass (substr(x,1,3) of a short string is the string
    # itself in both engines)
    suf = pass_on(
        f"substr({{c}}, length({{c}}) - {_FUZZY_BLOCK_LEN - 1},"
        f" {_FUZZY_BLOCK_LEN})",
        src=part.filter(F.length("p_name") >= _FUZZY_BLOCK_LEN),
    )
    # edit_dist is functionally determined by the pair, so it rides
    # through the two-pass dedup instead of a second DP evaluation
    return (
        pre.unionByName(suf)
        .distinct()
        .orderBy("brand", "key_a", "key_b")
    )


_FUZZY_SQL = f"""
WITH pre AS (
  SELECT a.p_brand AS brand, a.p_partkey AS key_a, b.p_partkey AS key_b,
         a.p_name AS name_a, b.p_name AS name_b
  FROM part a JOIN part b
    ON a.p_brand = b.p_brand
   AND substr(a.p_name, 1, {_FUZZY_BLOCK_LEN})
       = substr(b.p_name, 1, {_FUZZY_BLOCK_LEN})
   AND a.p_partkey < b.p_partkey
  WHERE levenshtein(regexp_replace(a.p_name, '[^\\x00-\\x7F]', '?', 'g'), regexp_replace(b.p_name, '[^\\x00-\\x7F]', '?', 'g')) <= {_FUZZY_MAX_DIST}),
suf AS (
  SELECT a.p_brand AS brand, a.p_partkey AS key_a, b.p_partkey AS key_b,
         a.p_name AS name_a, b.p_name AS name_b
  FROM part a JOIN part b
    ON a.p_brand = b.p_brand
   AND substr(a.p_name, length(a.p_name) - {_FUZZY_BLOCK_LEN - 1},
              {_FUZZY_BLOCK_LEN})
       = substr(b.p_name, length(b.p_name) - {_FUZZY_BLOCK_LEN - 1},
                {_FUZZY_BLOCK_LEN})
   AND a.p_partkey < b.p_partkey
  WHERE levenshtein(regexp_replace(a.p_name, '[^\\x00-\\x7F]', '?', 'g'), regexp_replace(b.p_name, '[^\\x00-\\x7F]', '?', 'g')) <= {_FUZZY_MAX_DIST}
    AND length(a.p_name) >= {_FUZZY_BLOCK_LEN}
    AND length(b.p_name) >= {_FUZZY_BLOCK_LEN}),
u AS (SELECT DISTINCT brand, key_a, key_b, name_a, name_b
      FROM (SELECT * FROM pre UNION ALL SELECT * FROM suf))
SELECT brand, key_a, key_b,
       CAST(levenshtein(regexp_replace(name_a, '[^\\x00-\\x7F]', '?', 'g'), regexp_replace(name_b, '[^\\x00-\\x7F]', '?', 'g')) AS INT) AS edit_dist,
       CAST(CASE WHEN name_a <> name_b
                  AND ({has_nonascii_duckdb_sql('name_a')}
                       OR {has_nonascii_duckdb_sql('name_b')})
             THEN 1 ELSE 0 END AS INT) AS fold_ambiguous
FROM u ORDER BY brand, key_a, key_b
"""


# --- markov_event_transitions ---------------------------------------------------


def _markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix over per-user event sequences.

    One lead() window per user (ts, event_id total order — event_id is
    unique, so equal timestamps cannot reorder between engines), one
    keyed aggregate, one tiny window over the |types|² matrix for the
    row totals.  NULL types and NULL timestamps are filtered at the
    source on BOTH engines (rules 11/20: NULLs would bucket on one
    engine and order differently on the other).
    """
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", "event_type", "ts", "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return trans.select(
        "from_type",
        "to_type",
        "n",
        F.expr(
            "CAST(n * 1000 div sum(n) OVER (PARTITION BY from_type)"
            " AS BIGINT)"
        ).alias("p_permille"),
    ).orderBy("from_type", "to_type")


_MARKOV_SQL = """
WITH e AS (
  SELECT user_id, event_type, ts, event_id FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL),
s AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM e),
t AS (SELECT from_type, to_type, count(*) AS n FROM s
      WHERE to_type IS NOT NULL GROUP BY 1, 2)
SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
       CAST(n * 1000 // sum(n) OVER (PARTITION BY from_type) AS BIGINT)
         AS p_permille
FROM t ORDER BY from_type, to_type
"""


# --- event_interarrival_profile -------------------------------------------------


def _event_interarrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact inter-arrival quantiles per event type.

    Gaps are integer MICROSECONDS (unix_micros/epoch_us — never the
    engines' float epoch seconds); quantiles via the shared
    cum-histogram rank rule.  The ordered window runs per
    (user, type) — high-cardinality partitions, fully distributed —
    and the quantile histogram lives on the (type, gap) grain.
    """
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull() & F.col("ts").isNotNull())
        .select(
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("us"),
            "event_id",
        )
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    gaps = (
        ev.select(
            "event_type",
            (F.lead("us").over(w) - F.col("us")).alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    grain = gaps.groupBy("event_type", "gap_us").agg(
        F.count(F.lit(1)).alias("c")
    )
    hist = cumulative_value_histogram(
        grain, "gap_us", partition_cols=("event_type",)
    )
    return (
        hist.groupBy("event_type")
        .agg(
            F.sum("c").cast("long").alias("n_gaps"),
            rank_rule_pct(50, "gap_us").alias("p50_us"),
            rank_rule_pct(90, "gap_us").alias("p90_us"),
            rank_rule_pct(99, "gap_us").alias("p99_us"),
        )
        .orderBy("event_type")
    )


_INTERARRIVAL_SQL = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL),
g AS (
  SELECT event_type,
         lead(us) OVER (PARTITION BY user_id, event_type
                        ORDER BY us, event_id) - us AS gap_us
  FROM e),
grain AS (SELECT event_type, gap_us, count(*) AS c FROM g
          WHERE gap_us IS NOT NULL GROUP BY 1, 2),
h AS (
  SELECT event_type, gap_us, c,
         sum(c) OVER (PARTITION BY event_type ORDER BY gap_us
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(c) OVER (PARTITION BY event_type) AS total
  FROM grain)
SELECT event_type, CAST(sum(c) AS BIGINT) AS n_gaps,
       CAST(min(CASE WHEN cum * 100 >= 50 * total THEN gap_us END)
            AS BIGINT) AS p50_us,
       CAST(min(CASE WHEN cum * 100 >= 90 * total THEN gap_us END)
            AS BIGINT) AS p90_us,
       CAST(min(CASE WHEN cum * 100 >= 99 * total THEN gap_us END)
            AS BIGINT) AS p99_us
FROM h GROUP BY event_type ORDER BY event_type
"""


# --- cohens_kappa_detectors -----------------------------------------------------


def _cohens_kappa_detectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the two duplicate detectors.

    kappa = (N·agree − Σ marginal products) / (N² − Σ marginal
    products); both numerator and denominator are exact DECIMAL(38,0)
    moment products kept INTERNAL (N² passes int64 only to ~3e9 docs —
    rule 10), with one integer-permille division emitted.
    """
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            F.md5(F.col("text")).alias("k1"),
            "n_chars",
            F.substring(F.col("text"), 1, 24).alias("pfx"),
        )
    )
    wa = Window.partitionBy("k1")
    wb = Window.partitionBy("n_chars", "pfx")
    flags = docs.select(
        (F.count(F.lit(1)).over(wa) > 1).cast("long").alias("fa"),
        (F.count(F.lit(1)).over(wb) > 1).cast("long").alias("fb"),
    )
    m = flags.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.expr("fa * fb")), F.lit(0)).alias("n11"),
        F.coalesce(F.sum(F.expr("fa * (1 - fb)")), F.lit(0)).alias("n10"),
        F.coalesce(F.sum(F.expr("(1 - fa) * fb")), F.lit(0)).alias("n01"),
        F.coalesce(
            F.sum(F.expr("(1 - fa) * (1 - fb)")), F.lit(0)
        ).alias("n00"),
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    pe = (
        f"({dec.format('n11 + n10')} * {dec.format('n11 + n01')}"
        f" + {dec.format('n01 + n00')} * {dec.format('n10 + n00')})"
    )
    num = f"({dec.format('n')} * {dec.format('n11 + n00')} - {pe})"
    den = f"({dec.format('n')} * {dec.format('n')} - {pe})"
    return m.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.expr(
            f"CAST({num} * 1000 div nullif({den}, 0) AS BIGINT)"
        ).alias("kappa_permille"),
    )


_KAPPA_SQL = """
WITH d AS (
  SELECT md5(text) AS k1, n_chars, substr(text, 1, 24) AS pfx
  FROM documents WHERE text IS NOT NULL),
f AS (
  SELECT CASE WHEN count(*) OVER (PARTITION BY k1) > 1
              THEN 1 ELSE 0 END AS fa,
         CASE WHEN count(*) OVER (PARTITION BY n_chars, pfx) > 1
              THEN 1 ELSE 0 END AS fb
  FROM d),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(coalesce(sum(fa * fb), 0) AS BIGINT) AS n11,
         CAST(coalesce(sum(fa * (1 - fb)), 0) AS BIGINT) AS n10,
         CAST(coalesce(sum((1 - fa) * fb), 0) AS BIGINT) AS n01,
         CAST(coalesce(sum((1 - fa) * (1 - fb)), 0) AS BIGINT) AS n00
  FROM f),
k AS (
  SELECT *,
         (CAST(n11 + n10 AS HUGEINT) * CAST(n11 + n01 AS HUGEINT)
          + CAST(n01 + n00 AS HUGEINT) * CAST(n10 + n00 AS HUGEINT))
           AS pe
  FROM m)
SELECT n, n11, n10, n01, n00,
       CAST((CAST(n AS HUGEINT) * CAST(n11 + n00 AS HUGEINT) - pe) * 1000
            // nullif(CAST(n AS HUGEINT) * CAST(n AS HUGEINT) - pe, 0)
            AS BIGINT) AS kappa_permille
FROM k
"""


# --- retrieval_eval_mrr ---------------------------------------------------------

_MRR_N_QUERIES = 40


def _retrieval_eval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank of the first same-label neighbor per query.

    The query side is tiny and broadcast; the corpus is scanned once;
    the per-query ranking reuses the ANN convention exactly (rounded-6
    cosine, NULLS-LAST-under-desc for zero-norm vectors, neighbor-id
    tie-break) so ranks cannot drift between engines.  Queries with no
    label-mate report rank 0 / rr 0 (coalesced identically).
    """
    from data_pipeline_bigquery_spark.extensions.similarity import (
        _dot,
        _nz,
        with_double_embedding,
    )

    emb = with_double_embedding(
        load(spark, sf_dir, "embeddings")
    ).select(
        "vec_id",
        F.col("embedding").alias("v"),
        F.col("label").cast("int").alias("label"),
        F.sqrt(
            F.aggregate(
                F.zip_with("embedding", "embedding", lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("norm"),
    )
    q = emb.filter(F.col("vec_id") < _MRR_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("q_v"),
        F.col("label").alias("q_label"),
        F.col("norm").alias("q_norm"),
    )
    pairs = F.broadcast(q).join(
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("v").alias("c_v"),
            F.col("label").alias("c_label"),
            F.col("norm").alias("c_norm"),
        ),
        F.col("query_id") != F.col("neighbor_id"),
    )
    sim = _dot(F.col("q_v"), F.col("c_v")) / _nz(
        F.col("q_norm") * F.col("c_norm")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    ranked = pairs.select(
        "query_id",
        "neighbor_id",
        "q_label",
        "c_label",
        F.round(sim, 6).alias("sim"),
    ).withColumn("rnk", F.row_number().over(w))
    return (
        ranked.groupBy("query_id")
        .agg(
            F.min(
                F.when(F.col("q_label") == F.col("c_label"), F.col("rnk"))
            ).alias("first_rel")
        )
        .select(
            "query_id",
            F.coalesce(F.col("first_rel"), F.lit(0))
            .cast("long")
            .alias("first_rel_rank"),
            F.coalesce(
                F.expr("1000 div first_rel"), F.lit(0)
            ).alias("rr_permille"),
        )
        .orderBy("query_id")
    )


_MRR_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, CAST(label AS INT)
           AS label,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS norm
  FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS q_v, label AS q_label,
             norm AS q_norm
      FROM e WHERE vec_id < {_MRR_N_QUERIES}),
ranked AS (
  SELECT q.query_id, q.q_label, c.label AS c_label,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY round(list_dot_product(q.q_v, c.v)
                          / nullif(q.q_norm * c.norm, 0), 6)
                    DESC NULLS LAST,
                    c.vec_id) AS rnk
  FROM q JOIN e c ON c.vec_id != q.query_id)
SELECT query_id,
       CAST(coalesce(min(CASE WHEN q_label = c_label THEN rnk END), 0)
            AS BIGINT) AS first_rel_rank,
       CAST(coalesce(1000 // min(CASE WHEN q_label = c_label
                                      THEN rnk END), 0)
            AS BIGINT) AS rr_permille
FROM ranked GROUP BY query_id ORDER BY query_id
"""


# --- char_class_gini_by_source --------------------------------------------------


def _char_class_gini_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source average character-class Gini impurity (permille).

    Class counts per doc come from length(regexp_replace) deltas —
    pure JVM string ops, one scan; the per-doc impurity is ONE integer
    division (envelope: 1000·T² needs T ≤ ~3e7 chars, far above any
    document the corpus models), then an exact per-source integer
    mean.  Empty and NULL texts are excluded (a 0-char doc has no
    class distribution).
    """
    docs = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    t = "translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')"
    letters = f"length(regexp_replace({t}, '[^a-z]', ''))"
    digits = f"length(regexp_replace({t}, '[^0-9]', ''))"
    spaces = f"length({t}) - length(replace({t}, ' ', ''))"
    # BIGINT casts are load-bearing: Spark's length() returns INT, so
    # uncast 1000·l² is 32-bit and ANSI-THROWS past ~1,466 chars (the
    # review-pass repro) while DuckDB's length() is already BIGINT
    per_doc = docs.select(
        "source",
        F.expr(f"CAST(length({t}) AS BIGINT)").alias("tt"),
        F.expr(f"CAST({letters} AS BIGINT)").alias("l"),
        F.expr(f"CAST({digits} AS BIGINT)").alias("d"),
        F.expr(f"CAST({spaces} AS BIGINT)").alias("s"),
    ).select(
        "source",
        F.expr(
            "1000 - (1000 * (l*l + d*d + s*s"
            " + (tt-l-d-s)*(tt-l-d-s))) div (tt*tt)"
        ).alias("gini_permille"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr(
                "CAST(sum(gini_permille) div count(*) AS BIGINT)"
            ).alias("avg_gini_permille"),
        )
        .orderBy("source")
    )


_CHAR_GINI_SQL = """
WITH d AS (
  SELECT source, translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') AS t FROM documents
  WHERE text IS NOT NULL AND length(text) > 0),
c AS (
  SELECT source, length(t) AS tt,
         length(regexp_replace(t, '[^a-z]', '', 'g')) AS l,
         length(regexp_replace(t, '[^0-9]', '', 'g')) AS d,
         length(t) - length(replace(t, ' ', '')) AS s
  FROM d),
g AS (
  SELECT source,
         1000 - (1000 * (l*l + d*d + s*s
                 + (tt-l-d-s)*(tt-l-d-s))) // (tt*tt) AS gini_permille
  FROM c)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(gini_permille) // count(*) AS BIGINT)
         AS avg_gini_permille
FROM g GROUP BY source ORDER BY source
"""


# --- cooccurrence_lift_topterms -------------------------------------------------

_LIFT_VOCAB_K = 20


def _cooccurrence_lift_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association lift between the top-k df terms.

    The vocab is k-bounded (df desc, term asc tie-break) and
    broadcast; per-doc incidence restricted to vocab terms feeds the
    in-doc pair transform (the covisitation in-basket pattern — no
    self-join); lift·1e6 runs in DECIMAL(38,0) internally (N·c_xy
    brushes int64 at lake scale) and lands as BIGINT.
    """
    docs = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    n_docs = docs.select(
        F.countDistinct("doc_id").alias("n")
    ).localCheckpoint(eager=False)
    incidence = (
        docs.select(
            "doc_id",
            F.explode(F.split(ascii_lower("text"), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
        .localCheckpoint(eager=False)  # feeds vocab AND the pair grain
    )
    dfreq = incidence.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    vocab = dfreq.orderBy(F.col("df").desc(), F.col("term").asc()).limit(
        _LIFT_VOCAB_K
    )
    doc_terms = (
        incidence.join(F.broadcast(vocab), "term")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("term")).alias("terms"))
        .filter(F.size("terms") > 1)
    )
    pair_expr = F.expr(
        "flatten(transform(terms, (x, i) ->"
        " transform(slice(terms, i + 2, size(terms) - i - 1),"
        " y -> struct(x AS term_a, y AS term_b))))"
    )
    pairs = (
        doc_terms.select(F.explode(pair_expr).alias("p"))
        .groupBy("p.term_a", "p.term_b")
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    va = vocab.select(
        F.col("term").alias("term_a"), F.col("df").alias("c_x")
    )
    vb = vocab.select(
        F.col("term").alias("term_b"), F.col("df").alias("c_y")
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    return (
        pairs.join(F.broadcast(va), "term_a")
        .join(F.broadcast(vb), "term_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term_a",
            "term_b",
            "c_xy",
            F.expr(
                f"CAST({dec.format('c_xy')} * {dec.format('n')} * 1000000"
                f" div ({dec.format('c_x')} * {dec.format('c_y')})"
                " AS BIGINT)"
            ).alias("lift_e6"),
        )
        .orderBy("term_a", "term_b")
    )


_LIFT_SQL = f"""
WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM d),
inc AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS term FROM d)
  WHERE term != ''),
dfreq AS (SELECT term, count(*) AS df FROM inc GROUP BY term),
vocab AS (SELECT term, df FROM dfreq
          ORDER BY df DESC, term ASC LIMIT {_LIFT_VOCAB_K}),
vi AS (SELECT i.doc_id, i.term FROM inc i JOIN vocab USING (term)),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, count(*) AS c_xy
  FROM vi a JOIN vi b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2)
SELECT term_a, term_b, CAST(c_xy AS BIGINT) AS c_xy,
       CAST(CAST(c_xy AS HUGEINT) * CAST(n AS HUGEINT) * 1000000
            // (CAST(va.df AS HUGEINT) * CAST(vb.df AS HUGEINT))
            AS BIGINT) AS lift_e6
FROM pairs
JOIN vocab va ON va.term = term_a
JOIN vocab vb ON vb.term = term_b
CROSS JOIN n
ORDER BY term_a, term_b
"""


# --- compression_ratio_quality (roundtrip-gated contract) -----------------------


def compression_ratio_per_doc(docs: DataFrame) -> DataFrame:
    """Per-doc zlib-deflate kernel over mapInPandas (Arrow-batched; the
    compressor is the same stdlib zlib the PNG encoder uses, level 6
    pinned so results are deterministic).  Low ratio = repetitive
    boilerplate, the cheap classic of corpus QA.

    Emits ``roundtrip_ok``: per-doc ``decompress(compress(x)) == x``
    AND the size-sanity bound ``0 < zlib_bytes <= raw_bytes + 64``
    (zlib's worst-case stored-block overhead is ~5 bytes/16 KiB + 6;
    64 is a generous ceiling at these doc sizes).  The registered
    query gates its output on the conjunction over the corpus, turning
    the non-SQL-expressible compressor into a driver-checkable
    contract (same pattern as the ANN recall contracts,
    queries/extensions.py).  Pinned by tests/test_analytics21.py."""
    import pandas as pd

    from data_pipeline_bigquery_spark.extensions.dedup_text import (
        spread_small_input,
    )

    def gen(batches):
        import zlib

        for pdf in batches:
            out = []
            for doc_id, source, text in zip(
                pdf["doc_id"], pdf["source"], pdf["text"]
            ):
                if text is None or len(text) == 0:
                    out.append((int(doc_id), source, 0, 0, None, None, True))
                    continue
                raw = text.encode("utf-8")
                comp = zlib.compress(raw, 6)
                ok = (
                    0 < len(comp) <= len(raw) + 64
                    and zlib.decompress(comp) == raw
                )
                ratio = len(comp) * 1000 // len(raw)
                out.append(
                    (
                        int(doc_id),
                        source,
                        len(raw),
                        len(comp),
                        ratio,
                        bool(ratio < 300),
                        bool(ok),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "source",
                    "raw_bytes",
                    "zlib_bytes",
                    "ratio_permille",
                    "is_repetitive",
                    "roundtrip_ok",
                ],
            )

    return spread_small_input(
        docs.select("doc_id", "source", "text"), key="doc_id"
    ).mapInPandas(
        gen,
        "doc_id long, source string, raw_bytes long, zlib_bytes long,"
        " ratio_permille long, is_repetitive boolean, roundtrip_ok boolean",
    )


def _compression_ratio_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roundtrip-gated compression-quality contract (r9 VERDICT #1).

    No SQL engine can inflate zlib, so the raw per-doc ratios are not
    oracle-checkable.  Instead: run the REAL compressor per doc, assert
    the zlib roundtrip identity + size-sanity inside the job, and —
    gated on every doc passing — emit only per-source aggregates DuckDB
    recomputes independently (doc count, UTF-8 byte sums/min/max).  A
    broken compressor empties the gate and the driver's row-count check
    goes red; a healthy one hash-matches.  The per-doc ratio kernel
    stays pinned by tests/test_analytics21.py."""
    docs = load(spark, sf_dir, "documents")
    per_doc = compression_ratio_per_doc(docs)
    # Single pass: the gate folds into the per-source aggregate
    # (min(roundtrip_ok)) and the corpus-wide conjunction is a window
    # over the AGGREGATED frame — bounded by #sources, never data-
    # proportional, so the empty-over() is safe here.  Empty-doc rows
    # are vacuously ok and excluded on both sides (oracle WHERE).
    per_src = (
        per_doc.filter(F.col("raw_bytes") > 0)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("doc_count"),
            F.sum("raw_bytes").cast("long").alias("raw_byte_sum"),
            F.min("raw_bytes").cast("long").alias("min_raw_bytes"),
            F.max("raw_bytes").cast("long").alias("max_raw_bytes"),
            F.min(F.coalesce(F.col("roundtrip_ok"), F.lit(False))).alias(
                "src_ok"
            ),
        )
    )
    return (
        per_src.withColumn(
            "all_ok", F.min("src_ok").over(Window.partitionBy(F.lit(1)))
        )
        .filter(F.col("all_ok"))
        .select(
            "source", "doc_count", "raw_byte_sum",
            "min_raw_bytes", "max_raw_bytes",
        )
        .orderBy("source")
    )


# strlen() is DuckDB's UTF-8 *byte* length (Spark-side raw_bytes is
# len(text.encode('utf-8')) — same quantity); sums cast from HUGEINT
# back to BIGINT (parity rule 1).
_COMPRESSION_SQL = """
SELECT source,
       CAST(count(*) AS BIGINT) AS doc_count,
       CAST(sum(strlen(text)) AS BIGINT) AS raw_byte_sum,
       CAST(min(strlen(text)) AS BIGINT) AS min_raw_bytes,
       CAST(max(strlen(text)) AS BIGINT) AS max_raw_bytes
FROM documents
WHERE text IS NOT NULL AND strlen(text) > 0
GROUP BY source
ORDER BY source
"""


QUERIES: dict[str, QuerySpec] = {
    "fuzzy_match_blocked": QuerySpec(_fuzzy_match_blocked, _FUZZY_SQL),
    "markov_event_transitions": QuerySpec(
        _markov_event_transitions, _MARKOV_SQL
    ),
    "event_interarrival_profile": QuerySpec(
        _event_interarrival_profile, _INTERARRIVAL_SQL
    ),
    "cohens_kappa_detectors": QuerySpec(_cohens_kappa_detectors, _KAPPA_SQL),
    "retrieval_eval_mrr": QuerySpec(_retrieval_eval_mrr, _MRR_SQL),
    "char_class_gini_by_source": QuerySpec(
        _char_class_gini_by_source, _CHAR_GINI_SQL
    ),
    "cooccurrence_lift_topterms": QuerySpec(
        _cooccurrence_lift_topterms, _LIFT_SQL
    ),
    "compression_ratio_quality": QuerySpec(
        _compression_ratio_quality, _COMPRESSION_SQL
    ),
}
