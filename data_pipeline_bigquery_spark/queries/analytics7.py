"""Coverage batch 7: lake ingestion + warehouse/governance ops.

- ``binary_file_scan`` — the media-lake ingestion path: Spark's
  built-in ``binaryFile`` source over a directory of files
  (`sources/media.py`), glob-pruned at listing time.
- ``pit_dim_lookup`` — point-in-time SCD2 dimension lookup: the
  as-of join every warehouse with Type-2 dims runs on each fact load.
- ``multi_touch_attribution`` — position-based (U-shaped) revenue
  attribution, the successor of ``first_touch_attribution``.
- ``pii_pseudonymize`` — keyed sha-256 pseudonymization: the
  reversible-with-key governance twin of ``pii_redaction``'s
  destructive masking.

All DuckDB-oracled; each docstring carries the 100 TB plan argument.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.functions.text import ascii_lower
from data_pipeline_bigquery_spark.queries import QuerySpec
from data_pipeline_bigquery_spark.sources.media import (
    media_inventory,
    scan_media_dir,
    write_media_dir,
)

# --- binaryFile lake scan ----------------------------------------------------


def _media_fixture_dir(sf_dir: str) -> str:
    # pid-scoped like _snapshot_time_travel_cdc's fixture: a concurrent
    # session's rmtree must not race another session's lazy binaryFile
    # scan (r5 ADVICE)
    tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(
        tempfile.gettempdir(), f"spark_graft_media_{tag}_{os.getpid()}"
    )


def _binary_file_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-lake ingestion (`sources/media.py`): the corpus documents
    staged as one FILE each (``<doc_id>.txt`` for doc_id % 4 == 0,
    decoy ``.dat`` otherwise), then scanned back with Spark's built-in
    ``binaryFile`` source.  ``pathGlobFilter="*.txt"`` prunes the
    decoys at LISTING time — they are never opened — and file→task
    assignment rides ``spark.sql.files.maxPartitionBytes`` exactly
    like parquet, so the same scan distributes over a 100 TB media
    prefix.  Output is the per-file inventory (name→doc_id, byte
    size, content md5); the oracle rebuilds each payload from the
    ``documents`` table and must reproduce every digest, proving the
    file round-trip AND the binary scan are byte-faithful.

    The staging write is fixture scaffolding (a real lake already has
    the files) but still runs executor-side via ``foreachPartition``
    — no driver collect.
    """
    path = _media_fixture_dir(sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 4 == 0, ".txt").otherwise(".dat"),
        ).alias("file_name"),
        # coalesce: a NULL-text doc still stages a (header-only) file —
        # a NULL payload would crash the executor-side writer
        F.encode(
            F.concat(F.lit("DOC "), F.col("doc_id").cast("string"),
                     F.lit("\n"), F.coalesce(F.col("text"), F.lit(""))),
            "UTF-8",
        ).alias("payload"),
    )
    write_media_dir(docs, path, "file_name", "payload")
    inv = media_inventory(scan_media_dir(spark, path, glob="*.txt"))
    return inv.select(
        F.regexp_extract("file_name", r"^(\d+)\.txt$", 1)
        .cast("bigint")
        .alias("doc_id"),
        "n_bytes",
        "digest",
    )


_BINARY_FILE_SQL = """
SELECT doc_id,
       CAST(strlen('DOC ' || doc_id || chr(10) || coalesce(text, ''))
            AS BIGINT) AS n_bytes,
       md5('DOC ' || doc_id || chr(10) || coalesce(text, '')) AS digest
FROM documents WHERE doc_id % 4 = 0
"""


# --- REST as a first-class Python Data Source --------------------------------


def _rest_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The S1 REST scan re-expressed through Spark 4's Python Data
    Source API (`sources/rest_datasource.py`): the paginated endpoint
    registers as format ``restoffset`` and the ENGINE plans one input
    partition per page range — executors pull pages in parallel,
    each from its own transport, no driver-side page loop at all.
    The fixture stages the 25-row ``nation`` dim as JSON lines (the
    bounded-dim collect documented at `queries/coverage.py:35`) and
    the oracle is the same relation the cursor-paginated S1 scan
    proves — same answer through a third ingestion mechanism."""
    import os
    import tempfile

    from data_pipeline_bigquery_spark.sources.rest_datasource import (
        RestOffsetDataSource,
    )

    spark.dataSource.register(RestOffsetDataSource)
    nation = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_restds_{tag}_{os.getpid()}.jsonl"
    )
    with open(path, "w") as f:
        for r in nation.orderBy("n_nationkey").collect():
            f.write(
                '{"n_nationkey": %d, "n_name": "%s", "n_regionkey": %d}\n'
                % (r.n_nationkey, r.n_name, r.n_regionkey)
            )
    return (
        spark.read.format("restoffset")
        .schema("n_nationkey long, n_name string, n_regionkey long")
        .option("path", path)
        .option("page_size", "7")
        .option("pages_per_task", "2")
        .load()
    )


_REST_DS_SQL = "SELECT n_nationkey, n_name, n_regionkey FROM nation"


# --- point-in-time SCD2 dimension lookup -------------------------------------


def _pit_dim_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time Type-2 lookup: for each fact (orders of the
    SCD2-tracked customers) find the dimension version valid at a
    lookup instant 180 days after the order — the ``[valid_from,
    valid_to)`` containment join every warehouse with SCD2 dims runs
    on every fact load.

    Scale shape: the join is EQUI on the dimension key with the
    interval predicate as a residual filter, so it plans as a plain
    hash join whose per-key fan-out is bounded by versions-per-key
    (tiny) — never an unbounded range cross product.  Half-open
    interval semantics: ``valid_from <= ts < valid_to``, open-ended
    current rows match everything after their start."""
    from data_pipeline_bigquery_spark.queries.coverage3 import _scd2_history

    dim = _scd2_history(spark, sf_dir).select(
        F.col("o_custkey").alias("d_custkey"),
        F.col("o_orderstatus").alias("status_then"),
        "valid_from",
        "valid_to",
    )
    fact = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 10 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            F.expr("o_orderdate + INTERVAL 180 DAYS").alias("lookup_ts"),
        )
    )
    return fact.join(
        dim,
        (fact.o_custkey == dim.d_custkey)
        & (dim.valid_from <= fact.lookup_ts)
        & (dim.valid_to.isNull() | (dim.valid_to > fact.lookup_ts)),
    ).select("o_orderkey", "o_custkey", "lookup_ts", "status_then", "valid_from")


_PIT_SQL = """
WITH w AS (
  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
         lag(o_orderstatus) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS prev,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders WHERE o_custkey % 10 = 0),
kept AS (
  SELECT * FROM w WHERE rn = 1 OR prev IS DISTINCT FROM o_orderstatus),
dim AS (
  SELECT o_custkey AS d_custkey, o_orderstatus AS status_then,
         o_orderdate AS valid_from,
         lead(o_orderdate) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS valid_to
  FROM kept),
fact AS (
  SELECT o_orderkey, o_custkey,
         o_orderdate + INTERVAL 180 DAY AS lookup_ts
  FROM orders WHERE o_custkey % 10 = 0)
SELECT f.o_orderkey, f.o_custkey, f.lookup_ts, d.status_then, d.valid_from
FROM fact f JOIN dim d
  ON f.o_custkey = d.d_custkey
 AND d.valid_from <= f.lookup_ts
 AND (d.valid_to IS NULL OR d.valid_to > f.lookup_ts)
"""


# --- time-in-state from SCD2 intervals ---------------------------------------


def _status_dwell_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal algebra over the SCD2 output: how long does an entity
    DWELL in each state?  Closed ``[valid_from, valid_to)`` intervals
    aggregate to per-status interval counts, total days, and mean
    dwell — the time-in-state report every status-tracking warehouse
    derives from its Type-2 history (billing, SLA, funnel-stage age).

    Exact: interval lengths are integer day counts (``datediff`` on
    midnight-aligned timestamps), totals are int64 sums, the mean is
    ONE IEEE division.  Open (current) intervals are excluded — their
    dwell is right-censored, and mixing censored spans into a mean is
    the classic time-in-state reporting bug; they are counted
    separately as ``n_open`` instead.

    Scale: rides the SCD2 single-exchange plan, then one k-row
    aggregate."""
    from data_pipeline_bigquery_spark.queries.coverage3 import _scd2_history

    hist = _scd2_history(spark, sf_dir)
    return hist.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.when(F.col("valid_to").isNotNull(), 1)).alias("n_closed"),
        F.count(F.when(F.col("valid_to").isNull(), 1)).alias("n_open"),
        F.sum(
            F.when(
                F.col("valid_to").isNotNull(),
                F.datediff("valid_to", "valid_from").cast("bigint"),
            )
        ).alias("total_days"),
        (
            F.sum(
                F.when(
                    F.col("valid_to").isNotNull(),
                    F.datediff("valid_to", "valid_from").cast("bigint"),
                )
            ).cast("double")
            / F.count(F.when(F.col("valid_to").isNotNull(), 1)).cast("double")
        ).alias("avg_days"),
    )


_DWELL_SQL = """
WITH w AS (
  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
         lag(o_orderstatus) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS prev,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders WHERE o_custkey % 10 = 0),
kept AS (
  SELECT * FROM w WHERE rn = 1 OR prev IS DISTINCT FROM o_orderstatus),
hist AS (
  SELECT o_custkey, o_orderstatus, o_orderdate AS valid_from,
         lead(o_orderdate) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS valid_to
  FROM kept)
SELECT o_orderstatus AS status,
       CAST(count(CASE WHEN valid_to IS NOT NULL THEN 1 END) AS BIGINT)
         AS n_closed,
       CAST(count(CASE WHEN valid_to IS NULL THEN 1 END) AS BIGINT) AS n_open,
       CAST(sum(CASE WHEN valid_to IS NOT NULL
                     THEN date_diff('day', valid_from, valid_to) END)
            AS BIGINT) AS total_days,
       CAST(sum(CASE WHEN valid_to IS NOT NULL
                     THEN date_diff('day', valid_from, valid_to) END)
            AS DOUBLE)
       / CAST(count(CASE WHEN valid_to IS NOT NULL THEN 1 END) AS DOUBLE)
         AS avg_days
FROM hist GROUP BY 1
"""


# --- Wilson confidence bounds ------------------------------------------------


def wilson_bounds_sql(k: str = "k", n: str = "n") -> dict:
    """THE Wilson-interval expression texts (rate/lo/hi) over integer
    count columns ``k``/``n`` — one generator for every key that emits
    a 95% Wilson score interval, so the fixed-order IEEE chain (one
    sqrt, z frozen at 1.96) can never fork between keys or engines.
    Interpolate the SAME strings into the Spark plan and the oracle."""
    kd = f"CAST({k} AS DOUBLE)"
    nd = f"CAST({n} AS DOUBLE)"
    rate = f"{kd} / {nd}"
    core = (
        f"(({rate})\n"
        f"           + (1.96 * 1.96) / (2.0 * {nd})\n"
        f"         {{sign}} 1.96 * sqrt(\n"
        f"             (({rate})\n"
        f"              * (1.0 - {rate})\n"
        f"              + (1.96 * 1.96) / (4.0 * {nd})\n"
        f"             ) / {nd})\n"
        f"        ) / (1.0 + (1.96 * 1.96) / {nd})"
    )
    return {
        "rate": rate,
        "lo": core.format(sign="-"),
        "hi": core.format(sign="+"),
    }


def _wilson_conversion_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per hour-of-day purchase-share with a 95% Wilson score interval
    — the interval practitioners use because the naive Wald CI
    collapses at extreme rates and small n.  An A/B readout is a
    comparison of such intervals, so the engine must produce them
    deterministically: k and n are exact integers, and the Wilson
    algebra is a FIXED-ORDER chain of IEEE ops (one sqrt) written
    identically in the oracle — every double is bit-identical across
    engines, no rounding slop needed in the compare."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy(F.hour("ts").alias("hour_of_day")).agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("k"),
        F.count(F.lit(1)).alias("n"),
    )
    # fixed-order Wilson: z = 1.96, z2 = z*z; everything built from
    # (k, n) doubles with the same parenthesization as the SQL
    expr = """
      struct(
        CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
        ((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
           + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE))
         - 1.96 * sqrt(
             ((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
              * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
              + (1.96 * 1.96) / (4.0 * CAST(n AS DOUBLE))
             ) / CAST(n AS DOUBLE))
        ) / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)) AS lo,
        ((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
           + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE))
         + 1.96 * sqrt(
             ((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
              * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
              + (1.96 * 1.96) / (4.0 * CAST(n AS DOUBLE))
             ) / CAST(n AS DOUBLE))
        ) / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)) AS hi
      )
    """
    return agg.select(
        "hour_of_day", "k", "n",
        F.expr(expr + ".rate").alias("rate"),
        F.expr(expr + ".lo").alias("wilson_lo"),
        F.expr(expr + ".hi").alias("wilson_hi"),
    )


_WILSON_SQL = """
WITH agg AS (
  SELECT CAST(hour(ts) AS INT) AS hour_of_day,
         count(CASE WHEN event_type = 'purchase' THEN 1 END) AS k,
         count(*) AS n
  FROM events GROUP BY 1)
SELECT hour_of_day, CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
       CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
       ((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
          + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE))
        - 1.96 * sqrt(
            ((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
             * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
             + (1.96 * 1.96) / (4.0 * CAST(n AS DOUBLE))
            ) / CAST(n AS DOUBLE))
       ) / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)) AS wilson_lo,
       ((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
          + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE))
        + 1.96 * sqrt(
            ((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
             * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
             + (1.96 * 1.96) / (4.0 * CAST(n AS DOUBLE))
            ) / CAST(n AS DOUBLE))
       ) / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)) AS wilson_hi
FROM agg
"""


# --- position-based multi-touch attribution ----------------------------------


def _multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) attribution: each purchase's value is
    credited 40% to the user's FIRST touch before it, 40% to the LAST,
    and 20% split evenly across the middles (1 touch → 100%, 2 →
    50/50).  Completes ``first_touch_attribution`` with the model real
    marketing teams default to.

    Exactness policy: the weight is an IEEE double built from exact
    integer counts (0.2/(n−2) is one correctly-rounded division) and
    the credit ``value × weight`` one correctly-rounded product —
    bit-identical on every engine.  Each credit then FLOORS to
    integer micro-units before summing: a raw double→DECIMAL cast is
    the cross-engine rounding trap this batch measured twice (int8
    audit, EWMA), while floor of identical doubles plus int64 sums
    has no rounding anywhere; the one final /1e6 is a shared IEEE
    division.  Sub-microcent truncation (≤5e-7 per credit) is the
    documented quantization grain.

    Scale shape: the purchases×touches join is user-keyed; fan-out per
    user is purchases/user × touches/user — bounded by per-user
    activity, never corpus-quadratic.  The position window partitions
    on the purchase id (high cardinality, no skew)."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    touches = ev.filter(
        F.col("event_type").isin("view", "click", "signup")
    ).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("touch_type"),
    )
    joined = purchases.join(
        touches,
        (purchases.p_user == touches.t_user) & (touches.t_ts < purchases.p_ts),
    )
    w = Window.partitionBy("p_id").orderBy("t_ts", "t_id")
    n = F.count(F.lit(1)).over(Window.partitionBy("p_id"))
    rn = F.row_number().over(w)
    weight = (
        F.when(n == 1, F.lit(1.0))
        .when((n == 2) & rn.isin(1, 2), F.lit(0.5))
        .when(rn == 1, F.lit(0.4))
        .when(rn == n, F.lit(0.4))
        .otherwise(F.lit(0.2) / (n - F.lit(2)).cast("double"))
    )
    credit_micro = F.floor(
        F.col("p_value") * weight * F.lit(1e6) + F.lit(0.5)
    ).cast("long")
    return (
        joined.withColumn("credit_micro", credit_micro)
        .groupBy("touch_type")
        .agg(
            (
                F.sum("credit_micro").cast("double") / F.lit(1e6)
            ).alias("attributed_value"),
            F.count(F.lit(1)).alias("n_credits"),
        )
    )


_MTA_SQL = """
WITH p AS (
  SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts, value AS p_value
  FROM events WHERE event_type = 'purchase'),
t AS (
  SELECT user_id AS t_user, ts AS t_ts, event_id AS t_id,
         event_type AS touch_type
  FROM events WHERE event_type IN ('view', 'click', 'signup')),
j AS (
  SELECT p.p_id, p.p_value, t.touch_type,
         row_number() OVER (PARTITION BY p.p_id ORDER BY t.t_ts, t.t_id) AS rn,
         count(*) OVER (PARTITION BY p.p_id) AS n
  FROM p JOIN t ON p.p_user = t.t_user AND t.t_ts < p.p_ts),
c AS (
  SELECT touch_type,
         CAST(floor(p_value * (CASE WHEN n = 1 THEN 1.0::DOUBLE
                                    WHEN n = 2 THEN 0.5::DOUBLE
                                    WHEN rn = 1 OR rn = n THEN 0.4::DOUBLE
                                    ELSE 0.2::DOUBLE / CAST(n - 2 AS DOUBLE)
                               END) * 1e6 + 0.5) AS BIGINT) AS credit_micro
  FROM j)
SELECT touch_type,
       CAST(sum(credit_micro) AS DOUBLE) / 1e6 AS attributed_value,
       CAST(count(*) AS BIGINT) AS n_credits
FROM c GROUP BY touch_type
"""


# --- int8 embedding quantization audit ---------------------------------------


def _embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension symmetric int8 quantization of the embedding
    corpus — the 4× compression step a serving/ANN stack applies
    before shipping vectors — with the reconstruction-error audit
    that decides whether int8 is safe for the corpus.

    Two passes, the classic stats-then-encode shape: pass 1 reduces
    the exploded component stream to per-dim ``max|x|`` (map-side
    combine makes the shuffle O(tasks × dims)); the 32 scale rows
    broadcast back; pass 2 encodes ``code = clamp(floor(x/scale +
    0.5))`` and aggregates the error audit.  Engine-portable: scale
    is one IEEE division and code is floor of an IEEE chain
    (identical doubles both engines).  The error audit is made EXACT
    by quantizing each |err| to integer picounits with another
    deterministic floor — casting the raw double err² to DECIMAL
    rounds differently across engines (measured 1-ulp MSE drift), but
    integer fixed-point sums have no rounding at all; the mean is one
    final IEEE division."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.posexplode("embedding").alias("dim", "xf")
    ).select("vec_id", "dim", F.col("xf").cast("double").alias("x"))
    scales = emb.groupBy("dim").agg(
        (F.max(F.abs(F.col("x"))) / F.lit(127.0)).alias("scale")
    )
    # an all-zero (padded) dimension has scale 0: 0/0 = NaN would give
    # null codes on Spark and a cast error on DuckDB — divide by a safe
    # 1.0 instead (codes and errors are exactly 0 either way)
    divisor = F.when(F.col("scale") == 0, F.lit(1.0)).otherwise(F.col("scale"))
    coded = emb.join(F.broadcast(scales), "dim").select(
        "dim",
        "x",
        "scale",
        F.greatest(
            F.least(
                F.floor(F.col("x") / divisor + F.lit(0.5)),
                F.lit(127),
            ),
            F.lit(-127),
        )
        .cast("long")
        .alias("code"),
    )
    err = F.abs(F.col("x") - F.col("code").cast("double") * F.col("scale"))
    err_pico = F.floor(err * F.lit(1e12) + F.lit(0.5)).cast("long")
    # nano grain for the SQUARED sum: err_nano^2 sums stay below 2^53
    # up to ~1e9 rows/dim, so the final DECIMAL->DOUBLE cast is exact
    # on every engine (a pico^2 sum exceeds 2^53 and the cast rounding
    # then differs by an ulp across engines — measured)
    err_nano = F.floor(err * F.lit(1e9) + F.lit(0.5)).cast("long")
    return coded.groupBy("dim").agg(
        F.any_value("scale").alias("scale"),
        F.count(F.when(F.abs(F.col("code")) == 127, 1)).alias("n_saturated"),
        F.max(err_pico).alias("max_abs_err_pico"),
        (
            F.sum((err_nano * err_nano).cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mse_nano2"),
    )


_INT8_SQL = """
WITH ex AS (
  SELECT vec_id, t.dim - 1 AS dim, CAST(t.x AS DOUBLE) AS x
  FROM (SELECT vec_id,
               unnest([{'dim': i, 'x': embedding[i]}
                       for i in generate_series(1, len(embedding))]) AS t
        FROM embeddings)),
sc AS (SELECT dim, max(abs(x)) / 127.0 AS scale FROM ex GROUP BY dim),
coded AS (
  SELECT e.dim, e.x, s.scale,
         CAST(greatest(least(floor(e.x / (CASE WHEN s.scale = 0 THEN 1.0
                                          ELSE s.scale END) + 0.5),
                             127), -127)
              AS BIGINT) AS code
  FROM ex e JOIN sc s USING (dim)),
errs AS (
  SELECT dim, scale, code,
         CAST(floor(abs(x - CAST(code AS DOUBLE) * scale) * 1e12 + 0.5)
              AS BIGINT) AS err_pico,
         CAST(floor(abs(x - CAST(code AS DOUBLE) * scale) * 1e9 + 0.5)
              AS BIGINT) AS err_nano
  FROM coded)
SELECT dim, any_value(scale) AS scale,
       CAST(count(CASE WHEN abs(code) = 127 THEN 1 END) AS BIGINT)
         AS n_saturated,
       max(err_pico) AS max_abs_err_pico,
       CAST(sum(CAST(err_nano * err_nano AS DECIMAL(38,0))) AS DOUBLE)
       / CAST(count(*) AS DOUBLE) AS mse_nano2
FROM errs GROUP BY dim
"""


# --- cross-source quantile normalization -------------------------------------


def _length_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization across sources — the batch-effect
    correction a mixed-crawl corpus needs before per-source features
    are comparable: each (source, text_len) value maps to the GLOBAL
    length distribution's value at the same within-source quantile.

    Everything runs on the VALUE DOMAIN (distinct lengths), never the
    corpus: per-source cumulative histograms give max-rank r of m,
    the integer target rank is ``ceil(r·N/m) = (r·N + m − 1) div m``
    — pure int64, exact on both engines (decimal division would round
    at a fixed scale and can cross an integer boundary); int64-safe
    below ~3·10⁹ docs since r·N ≤ N², route through DECIMAL div
    beyond.  The mapped value is the smallest global length whose
    cumulative count reaches the target — a domain×domain range join
    between two BOUNDED histograms (broadcast, O(|dom|·|gdom|) pairs
    of domain rows, never corpus rows).  The only windows run at
    domain grain; the single-partition global cumsum carries
    distinct-length rows, not docs."""
    # NULL text has no length: excluded on BOTH engines — otherwise the
    # NULL text_len rows enter the rank windows, where Spark orders
    # NULLS FIRST and DuckDB NULLS LAST (rule 11; degenerate-corpus
    # sweep catch)
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("source", F.length("text").alias("text_len"))
    )
    dom = docs.groupBy("source", "text_len").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    wsrc = Window.partitionBy("source").orderBy("text_len")
    per_src = dom.withColumn(
        "r", F.sum("n_docs").over(wsrc)
    ).withColumn("m", F.sum("n_docs").over(Window.partitionBy("source")))
    gdom = (
        docs.groupBy("text_len")
        .agg(F.count(F.lit(1)).alias("gn"))
        .withColumn("gcum", F.sum("gn").over(Window.orderBy("text_len")))
    )
    n_total = docs.agg(F.count(F.lit(1)).alias("n_total"))
    with_target = per_src.crossJoin(F.broadcast(n_total)).withColumn(
        "target_rank", F.expr("(r * n_total + m - 1) div m")
    )
    mapped = (
        with_target.join(
            F.broadcast(gdom.select("text_len", "gcum").withColumnRenamed(
                "text_len", "g_len"
            )),
            F.col("gcum") >= F.col("target_rank"),
        )
        .groupBy("source", "text_len", "n_docs")
        .agg(F.min("g_len").alias("mapped_len"))
    )
    return mapped.select("source", "text_len", "n_docs", "mapped_len")


_QNORM_SQL = """
WITH d AS (SELECT source, length(text) AS text_len FROM documents
           WHERE text IS NOT NULL),
dom AS (SELECT source, text_len, count(*) AS n_docs
        FROM d GROUP BY 1, 2),
per_src AS (
  SELECT source, text_len, n_docs,
         sum(n_docs) OVER (PARTITION BY source ORDER BY text_len
                           ROWS UNBOUNDED PRECEDING) AS r,
         sum(n_docs) OVER (PARTITION BY source) AS m
  FROM dom),
gdom AS (
  SELECT text_len AS g_len, count(*) AS gn,
         sum(count(*)) OVER (ORDER BY text_len
                             ROWS UNBOUNDED PRECEDING) AS gcum
  FROM d GROUP BY text_len),
t AS (
  SELECT source, text_len, n_docs,
         (CAST(r AS BIGINT) * (SELECT count(*) FROM d)
          + CAST(m AS BIGINT) - 1) // CAST(m AS BIGINT) AS target_rank
  FROM per_src)
SELECT t.source, CAST(t.text_len AS BIGINT) AS text_len,
       CAST(t.n_docs AS BIGINT) AS n_docs,
       CAST(min(g.g_len) AS BIGINT) AS mapped_len
FROM t JOIN gdom g ON g.gcum >= t.target_rank
GROUP BY 1, 2, 3
"""


# --- keyed pseudonymization --------------------------------------------------

_PSEUDO_SALT = "tenant-key-2026"


def _pii_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed pseudonymization — the governance op `pii_redaction`
    doesn't cover: identities must be REMOVED from the analytical
    feed yet stay joinable across tables and re-identifiable by the
    key holder.  ``sha2(salt ‖ ':' ‖ user_id)`` gives a deterministic
    pseudonym: same user → same token everywhere (joins survive), no
    token inverts without the salt, rotating the salt re-keys the
    whole lake in one pass.  Pure codegen (one hash per row, no
    shuffle added); the analytical columns pass through untouched."""
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.sha2(
            F.concat(F.lit(_PSEUDO_SALT), F.lit(":"),
                     F.col("user_id").cast("string")),
            256,
        ).alias("user_token"),
        "event_type",
        "value",
    )


_PSEUDO_SQL = f"""
SELECT event_id,
       sha256('{_PSEUDO_SALT}' || ':' || CAST(user_id AS VARCHAR)) AS user_token,
       event_type, value
FROM events
"""


# --- native session_window aggregation ---------------------------------------


def _session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE ``session_window`` aggregate (the same operator
    its Structured Streaming session windows run on) over the event
    log: per-user 30-minute-gap sessions in one ``groupBy`` — no
    window functions, no self-join; the engine merges overlapping
    [ts, ts+gap) intervals inside the aggregation operator itself.

    Boundary semantics (probed, not assumed): an event exactly AT
    ``prev_ts + gap`` still MERGES (closed boundary), and the session
    end is ``last_ts + gap``.  The oracle is an independent
    formulation — lag/cumulative-sum gap sessionization with a
    strict ``>`` break — so a green row proves the two definitions
    coincide, closed boundary included.

    Scale: one exchange on user_id; the session merge is per-group
    state inside the agg, never a data-proportional window.  Value
    sums route through DECIMAL(38,12) (order-exact)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,12)"))
            .cast("double")
            .alias("session_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


_SESSION_WINDOW_SQL = """
WITH o AS (
  SELECT user_id, ts, value, event_id,
         lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev
  FROM events),
m AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN prev IS NULL OR ts > prev + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM o),
s AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM m)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE) AS session_value
FROM s GROUP BY user_id, sid
"""


# --- snapshot-store time travel ----------------------------------------------


def _snapshot_time_travel_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level change feed THROUGH the versioned snapshot store
    (`sources/snapshots.py`): two deterministic order states are
    committed as snapshot versions (data-first/marker-last protocol),
    read back BY VERSION (time travel), and diffed with
    ``snapshot_cdc`` — insert/delete/update rows with old/new values.
    Complements ``snapshot_diff_cdc`` (same change algebra, but that
    one aggregates counts from in-plan views; this one exercises the
    actual store round-trip at row grain).  The fixture states reuse
    the established splits: v2 deletes every 20th order, bumps every
    10th price, adds post-1998 orders."""
    from data_pipeline_bigquery_spark.sources.snapshots import (
        read_snapshot,
        snapshot_cdc,
        write_snapshot,
    )

    # pid-scoped dir: concurrent sessions get disjoint stores (a shared
    # path would let one session rmtree the versions another session's
    # lazy CDC frame is still reading); within a session the rmtree is
    # safe because runs are sequential
    base = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_snap_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{os.getpid()}",
    )
    shutil.rmtree(base, ignore_errors=True)
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("price_cents"),
        "o_orderdate",
    )
    cut = F.lit("1998-01-01").cast("timestamp")
    v1 = orders.filter(F.col("o_orderdate") < cut).select(
        "o_orderkey", "price_cents"
    )
    v2 = (
        orders.filter(F.col("o_orderkey") % 20 != 0)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 10 == 0, F.col("price_cents") + 100
            )
            .otherwise(F.col("price_cents"))
            .alias("price_cents"),
        )
    )
    write_snapshot(v1, base)
    write_snapshot(v2, base)
    return snapshot_cdc(
        read_snapshot(spark, base, 1),
        read_snapshot(spark, base, 2),
        ["o_orderkey"],
        ["price_cents"],
    )


_SNAP_CDC_SQL = """
WITH v1 AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'),
v2 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 0
              THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) + 100
              ELSE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) END
           AS price_cents
  FROM orders WHERE o_orderkey % 20 <> 0)
SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'insert'
            WHEN n.o_orderkey IS NULL THEN 'delete'
            WHEN o.price_cents IS DISTINCT FROM n.price_cents THEN 'update'
       END AS change_type,
       o.price_cents AS old_price_cents,
       n.price_cents AS new_price_cents
FROM v1 o FULL OUTER JOIN v2 n ON o.o_orderkey = n.o_orderkey
WHERE (CASE WHEN o.o_orderkey IS NULL THEN 'insert'
            WHEN n.o_orderkey IS NULL THEN 'delete'
            WHEN o.price_cents IS DISTINCT FROM n.price_cents THEN 'update'
       END) IS NOT NULL
"""


# --- vocabulary coverage curve -----------------------------------------------

# the synthetic corpus draws from a ~31-word pool, so the
# informative checkpoints sit inside it; a web corpus would use
# (1e3, 32e3, 256e3) with the identical plan
_VOCAB_CHECKPOINTS = (5, 15, 25)


def _vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer-design Zipf curve: what fraction of corpus tokens
    does a vocabulary of the top-K words cover, at three vocabulary
    checkpoints — the coverage-vs-vocab-size tradeoff every tokenizer budget
    decision reads off.  Complements ``vocab_oov_rate`` (per-doc OOV
    under ONE vocab) with the whole curve.

    Scale shape: token counts reduce to VOCABULARY grain map-side;
    the global frequency rank uses the two-phase distributed scan
    (count-range buckets → per-bucket row_number → 256-row prefix
    offsets) — never a single-partition window over the vocabulary —
    and each checkpoint's coverage is a conditional sum over ranks,
    so no cumulative window exists at all.  Ties rank
    (count desc, token asc): total order, engine-identical."""
    # toks feeds the range probe + bucketing, bucketed feeds ranks +
    # offsets — lineage cuts (rule 14); pre-cut: documents ×4
    toks = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split(ascii_lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    rng = toks.agg(F.min("cnt").alias("mn"), F.max("cnt").alias("mx"))
    bucketed = (
        toks.crossJoin(F.broadcast(rng))
        .withColumn(
            "b",
            F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
                F.expr("CAST((mx - cnt) * 256 div (mx - mn + 1) AS INT)")
            ),
        )
        .localCheckpoint(eager=False)
    )
    w_local = Window.partitionBy("b").orderBy(
        F.col("cnt").desc(), F.col("tok")
    )
    local = bucketed.withColumn("rn", F.row_number().over(w_local))
    w_off = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        bucketed.groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("off", F.coalesce(F.sum("c").over(w_off), F.lit(0)))
        .select("b", "off")
    )
    ranked = local.join(F.broadcast(offsets), "b").withColumn(
        "r", F.col("off") + F.col("rn")
    )
    agg = ranked.agg(
        F.sum("cnt").alias("total_tokens"),
        *[
            F.sum(F.when(F.col("r") <= k, F.col("cnt")).otherwise(0)).alias(
                f"cov_{k}"
            )
            for k in _VOCAB_CHECKPOINTS
        ],
    )
    # one explode over the single aggregate row — a UNION of three
    # per-checkpoint selects would replay the whole rank subtree 3x
    # (measured: 12 scans, 6 broadcast joins)
    return agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("vocab_size"),
                        F.col(f"cov_{k}").alias("tokens_covered"),
                        F.expr(f"cov_{k} * 1000 div total_tokens").alias(
                            "coverage_permille"
                        ),
                    )
                    for k in _VOCAB_CHECKPOINTS
                ]
            )
        ).alias("r")
    ).select("r.*")


_VOCAB_CURVE_SQL = f"""
WITH toks AS (
  SELECT t.tok, count(*) AS cnt
  FROM (SELECT unnest(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS tok
        FROM documents) t
  WHERE t.tok <> '' GROUP BY 1),
ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS r,
         sum(cnt) OVER () AS total_tokens
  FROM toks),
cov AS (
  SELECT any_value(total_tokens) AS total_tokens,
         {", ".join(f"sum(CASE WHEN r <= {k} THEN cnt ELSE 0 END) AS cov_{k}"
                    for k in _VOCAB_CHECKPOINTS)}
  FROM ranked)
{" UNION ALL ".join(
    f"SELECT {k} AS vocab_size, CAST(cov_{k} AS BIGINT) AS tokens_covered, "
    f"CAST(cov_{k} * 1000 // total_tokens AS BIGINT) AS coverage_permille FROM cov"
    for k in _VOCAB_CHECKPOINTS)}
"""


# --- hierarchical ratio-to-parent --------------------------------------------


def _hierarchical_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-parent at every level of the region→nation hierarchy:
    each nation's share of its region and each region's share of the
    global total, in one result — the drill-down share table every BI
    hierarchy renders.  Revenue aggregates to nation grain (25 rows)
    BEFORE any window exists (the `revenue_share_of_region` rule
    applied recursively), so both share windows run on ≤25 rows;
    shares are integer permille (exact div of cent sums) plus the
    IEEE ratio."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("cents")
        )
    )
    w_reg = Window.partitionBy("r_name")
    w_all = Window.partitionBy()
    return rev.select(
        "r_name",
        "n_name",
        (F.col("cents").cast("double") / F.lit(100.0)).alias("revenue"),
        (F.col("cents") * 1000).alias("nc"),
        F.sum("cents").over(w_reg).alias("__rc"),
        F.sum("cents").over(w_all).alias("__gc"),
    ).select(
        "r_name",
        "n_name",
        "revenue",
        F.expr("nc div __rc").alias("share_of_region_permille"),
        F.expr("(__rc * 1000) div __gc").alias("region_share_of_global_permille"),
    )


_HIER_SQL = """
WITH rev AS (
  SELECT r.r_name, n.n_name,
         sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2)
SELECT r_name, n_name,
       CAST(cents AS DOUBLE) / 100.0 AS revenue,
       CAST((cents * 1000) // sum(cents) OVER (PARTITION BY r_name)
         AS BIGINT) AS share_of_region_permille,
       CAST((sum(cents) OVER (PARTITION BY r_name) * 1000)
         // sum(cents) OVER () AS BIGINT) AS region_share_of_global_permille
FROM rev
"""


# --- Apriori candidate-pruned frequent triples --------------------------------

_TRIPLE_MIN_SUPPORT = 2


def _basket_triples_apriori(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets with the APRIORI pruning discipline —
    a triple can only be frequent if all three of its pairs are, so
    the enumeration is pruned BETWEEN the joins: (t1,t2) pairs are
    semi-joined against the frequent-pair relation before the third
    basket join ever runs, and the (i2,i3)/(i1,i3) closing pairs right
    after it — placed there explicitly because a single semi-join on
    the completed triple would sit above all three joins, where
    Catalyst cannot push it down, and the plan would pay the full raw
    triple fan-out the algorithm exists to avoid.  At lake scale the
    frequent-pair relation is orders of magnitude smaller than that
    fan-out — that asymmetry is the whole algorithm.  Baskets =
    orders, items = parts (basket_part_pairs' fixture convention).

    Answer-preserving by monotonicity (any support ≥ s triple has all
    pairs ≥ s), so the naive-enumeration oracle hash-matches.  Exact
    integer support counts throughout."""
    # li feeds five join arms and fpairs three semi-joins — lineage
    # cuts (rule 14), or lineitem re-scans 9× (measured pre-cut)
    li = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.basket") == F.col("b.basket"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("i1"), F.col("b.item").alias("i2")
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _TRIPLE_MIN_SUPPORT)
    )
    fpairs = pairs.select("i1", "i2").localCheckpoint(eager=False)
    t1, t2, t3 = li.alias("t1"), li.alias("t2"), li.alias("t3")
    # prune BETWEEN the joins, not after them: the (t1, t2) pair is
    # semi-joined against the frequent-pair relation BEFORE the third
    # basket join, and the (t2, t3) closing pair immediately after it
    # — a single semi-join on the completed (i1,i2,i3) would sit above
    # all three joins where Catalyst cannot push it down, paying the
    # full raw triple fan-out the algorithm exists to avoid
    t12 = (
        t1.join(
            t2,
            (F.col("t1.basket") == F.col("t2.basket"))
            & (F.col("t1.item") < F.col("t2.item")),
        )
        .select(
            F.col("t1.basket").alias("basket"),
            F.col("t1.item").alias("i1"),
            F.col("t2.item").alias("i2"),
        )
        .join(
            fpairs,
            ["i1", "i2"],
            "left_semi",
        )
        .alias("t12")
    )
    triples_in_baskets = (
        t12.join(
            t3,
            (F.col("t12.basket") == F.col("t3.basket"))
            & (F.col("t12.i2") < F.col("t3.item")),
        )
        .select("i1", "i2", F.col("t3.item").alias("i3"))
        .alias("tri")
        # closing pair (i2, i3) must be frequent; (i1, i3) too
        .join(
            fpairs.select(
                F.col("i1").alias("i2"), F.col("i2").alias("i3")
            ),
            ["i2", "i3"],
            "left_semi",
        )
        .join(
            fpairs.select(
                F.col("i1"), F.col("i2").alias("i3")
            ),
            ["i1", "i3"],
            "left_semi",
        )
    )
    return (
        triples_in_baskets.groupBy("i1", "i2", "i3")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _TRIPLE_MIN_SUPPORT)
    )


_TRIPLES_SQL = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem)
SELECT a.item AS i1, b.item AS i2, c.item AS i3,
       CAST(count(*) AS BIGINT) AS support
FROM li a
JOIN li b ON a.basket = b.basket AND a.item < b.item
JOIN li c ON a.basket = c.basket AND b.item < c.item
GROUP BY 1, 2, 3
HAVING count(*) >= {_TRIPLE_MIN_SUPPORT}
"""


# --- sequential surrogate-key assignment -------------------------------------


def _dim_key_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential surrogate-key assignment — the OTHER school from the
    md5 surrogate (C5): new dimension members get contiguous integer
    keys after the current maximum, stable across reruns because the
    rank order is the natural key.  ``monotonically_increasing_id``
    is the folklore trap here (partition-dependent, gaps, not
    rerun-stable); the correct distributed form is max(existing) +
    dense rank of the new members.

    Scale: the rank is the TWO-PHASE scan (md5-prefix buckets of the
    natural key → local row_number → 256-row prefix offsets), never a
    single-partition window; existing-max is a 1-row broadcast.
    Fixture split: customers with custkey % 3 != 0 are the existing
    dim (surrogate = custkey); % 3 == 0 are the arriving members."""
    cust = load(spark, sf_dir, "customer")
    # existing feeds max-sk + the final union, new feeds the range
    # probe + bucketing, bucketed feeds ranks + offsets — lineage cuts
    # (rule 14), or customer re-scans 6× (measured pre-cut)
    existing = (
        cust.filter(F.col("c_custkey") % 3 != 0)
        .select(
            F.col("c_custkey").alias("natural_key"),
            F.col("c_custkey").alias("surrogate_key"),
        )
        .localCheckpoint(eager=False)
    )
    new = (
        cust.filter(F.col("c_custkey") % 3 == 0)
        .select(F.col("c_custkey").alias("natural_key"))
        .localCheckpoint(eager=False)
    )
    max_sk = existing.agg(F.max("surrogate_key").alias("mx"))
    # RANGE buckets on the natural key (not hash buckets — the global
    # rank order must be the key order, and range buckets preserve it:
    # every key in bucket b sorts before every key in bucket b+1)
    rng = new.agg(F.min("natural_key").alias("mn"), F.max("natural_key").alias("kx"))
    bucketed = (
        new.crossJoin(F.broadcast(rng))
        .withColumn(
            "b",
            F.expr("CAST((natural_key - mn) * 256 div (kx - mn + 1) AS INT)"),
        )
        .drop("mn", "kx")
        .localCheckpoint(eager=False)
    )
    w_local = Window.partitionBy("b").orderBy("natural_key")
    local = bucketed.withColumn("rn", F.row_number().over(w_local))
    w_off = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        bucketed.groupBy("b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("offset", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)))
        .select("b", "offset")
    )
    assigned = (
        local.join(F.broadcast(offsets), "b")
        .crossJoin(F.broadcast(max_sk))
        .select(
            "natural_key",
            (F.col("mx") + F.col("offset") + F.col("rn")).alias(
                "surrogate_key"
            ),
            F.lit(True).alias("is_new"),
        )
    )
    return existing.withColumn("is_new", F.lit(False)).unionByName(assigned)


_DIMKEY_SQL = """
WITH existing AS (
  SELECT c_custkey AS natural_key, c_custkey AS surrogate_key
  FROM customer WHERE c_custkey % 3 <> 0),
new_members AS (
  SELECT c_custkey AS natural_key FROM customer WHERE c_custkey % 3 = 0),
assigned AS (
  SELECT natural_key,
         (SELECT max(surrogate_key) FROM existing)
           + row_number() OVER (ORDER BY natural_key) AS surrogate_key
  FROM new_members)
SELECT natural_key, surrogate_key, FALSE AS is_new FROM existing
UNION ALL
SELECT natural_key, surrogate_key, TRUE AS is_new FROM assigned
"""


# --- weighted percentiles ----------------------------------------------------


def _weighted_quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED percentiles — the distribution question unweighted
    quantiles get wrong: "what line-quantity level carries half /
    ninety percent of the REVENUE?" (revenue-weighted p50/p90 of
    quantity per return flag).  The exact integer rank rule
    (`order_gap_percentiles` pattern) generalizes to weights
    verbatim: cumulative WEIGHT over the value domain, answer =
    smallest quantity with ``cum_cents·100 ≥ p·total_cents`` — all
    int64 cents, no float percentile semantics to reconcile.

    Scale: quantity's domain is bounded (1..50), so the per-flag
    cumulative window runs on ≤50 domain rows regardless of corpus
    size; revenue aggregates map-side into the domain grain."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("q"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    dom = li.groupBy("flag", "q").agg(F.sum("cents").alias("w"))
    wc = Window.partitionBy("flag").orderBy("q")
    cum = dom.withColumn("cw", F.sum("w").over(wc)).withColumn(
        "tw", F.sum("w").over(Window.partitionBy("flag"))
    )
    return cum.groupBy("flag").agg(
        F.min(F.when(F.col("cw") * 100 >= F.col("tw") * 50, F.col("q"))).alias(
            "p50_weighted_qty"
        ),
        F.min(F.when(F.col("cw") * 100 >= F.col("tw") * 90, F.col("q"))).alias(
            "p90_weighted_qty"
        ),
        (F.max("tw").cast("double") / F.lit(100.0)).alias("total_revenue"),
    )


_WQP_SQL = """
WITH li AS (
  SELECT l_returnflag AS flag,
         CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem),
dom AS (SELECT flag, q, sum(cents) AS w FROM li GROUP BY 1, 2),
cum AS (
  SELECT flag, q, w,
         sum(w) OVER (PARTITION BY flag ORDER BY q
                      ROWS UNBOUNDED PRECEDING) AS cw,
         sum(w) OVER (PARTITION BY flag) AS tw
  FROM dom)
SELECT flag,
       min(CASE WHEN cw * 100 >= tw * 50 THEN q END) AS p50_weighted_qty,
       min(CASE WHEN cw * 100 >= tw * 90 THEN q END) AS p90_weighted_qty,
       CAST(max(tw) AS DOUBLE) / 100.0 AS total_revenue
FROM cum GROUP BY flag
"""


# --- forward as-of join ------------------------------------------------------


def _asof_forward_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (`operators/asof.py` ``direction="forward"``):
    for every click, the user's NEXT purchase at or after the click —
    the time-to-conversion alignment, mirror of
    ``asof_join_click_purchase``.  Same union-trick plan (one window
    shuffle, no Python); the frame flips to [current, unbounded
    following] with ``first(ignorenulls)`` and the equal-ts right row
    sorts after the left so inclusivity holds.  Right side
    pre-aggregated per (user, ts) so ties are deterministic; DuckDB's
    native ``ASOF LEFT JOIN ... ts <= ts`` is the independent oracle."""
    from data_pipeline_bigquery_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("purchase_value")
        )
    )
    out = asof_join(
        clicks,
        purchases,
        on="user_id",
        ts_col="ts",
        value_cols=["purchase_value"],
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_ts").alias("next_purchase_ts"),
        F.col("asof_purchase_value").alias("next_purchase_value"),
    )


_ASOF_FWD_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
purchases AS (
  SELECT user_id, ts,
         CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
SELECT c.event_id, c.user_id, c.ts, p.ts AS next_purchase_ts,
       p.purchase_value AS next_purchase_value
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts <= p.ts
"""


# --- Hamilton (largest-remainder) apportionment, shared ----------------------


def _hamilton_slots(df: DataFrame, key_col: str, n_col: str, budget: int) -> DataFrame:
    """Exact integer largest-remainder apportionment of ``budget``
    across the ``key_col`` groups of ``df`` (one row per group with
    count ``n_col``): floors of the exact quotas, leftover slots to
    the largest remainders, ties → larger count then key — a total
    order, so the split is identical on every engine.  Shared by
    ``budget_apportionment`` and ``exact_stratified_split`` (one copy
    of the tie/shortfall algebra).  Runs entirely at group grain."""
    tot = df.agg(F.sum(n_col).alias("__n_total"))
    quo = df.crossJoin(F.broadcast(tot)).select(
        key_col,
        n_col,
        F.expr(f"{n_col} * {budget} div __n_total").alias("__base"),
        F.expr(f"({n_col} * {budget}) % __n_total").alias("__rem"),
    )
    w = Window.orderBy(
        F.col("__rem").desc(), F.col(n_col).desc(), F.col(key_col)
    )
    return (
        quo.withColumn(
            "__shortfall",
            F.lit(budget) - F.sum("__base").over(Window.partitionBy()),
        )
        .withColumn("__rk", F.row_number().over(w))
        .select(
            key_col,
            n_col,
            (
                F.col("__base")
                + F.when(F.col("__rk") <= F.col("__shortfall"), 1).otherwise(0)
            ).alias("slots"),
        )
    )


# --- exact-count stratified sampling -----------------------------------------

_EXSPLIT_BUDGET = 200
_EXSPLIT_SALT = ":exsplit"


def _exact_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-COUNT stratified sampling: draw exactly
    ``Hamilton(budget, lang)`` documents per language, chosen by a
    deterministic md5 order — the exact-quota complement of the
    rate-based ``stratified_sample_lang`` (md5-permille rates drift
    ±O(√n) off the target; a data recipe that promises "exactly 200
    docs, proportionally by language" needs quotas, not rates).

    Scale shape: the per-stratum rank is NOT a per-language window
    (a language is corpus-sized) — it is the two-phase distributed
    scan (`revenue_gini` pattern) keyed by (lang, md5-prefix bucket):
    row_number within each of the 256 hash buckets, per-lang prefix
    offsets over the 256-row bucket histogram broadcast back.  The
    quota itself is the exact integer Hamilton apportionment
    (`budget_apportionment` algebra).  The oracle deliberately uses
    the NAIVE formulation — one row_number per language — so the
    two-phase scan is checked against an independent definition."""
    # docs feeds the quota probe + bucketing, bucketed feeds ranks +
    # offsets — lineage cuts (rule 14); pre-cut: documents ×4
    docs = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"), F.lit(_EXSPLIT_SALT)
                )
            ).alias("h"),
        )
        .localCheckpoint(eager=False)
    )
    # Hamilton quota per lang (shared algebra)
    per_lang = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    slots = _hamilton_slots(per_lang, "lang", "n_l", _EXSPLIT_BUDGET).select(
        "lang", "slots"
    )
    # two-phase per-stratum rank on (h, doc_id): bucket by md5 prefix
    bucketed = docs.withColumn(
        "b", F.expr("CAST(conv(substring(h, 1, 2), 16, 10) AS INT)")
    ).localCheckpoint(eager=False)
    w_local = Window.partitionBy("lang", "b").orderBy("h", "doc_id")
    local = bucketed.withColumn("rn", F.row_number().over(w_local))
    w_off = (
        Window.partitionBy("lang")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        bucketed.groupBy("lang", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("offset", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)))
        .select("lang", "b", "offset")
    )
    ranked = local.join(F.broadcast(offsets), ["lang", "b"]).withColumn(
        "stratum_rank", F.col("offset") + F.col("rn")
    )
    return (
        ranked.join(F.broadcast(slots), "lang")
        .filter(F.col("stratum_rank") <= F.col("slots"))
        .select("doc_id", "lang", "stratum_rank")
    )


_EXSPLIT_SQL = f"""
WITH docs AS (
  SELECT doc_id, lang,
         md5(CAST(doc_id AS VARCHAR) || '{_EXSPLIT_SALT}') AS h
  FROM documents),
per_lang AS (SELECT lang, count(*) AS n_l FROM docs GROUP BY 1),
quo AS (
  SELECT lang, n_l,
         n_l * {_EXSPLIT_BUDGET} // (SELECT sum(n_l) FROM per_lang) AS base,
         (n_l * {_EXSPLIT_BUDGET}) % (SELECT sum(n_l) FROM per_lang) AS rem
  FROM per_lang),
slots AS (
  SELECT lang,
         base + CASE WHEN row_number() OVER (ORDER BY rem DESC, n_l DESC,
                                             lang)
                       <= {_EXSPLIT_BUDGET} - sum(base) OVER ()
                     THEN 1 ELSE 0 END AS slots
  FROM quo),
ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
           AS stratum_rank
  FROM docs)
SELECT r.doc_id, r.lang, CAST(r.stratum_rank AS BIGINT) AS stratum_rank
FROM ranked r JOIN slots s ON r.lang = s.lang
WHERE r.stratum_rank <= s.slots
"""


# --- late-arrival restatement audit ------------------------------------------


def _late_arriving_restatement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bitemporal reporting op: monthly revenue AS FIRST REPORTED
    (only records whose transaction time landed inside the reporting
    month) vs FINAL (all records valid in the month), and the
    restatement this implies — the "numbers changed after we
    published" audit every late-arriving-data warehouse needs.
    Transaction time is synthesized as ``o_orderdate + (o_orderkey %
    7) days`` (records arrive up to 6 days late, so month-boundary
    orders restate).

    Exact: revenue sums in DECIMAL(18,2), the restatement share in
    integer permille of final (div), one IEEE division for the ratio.
    One scan; both measures are conditional aggregates of the same
    month-keyed pass — the valid-time month is the grouping key and
    the transaction-time filter is a predicate, NOT a second join."""
    o = load(spark, sf_dir, "orders").select(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym"),
        F.expr(
            "year(o_orderdate + make_interval(0,0,0, CAST(o_orderkey % 7 AS INT))) * 100"
            " + month(o_orderdate + make_interval(0,0,0, CAST(o_orderkey % 7 AS INT)))"
        ).alias("recorded_ym"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("rev"),
    )
    agg = o.groupBy("ym").agg(
        F.sum(F.when(F.col("recorded_ym") == F.col("ym"), F.col("rev"))).alias(
            "first_reported_rev"
        ),
        F.sum("rev").alias("final_rev"),
        F.count(F.when(F.col("recorded_ym") != F.col("ym"), 1)).alias(
            "n_late"
        ),
    )
    restated = (F.col("final_rev") - F.col("first_reported_rev")).cast(
        "decimal(18,2)"
    )
    return agg.select(
        "ym",
        F.col("first_reported_rev").cast("double").alias("first_reported_rev"),
        F.col("final_rev").cast("double").alias("final_rev"),
        "n_late",
        # permille over integer CENTS: DuckDB's // on DECIMAL is NOT
        # integral division (measured), so both engines divide int64s
        F.expr(
            "CAST((CAST(final_rev AS DECIMAL(18,2)) - first_reported_rev)"
            " * 100 AS BIGINT) * 1000"
            " div CAST(CAST(final_rev AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("restated_permille"),
    )


_RESTATE_SQL = """
WITH o AS (
  SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
         year(o_orderdate + to_days(CAST(o_orderkey % 7 AS INT))) * 100
           + month(o_orderdate + to_days(CAST(o_orderkey % 7 AS INT)))
           AS recorded_ym,
         CAST(o_totalprice AS DECIMAL(18,2)) AS rev
  FROM orders),
agg AS (
  SELECT ym,
         sum(CASE WHEN recorded_ym = ym THEN rev END) AS first_reported_rev,
         sum(rev) AS final_rev,
         count(CASE WHEN recorded_ym <> ym THEN 1 END) AS n_late
  FROM o GROUP BY 1)
SELECT ym, CAST(first_reported_rev AS DOUBLE) AS first_reported_rev,
       CAST(final_rev AS DOUBLE) AS final_rev,
       CAST(n_late AS BIGINT) AS n_late,
       CAST((final_rev - first_reported_rev) * 100 AS BIGINT) * 1000
         // CAST(final_rev * 100 AS BIGINT) AS restated_permille
FROM agg
"""


# --- discrete churn hazard ---------------------------------------------------


def _churn_hazard_by_tenure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time churn hazard by tenure month: for each tenure
    month k, ``h_k = churned_at_k / at_risk_at_k`` — the retention
    curve's derivative, computed from exact integer counts (the
    life-table form of survival analysis; no product-limit float
    chains to reconcile across engines).

    Tenure = months between a customer's first and last order
    (integer year·12+month arithmetic, the cohort_retention
    convention).  ``at_risk(k) = Σ_{j≥k} ended(j)`` falls out of ONE
    suffix sum over the tenure-grain histogram — the corpus
    aggregates to per-customer (first, last) pairs, then to ≤
    max-tenure rows; the suffix window runs at tenure grain.
    Permille hazard via integer div keeps the compare exact; the
    IEEE-division hazard_rate column is derived from the same two
    int64s."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym"),
    )
    span = o.groupBy("o_custkey").agg(
        (F.max("ym") - F.min("ym")).alias("tenure")
    )
    hist = span.groupBy("tenure").agg(F.count(F.lit(1)).alias("ended"))
    w = Window.orderBy(F.col("tenure").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        hist.withColumn("at_risk", F.sum("ended").over(w))
        .select(
            "tenure",
            "ended",
            "at_risk",
            F.expr("ended * 1000 div at_risk").alias("hazard_permille"),
            (
                F.col("ended").cast("double")
                / F.col("at_risk").cast("double")
            ).alias("hazard_rate"),
        )
    )


_CHURN_SQL = """
WITH o AS (
  SELECT o_custkey, year(o_orderdate) * 12 + month(o_orderdate) AS ym
  FROM orders),
span AS (
  SELECT o_custkey, max(ym) - min(ym) AS tenure FROM o GROUP BY 1),
hist AS (SELECT tenure, count(*) AS ended FROM span GROUP BY 1)
SELECT tenure, CAST(ended AS BIGINT) AS ended,
       CAST(sum(ended) OVER (ORDER BY tenure DESC
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS at_risk,
       CAST(ended AS BIGINT) * 1000
         // CAST(sum(ended) OVER (ORDER BY tenure DESC
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS hazard_permille,
       CAST(ended AS DOUBLE)
       / CAST(sum(ended) OVER (ORDER BY tenure DESC
                               ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         AS hazard_rate
FROM hist
"""


# --- largest-remainder apportionment -----------------------------------------

_APPORTION_BUDGET = 10_000


def _budget_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment: split an integer
    budget of {budget} sampling slots across sources exactly
    proportionally to their doc counts — floors of the exact quotas,
    then the leftover slots go to the largest fractional remainders
    (ties → larger source, then name).  The allocation op behind
    training-mix quotas, budget splits, and seat assignment; done
    wrong (IEEE quotas, unordered ties) the slots don't sum to the
    budget and no two engines agree.

    Exact: quota numerators ``n_docs·B`` stay integer; floor and
    remainder come from integer div/mod; the remainder ranking is an
    integer sort.  Everything after the source-grain aggregate runs
    on k rows."""
    docs = load(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return _hamilton_slots(src, "source", "n_docs", _APPORTION_BUDGET)


_APPORTION_SQL = f"""
WITH src AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
quo AS (
  SELECT source, n_docs,
         n_docs * {_APPORTION_BUDGET} // (SELECT sum(n_docs) FROM src) AS base,
         (n_docs * {_APPORTION_BUDGET}) % (SELECT sum(n_docs) FROM src) AS rem
  FROM src),
r AS (
  SELECT source, n_docs, base,
         {_APPORTION_BUDGET} - sum(base) OVER () AS shortfall,
         row_number() OVER (ORDER BY rem DESC, n_docs DESC, source) AS rk
  FROM quo)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(base + CASE WHEN rk <= shortfall THEN 1 ELSE 0 END AS BIGINT)
         AS slots
FROM r
"""


# --- native sliding-window aggregation ---------------------------------------


def _sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native SLIDING ``window()`` aggregate (2-hour windows
    every 30 minutes — each event belongs to exactly 4 overlapping
    windows), completing the window-operator family: tumbling
    (`windowed_event_counts`), session (`session_window_agg`), and now
    sliding.  The engine replicates each row into its windows inside
    the aggregation operator; the oracle reproduces the replication
    explicitly (4 aligned starts per event) — an independent
    formulation of the same window algebra, epoch-aligned like
    Spark's windows.

    Scale: one exchange keyed on (window, type); the 4× replication
    happens map-side before the partial aggregate, so the shuffle
    carries partial counts, not replicated events."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "2 hours", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


_SLIDING_SQL = """
WITH starts AS (
  SELECT event_type,
         TIMESTAMP '1970-01-01 00:00:00'
           + to_seconds(CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800
                        - k * 1800) AS window_start
  FROM events, UNNEST([0, 1, 2, 3]) AS u(k))
SELECT window_start,
       window_start + INTERVAL 2 HOUR AS window_end,
       event_type, CAST(count(*) AS BIGINT) AS n
FROM starts GROUP BY 1, 2, 3
"""


# --- exact power-of-two EWMA -------------------------------------------------


def _ewma_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, type) exponentially-weighted moving average of event
    value with α = ½ — the ops-metric smoother — in EXACT integer
    arithmetic: the 30-term truncated closed form
    ``s_n = Σ_{i=0..29} v_{n−i}·2^{−(i+1)}`` (dropped tail mass
    ≤ 2⁻³⁰) scales by 2³⁰ into pure int64 bit-shifts:
    ``s30 = Σ cents_j << (29 − L + j)`` over the ordered 30-row frame
    (≤ 5·10¹³, well under 2⁵³), and the one final division by 2³⁰ is
    an exact exponent adjustment — every engine produces the
    bit-identical double.  DECIMAL was tried and REJECTED: DuckDB's
    double→DECIMAL(38,30) cast multiplies by 10³⁰ in floating point
    and corrupts even exactly-representable values.

    Scale: one exchange on the high-cardinality (user, type) pair;
    the frame is a constant 30 rows, so state per key is bounded —
    the same recurrence-as-window discipline as
    ``clamped_running_balance``."""
    ev = (
        load(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            "event_type",
            "ts",
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
        # a NULL-value event has no reading: drop it on BOTH engines —
        # Spark's collect_list skips NULLs (an all-NULL window makes an
        # EMPTY frame the fold then indexes out of bounds) while
        # DuckDB's list() keeps them, shifting every exponent
        .filter(F.col("cents").isNotNull())
    )
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-29, 0)
    )
    frame = F.collect_list("cents").over(w)
    s30 = F.expr(
        "aggregate(transform(sequence(1, size(__frame)),"
        " i -> element_at(__frame, i)"
        "      * shiftleft(CAST(1 AS BIGINT), 29 - size(__frame) + i)),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    return (
        ev.withColumn("__frame", frame)
        .withColumn("ewma_cents", s30.cast("double") / F.lit(1073741824.0))
        .select("event_id", "user_id", "event_type", "ewma_cents")
    )


_EWMA_SQL = """
WITH ev AS (
  SELECT event_id, user_id, event_type, ts,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL),
w AS (
  SELECT event_id, user_id, event_type,
         list(cents) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id
                           ROWS BETWEEN 29 PRECEDING AND CURRENT ROW) AS l
  FROM ev)
SELECT event_id, user_id, event_type,
       CAST(list_sum([l[i] * (CAST(1 AS BIGINT) << (29 - len(l) + i))
                      for i in generate_series(1, len(l))]) AS DOUBLE)
       / 1073741824.0 AS ewma_cents
FROM w
"""


# --- grouped multivariate OLS ------------------------------------------------


def _grouped_ols_price_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped MULTIVARIATE regression without MLlib and without
    per-group collects: per return flag, fit
    ``price = b0 + b1·quantity + b2·discount`` by solving the 3×3
    normal equations with Cramer's rule over EXACT integer sufficient
    statistics — the multi-feature successor of
    ``events_trend_by_type`` (single-feature OLS).

    Exactness: the fixture's measures are fixed-point stored as
    doubles (quantity integral, discount/price 2-decimal with ≤1e-9
    float noise), so ``floor(x·100 + 0.5)`` recovers exact integers
    deterministically.  Sufficient statistics (n, Σq, Σd, Σq², Σd²,
    Σqd, Σp, Σpq, Σpd) sum exactly through DECIMAL(38,0) (HUGEINT in
    the oracle); Cramer determinants are exact products of those
    (≈1e27 here, inside 38 digits up to ~1e8 rows/group — center the
    features beyond that); each coefficient is ONE det/det IEEE
    division rounded to 6 decimals, which absorbs the >2^53
    DECIMAL→DOUBLE cast's last-ulp variation.

    Scale: one map-side-combined aggregate to k×9 statistics; the
    3×3 solve is per-group scalar algebra in the projection — no
    second pass, no matrix library, no driver round-trip."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_quantity") + F.lit(0.5)).alias("q"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5)).alias("d"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).alias("p"),
    )
    dec = "decimal(38,0)"
    s = li.groupBy("flag").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("q").cast(dec)).alias("sq"),
        F.sum(F.col("d").cast(dec)).alias("sd"),
        F.sum((F.col("q") * F.col("q")).cast(dec)).alias("sqq"),
        F.sum((F.col("d") * F.col("d")).cast(dec)).alias("sdd"),
        F.sum((F.col("q") * F.col("d")).cast(dec)).alias("sqd"),
        F.sum(F.col("p").cast(dec)).alias("sp"),
        F.sum((F.col("p") * F.col("q")).cast(dec)).alias("spq"),
        F.sum((F.col("p") * F.col("d")).cast(dec)).alias("spd"),
    )
    det3 = (
        "({a}*({e}*{i} - {f}*{h}) - {b}*({d}*{i} - {f}*{g})"
        " + {c}*({d}*{h} - {e}*{g}))"
    )
    det = det3.format(a="n", b="sq", c="sd", d="sq", e="sqq", f="sqd",
                      g="sd", h="sqd", i="sdd")
    det0 = det3.format(a="sp", b="sq", c="sd", d="spq", e="sqq", f="sqd",
                       g="spd", h="sqd", i="sdd")
    det1 = det3.format(a="n", b="sp", c="sd", d="sq", e="spq", f="sqd",
                       g="sd", h="spd", i="sdd")
    det2 = det3.format(a="n", b="sq", c="sp", d="sq", e="sqq", f="spq",
                       g="sd", h="sqd", i="spd")
    # rule 9: a singular system (too few distinct rows in a group) has
    # det = 0 — ANSI throws on the division where the oracle's NULL
    # says "no unique fit" (degenerate-lineitem sweep catch)
    return s.select(
        "flag",
        F.col("n").cast("bigint").alias("n_rows"),
        F.expr(
            f"round(CAST({det0} AS DOUBLE)"
            f" / nullif(CAST({det} AS DOUBLE), 0.0), 6)"
        ).alias("b0_cents"),
        F.expr(
            f"round(CAST({det1} AS DOUBLE)"
            f" / nullif(CAST({det} AS DOUBLE), 0.0), 6)"
        ).alias("b1_cents_per_unit"),
        F.expr(
            f"round(CAST({det2} AS DOUBLE)"
            f" / nullif(CAST({det} AS DOUBLE), 0.0), 6)"
        ).alias("b2_cents_per_pp"),
    )


def _ols_sql() -> str:
    det3 = (
        "({a}*({e}*{i} - {f}*{h}) - {b}*({d}*{i} - {f}*{g})"
        " + {c}*({d}*{h} - {e}*{g}))"
    )
    det = det3.format(a="n", b="sq", c="sd", d="sq", e="sqq", f="sqd",
                      g="sd", h="sqd", i="sdd")
    det0 = det3.format(a="sp", b="sq", c="sd", d="spq", e="sqq", f="sqd",
                       g="spd", h="sqd", i="sdd")
    det1 = det3.format(a="n", b="sp", c="sd", d="sq", e="spq", f="sqd",
                       g="sd", h="spd", i="sdd")
    det2 = det3.format(a="n", b="sq", c="sp", d="sq", e="sqq", f="spq",
                       g="sd", h="sqd", i="spd")
    return f"""
WITH ints AS (
  SELECT l_returnflag AS flag,
         CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS p
  FROM lineitem),
s AS (
  SELECT flag,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(q) AS HUGEINT) AS sq,
         CAST(sum(d) AS HUGEINT) AS sd,
         CAST(sum(q * q) AS HUGEINT) AS sqq,
         CAST(sum(d * d) AS HUGEINT) AS sdd,
         CAST(sum(q * d) AS HUGEINT) AS sqd,
         CAST(sum(p) AS HUGEINT) AS sp,
         CAST(sum(p * q) AS HUGEINT) AS spq,
         CAST(sum(p * d) AS HUGEINT) AS spd
  FROM ints GROUP BY flag)
SELECT flag, CAST(n AS BIGINT) AS n_rows,
       round(CAST({det0} AS DOUBLE) / nullif(CAST({det} AS DOUBLE), 0.0), 6)
         AS b0_cents,
       round(CAST({det1} AS DOUBLE) / nullif(CAST({det} AS DOUBLE), 0.0), 6)
         AS b1_cents_per_unit,
       round(CAST({det2} AS DOUBLE) / nullif(CAST({det} AS DOUBLE), 0.0), 6)
         AS b2_cents_per_pp
FROM s
"""


# --- exact-arithmetic Lloyd refinement ---------------------------------------


def _kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd (k-means) iterations over the embedding corpus in
    EXACT arithmetic (`extensions/kmeans.py`), seeded from the label
    assignment — the iterative-ML pattern on a declarative engine,
    deterministic enough that the DuckDB oracle unrolls the same two
    steps and hash-matches bit-for-bit (float k-means never
    cross-checks like this; see the module docstring for the rational-
    centroid / int64 / DECIMAL policy).

    Per step the corpus never shuffles: centroids reduce to k rows
    (map-side partials over exploded components) and broadcast back;
    assignment is one whole-stage HOF fold per vector.  Output is the
    per-cluster census after step 2 plus how many vectors left their
    seed cluster — the convergence telemetry a training loop watches."""
    from data_pipeline_bigquery_spark.extensions.kmeans import (
        lloyd_refine,
        quantize,
    )

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", quantize(F.col("embedding")).alias("q")
    )
    seeded = emb.select("vec_id", "q", F.col("label").alias("cluster"))
    # materialize: without it the lazy unroll re-evaluates step 1's
    # assignment subtree in every consumer (its centroid sums, its
    # member counts, AND step 2's input — 3x the corpus work); the
    # checkpoint computes each step once, the pattern any >1-step
    # iteration needs at scale
    final = lloyd_refine(seeded, iters=2, materialize=True)
    return (
        final.join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("vec_id").alias("sum_vec_id"),
            F.sum(
                F.when(F.col("cluster") != F.col("label"), 1).otherwise(0)
            ).alias("n_moved_from_seed"),
        )
    )


_KMEANS_SQL = """
WITH q AS (
  SELECT vec_id, label,
         [CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
          for x in embedding] AS qv
  FROM embeddings),
ex AS (
  SELECT vec_id, t.dim, t.qi
  FROM (SELECT vec_id,
               unnest([{'dim': i, 'qi': qv[i]}
                       for i in generate_series(1, len(qv))]) AS t
        FROM q)),
a0 AS (SELECT vec_id, label AS cluster FROM q),
cent1 AS (
  SELECT a.cluster, e.dim, sum(e.qi) AS s, count(*) AS n_c
  FROM ex e JOIN a0 a USING (vec_id) GROUP BY 1, 2),
d1 AS (
  SELECT e.vec_id, c.cluster,
         sum(CAST(CAST(e.qi * c.n_c - c.s AS DOUBLE)
                  * CAST(e.qi * c.n_c - c.s AS DOUBLE)
                  AS DECIMAL(38,6))) AS num,
         any_value(c.n_c) AS n_c
  FROM ex e JOIN cent1 c USING (dim) GROUP BY 1, 2),
a1 AS (
  SELECT vec_id, cluster
  FROM (SELECT vec_id, cluster,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY CAST(num AS DOUBLE)
                                           / (CAST(n_c AS DOUBLE)
                                              * CAST(n_c AS DOUBLE)),
                                           cluster) AS rn
        FROM d1)
  WHERE rn = 1),
cent2 AS (
  SELECT a.cluster, e.dim, sum(e.qi) AS s, count(*) AS n_c
  FROM ex e JOIN a1 a USING (vec_id) GROUP BY 1, 2),
d2 AS (
  SELECT e.vec_id, c.cluster,
         sum(CAST(CAST(e.qi * c.n_c - c.s AS DOUBLE)
                  * CAST(e.qi * c.n_c - c.s AS DOUBLE)
                  AS DECIMAL(38,6))) AS num,
         any_value(c.n_c) AS n_c
  FROM ex e JOIN cent2 c USING (dim) GROUP BY 1, 2),
a2 AS (
  SELECT vec_id, cluster
  FROM (SELECT vec_id, cluster,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY CAST(num AS DOUBLE)
                                           / (CAST(n_c AS DOUBLE)
                                              * CAST(n_c AS DOUBLE)),
                                           cluster) AS rn
        FROM d2)
  WHERE rn = 1)
SELECT a2.cluster, CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(a2.vec_id) AS BIGINT) AS sum_vec_id,
       CAST(sum(CASE WHEN a2.cluster <> q.label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_moved_from_seed
FROM a2 JOIN q USING (vec_id) GROUP BY 1
"""


QUERIES: dict[str, QuerySpec] = {
    "binary_file_scan": QuerySpec(_binary_file_scan, _BINARY_FILE_SQL),
    "pit_dim_lookup": QuerySpec(_pit_dim_lookup, _PIT_SQL),
    "multi_touch_attribution": QuerySpec(_multi_touch_attribution, _MTA_SQL),
    "pii_pseudonymize": QuerySpec(_pii_pseudonymize, _PSEUDO_SQL),
    "kmeans_refine_iterations": QuerySpec(_kmeans_refine, _KMEANS_SQL),
    "session_window_agg": QuerySpec(_session_window_agg, _SESSION_WINDOW_SQL),
    "status_dwell_time": QuerySpec(_status_dwell_time, _DWELL_SQL),
    "wilson_conversion_bounds": QuerySpec(
        _wilson_conversion_bounds, _WILSON_SQL
    ),
    "embedding_int8_quantize": QuerySpec(_embedding_int8_quantize, _INT8_SQL),
    "length_quantile_normalize": QuerySpec(
        _length_quantile_normalize, _QNORM_SQL
    ),
    "grouped_ols_price_model": QuerySpec(_grouped_ols_price_model, _ols_sql()),
    "rest_datasource_scan": QuerySpec(_rest_datasource_scan, _REST_DS_SQL),
    "ewma_event_value": QuerySpec(_ewma_event_value, _EWMA_SQL),
    "sliding_window_counts": QuerySpec(
        _sliding_window_counts, _SLIDING_SQL
    ),
    "churn_hazard_by_tenure": QuerySpec(_churn_hazard_by_tenure, _CHURN_SQL),
    "budget_apportionment": QuerySpec(_budget_apportionment, _APPORTION_SQL),
    "late_arriving_restatement": QuerySpec(
        _late_arriving_restatement, _RESTATE_SQL
    ),
    "exact_stratified_split": QuerySpec(
        _exact_stratified_split, _EXSPLIT_SQL
    ),
    "asof_forward_next_purchase": QuerySpec(
        _asof_forward_next_purchase, _ASOF_FWD_SQL
    ),
    "weighted_quantity_percentiles": QuerySpec(
        _weighted_quantity_percentiles, _WQP_SQL
    ),
    "dim_key_assignment": QuerySpec(_dim_key_assignment, _DIMKEY_SQL),
    "hierarchical_revenue_share": QuerySpec(
        _hierarchical_revenue_share, _HIER_SQL
    ),
    "basket_triples_apriori": QuerySpec(
        _basket_triples_apriori, _TRIPLES_SQL
    ),
    "vocab_coverage_curve": QuerySpec(_vocab_coverage_curve, _VOCAB_CURVE_SQL),
    "snapshot_time_travel_cdc": QuerySpec(
        _snapshot_time_travel_cdc, _SNAP_CDC_SQL
    ),
}
