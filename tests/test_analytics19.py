"""Batch-19 semantic tests: independent recomputation of the KM
curve, the NDCG readout, the bridge telescoping identity, the
decomposition's additivity, and the Syntetos-Boylan quadrants — the
oracle sweep proves the engines AGREE; these prove the shared logic
is RIGHT."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from data_pipeline_bigquery_spark.queries import analytics19
from tests.conftest import SF_DIR


def _run(spark, key, sf=SF_DIR):
    return analytics19.QUERIES[key].fn(spark, sf).collect()


def test_kaplan_meier_matches_independent_recompute(spark):
    rows = _run(spark, "kaplan_meier_retention")
    assert rows, "KM curve must not be empty"
    # independent per-customer duration/event labeling via duckdb+python
    con = duckdb.connect()
    per = con.sql(
        f"SELECT o_custkey, list(DISTINCT CAST(o_orderdate AS DATE)"
        f" ORDER BY CAST(o_orderdate AS DATE)) AS ds"
        f" FROM '{SF_DIR}/orders.parquet' GROUP BY 1"
    ).fetchall()
    dmax = max(max(ds) for _, ds in per)
    labeled = []
    for _, ds in per:
        if len(ds) >= 2:
            dur, ev = (ds[1] - ds[0]).days, 1
        else:
            dur, ev = (dmax - ds[0]).days, 0
        b = dur // analytics19._KM_BUCKET_DAYS
        if b > analytics19._KM_CAP:
            b, ev = analytics19._KM_CAP, 0
        labeled.append((b, ev))
    steps = defaultdict(lambda: [0, 0])
    for b, ev in labeled:
        steps[b][0] += ev
        steps[b][1] += 1 - ev
    n = len(labeled)
    s = analytics19._KM_SCALE
    expect = []
    for b in sorted(steps):
        d, c = steps[b]
        s = s * (n - d) // n
        expect.append((b, n, d, c, s))
        n -= d + c
    got = [
        (r.bucket, r.n_risk, r.events, r.censored, r.survival_ppm)
        for r in rows
    ]
    assert got == expect
    # survival is monotone nonincreasing from the full scale
    ppms = [r.survival_ppm for r in rows]
    assert all(a >= b for a, b in zip(ppms, ppms[1:]))
    assert ppms[0] <= analytics19._KM_SCALE


def test_ndcg_discounts_are_the_frozen_log2_literals():
    for i, d in enumerate(analytics19._NDCG_DISC, start=1):
        assert d == round(1e9 / math.log2(i + 1))
    assert analytics19._NDCG_PREFIX[0] == analytics19._NDCG_DISC[0]
    assert analytics19._NDCG_PREFIX[-1] == sum(analytics19._NDCG_DISC)


def test_ndcg_bounds_and_consistency_with_precision(spark):
    (r,) = _run(spark, "retrieval_eval_ndcg")
    assert 0 <= r.dcg_e9 <= r.idcg_e9
    assert r.ndcg_permille is None or 0 <= r.ndcg_permille <= 1000
    # binary relevance: dcg>0 iff at least one top-10 hit, which is
    # exactly the precision key's hits_at10 > 0
    from data_pipeline_bigquery_spark.queries import evalops

    (p,) = evalops.QUERIES["retrieval_eval_precision"].fn(
        spark, SF_DIR
    ).collect()
    assert (r.dcg_e9 > 0) == (p.hits_at10 > 0)
    assert r.n_relevant == p.n_relevant
    # a perfect top-10 against >=10 relevant docs would be exactly 1000
    if p.hits_at10 == 10 and r.n_relevant >= 10:
        assert r.ndcg_permille == 1000


def test_pvm_bridge_telescopes_and_matches_direct_sums(spark):
    rows = _run(spark, "price_volume_mix_bridge")
    assert rows
    con = duckdb.connect()
    direct = {
        rf: (r1, r2, q1, q2)
        for rf, r1, r2, q1, q2 in con.sql(
            f"""
            SELECT l_returnflag,
              coalesce(sum(CAST(floor(l_extendedprice*(1-l_discount)*100+0.5)
                AS BIGINT)) FILTER (WHERE l_shipdate < TIMESTAMP
                '{analytics19._PVM_CUTOFF}'), 0),
              coalesce(sum(CAST(floor(l_extendedprice*(1-l_discount)*100+0.5)
                AS BIGINT)) FILTER (WHERE l_shipdate >= TIMESTAMP
                '{analytics19._PVM_CUTOFF}'), 0),
              coalesce(sum(CAST(floor(l_quantity+0.5) AS BIGINT))
                FILTER (WHERE l_shipdate < TIMESTAMP
                '{analytics19._PVM_CUTOFF}'), 0),
              coalesce(sum(CAST(floor(l_quantity+0.5) AS BIGINT))
                FILTER (WHERE l_shipdate >= TIMESTAMP
                '{analytics19._PVM_CUTOFF}'), 0)
            FROM '{SF_DIR}/lineitem.parquet' GROUP BY 1
            """
        ).fetchall()
    }
    for r in rows:
        r1, r2, q1, q2 = direct[r.l_returnflag]
        assert (r.r1_cents, r.r2_cents, r.q1, r.q2) == (r1, r2, q1, q2)
        price = r2 * q1 - r1 * q2
        volume = r1 * (q2 - q1)
        # the bridge telescopes exactly: price + volume == ΔR · Q1
        assert price + volume == (r2 - r1) * q1
        def _dir(v, stem):
            return (
                f"{stem}_up" if v > 0
                else f"{stem}_down" if v < 0 else f"{stem}_flat"
            )
        assert r.price_direction == _dir(price, "price")
        assert r.volume_direction == _dir(volume, "volume")


def test_seasonal_decompose_is_additive_and_edges_are_null(spark):
    rows = _run(spark, "seasonal_decompose_additive")
    assert len(rows) >= 7
    # full-window trend: exactly the first 3 and last 3 rows are NULL
    for r in rows[:3] + rows[-3:]:
        assert r.trend_mc is None and r.residual_mc is None
    interior = rows[3:-3]
    assert all(r.trend_mc is not None for r in interior)
    # additivity: value*1000 == trend + seasonal + residual, exactly
    for r in interior:
        assert r.cents * 1000 == r.trend_mc + r.seasonal_mc + r.residual_mc
    # trend recompute on one interior row
    cents = [r.cents for r in rows]
    i = 5
    assert rows[i].trend_mc == math.floor(
        sum(cents[i - 3 : i + 4]) * 1000.0 / 7.0
    )


def test_batch19_lineage_cuts_are_real(spark):
    from data_pipeline_bigquery_spark.plans.audit import assert_lineage_cut

    for key in ("retrieval_eval_ndcg", "seasonal_decompose_additive"):
        assert_lineage_cut(analytics19.QUERIES[key].fn(spark, SF_DIR))


def test_demand_pattern_quadrants_match_float_recompute(spark):
    rows = _run(spark, "demand_pattern_classification")
    assert rows
    seen = set()
    for r in rows:
        if r.n_demands < 2:
            assert r.pattern == "insufficient"
            assert r.adi_permille is None and r.cv2_permille is None
            continue
        # float recompute, trusted away from the exact cutoffs
        adi = r.span_days / (r.n_demands - 1)
        mean = r.sum_cents / r.n_demands
        var = r.sum_sq_cents / r.n_demands - mean * mean
        cv2 = var / (mean * mean)
        if abs(adi - 1.32) > 1e-9 and abs(cv2 - 0.49) > 1e-9:
            expect = {
                (True, True): "lumpy",
                (True, False): "intermittent",
                (False, True): "erratic",
                (False, False): "smooth",
            }[(adi >= 1.32, cv2 >= 0.49)]
            assert r.pattern == expect, (r.user_id, adi, cv2)
        seen.add(r.pattern)
    assert seen <= {
        "smooth",
        "intermittent",
        "erratic",
        "lumpy",
        "insufficient",
    }
