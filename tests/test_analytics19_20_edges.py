"""Edge-regime tests for batches 19/20: degenerate inputs the fixture
corpus never produces (all-censored cohorts, boundary-exact cutoffs, a
constructed Simpson reversal, empty detector catches, sub-window
series, single-user arms).  Each case also runs the ORACLE on the same
synthetic dir, so both engines traverse their guard paths together —
the fixture sweep alone never reaches these branches."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_pipeline_bigquery_spark.catalog import FIXTURE_TABLES
from data_pipeline_bigquery_spark.queries import analytics19, analytics20
from tests.conftest import SF_DIR
from tests.oracle_compare import compare


def _edge_dir(tmp_path, **tables: pa.Table) -> str:
    """Fixture dir = symlinks to SF_DIR for every table, with the
    given tables replaced by synthetic single-file parquet."""
    d = tmp_path / "edge_sf"
    d.mkdir(exist_ok=True)
    for t in FIXTURE_TABLES:
        dst = d / f"{t}.parquet"
        if t in tables:
            pq.write_table(tables[t], str(dst))
        elif not dst.exists():
            os.symlink(os.path.join(SF_DIR, f"{t}.parquet"), str(dst))
    return str(d)


def _orders(rows):
    """rows: (orderkey, custkey, totalprice, orderdate)."""
    return pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array(["F"] * len(rows)),
            "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
            "o_orderdate": pa.array(
                [r[3] for r in rows], pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(["1-URGENT"] * len(rows)),
        }
    )


def _events(rows):
    """rows: (event_id, ts, user_id, event_type, value)."""
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )


def _documents(texts, sources=None):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(sources or ["src0"] * len(texts)),
            "n_chars": pa.array(
                [len(t) if t is not None else 0 for t in texts], pa.int64()
            ),
        }
    )


def _lineitem(rows):
    """rows: (orderkey, returnflag, quantity, extendedprice, discount)."""
    n = len(rows)
    return pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([1] * n, pa.int64()),
            "l_suppkey": pa.array([1] * n, pa.int64()),
            "l_linenumber": pa.array(list(range(1, n + 1)), pa.int32()),
            "l_quantity": pa.array([r[2] for r in rows], pa.float64()),
            "l_extendedprice": pa.array([r[3] for r in rows], pa.float64()),
            "l_discount": pa.array([r[4] for r in rows], pa.float64()),
            "l_tax": pa.array([0.0] * n, pa.float64()),
            "l_returnflag": pa.array([r[1] for r in rows]),
            "l_linestatus": pa.array(["F"] * n),
            "l_shipdate": pa.array(
                [dt.datetime(1996, 1, 1)] * n, pa.timestamp("us")
            ),
        }
    )


def _day(n):
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=n)


def _parity(spark, spec, d):
    probs = compare(spec.fn(spark, d), spec.oracle, d)
    assert not probs, probs


def test_km_all_censored_and_horizon_cap(spark, tmp_path):
    # custs 1-5: one order each (censored at dmax); cust 6 repurchases
    # 400 days later (beyond the 12-bucket horizon -> administratively
    # censored, NOT an event); cust 7 repurchases at day 35 (bucket 1
    # event).  dmax = day 400.
    rows = [
        (1, 1, 100.0, _day(0)),
        (2, 2, 100.0, _day(10)),
        (3, 3, 100.0, _day(40)),
        (4, 4, 100.0, _day(100)),
        (5, 5, 100.0, _day(400)),
        (6, 6, 100.0, _day(0)),
        (7, 6, 100.0, _day(400)),
        (8, 7, 100.0, _day(0)),
        (9, 7, 100.0, _day(35)),
    ]
    d = _edge_dir(tmp_path, orders=_orders(rows))
    spec = analytics19.QUERIES["kaplan_meier_retention"]
    out = {r.bucket: r for r in spec.fn(spark, d).collect()}
    # the only event is cust 7 at bucket 1
    assert sum(r.events for r in out.values()) == 1
    assert out[1].events == 1
    # cust 6: dur 400 -> bucket 13 > cap -> censored at 12
    assert out[12].events == 0 and out[12].censored >= 1
    # survival: flat 1e6 until the bucket-1 event, then (n-d)//n
    assert out[0].survival_ppm == 1_000_000
    n1 = out[1].n_risk
    assert out[1].survival_ppm == 1_000_000 * (n1 - 1) // n1
    assert out[12].survival_ppm == out[1].survival_ppm  # no later events
    _parity(spark, spec, d)


def test_demand_pattern_boundary_adi_is_inclusive(spark, tmp_path):
    # user 1: 26 equal-size demand days, span 33 -> ADI = 33/25 = 1.32
    # EXACTLY; the >= cutoff must fire -> intermittent (CV^2 = 0).
    # user 2: dense days, wildly varying sizes -> erratic.
    rows, eid = [], 0
    for day in list(range(25)) + [33]:
        rows.append((eid, _day(day), 1, "purchase", 10.00))
        eid += 1
    for day, dollars in ((0, 1.00), (1, 100.00), (2, 1.00)):
        rows.append((eid, _day(day), 2, "purchase", dollars))
        eid += 1
    d = _edge_dir(tmp_path, events=_events(rows))
    spec = analytics19.QUERIES["demand_pattern_classification"]
    out = {r.user_id: r for r in spec.fn(spark, d).collect()}
    assert out[1].pattern == "intermittent"
    assert out[1].adi_permille == 1320  # 33*1000 // 25
    assert out[1].cv2_permille == 0
    assert out[2].pattern == "erratic"
    _parity(spark, spec, d)


def test_simpson_constructed_reversal_flags_both_strata(spark, tmp_path):
    # within each stratum (x, y) covaries NEGATIVELY; pooled across the
    # level shift it covaries POSITIVELY -> both strata flag
    rows = [
        (1, "A", 2.0, 100.0, 0.001),
        (2, "A", 1.0, 100.0, 0.002),
        (3, "R", 20.0, 100.0, 0.010),
        (4, "R", 19.0, 100.0, 0.011),
    ]
    d = _edge_dir(tmp_path, lineitem=_lineitem(rows))
    spec = analytics20.QUERIES["simpsons_paradox_audit"]
    out = {r.group_key: r for r in spec.fn(spark, d).collect()}
    assert out["ALL"].assoc == "positive"
    assert out["A"].assoc == "negative" and out["A"].simpson_flag
    assert out["R"].assoc == "negative" and out["R"].simpson_flag
    _parity(spark, spec, d)


def test_natural_breaks_uniform_spend_is_one_band(spark, tmp_path):
    rows = [(k, k, 500.0, _day(k)) for k in range(1, 9)]
    d = _edge_dir(tmp_path, orders=_orders(rows))
    spec = analytics20.QUERIES["natural_breaks_segmentation"]
    out = spec.fn(spark, d).collect()
    assert len(out) == 1
    assert out[0].band == 1 and out[0].n_customers == 8
    assert out[0].min_cents == out[0].max_cents == 50000
    _parity(spark, spec, d)


def test_chapman_no_duplicates_yields_zero_and_null(spark, tmp_path):
    # pairwise-distinct texts AND lengths: both detectors catch nothing
    texts = ["a" * (10 + i) + str(i) for i in range(6)]
    d = _edge_dir(tmp_path, documents=_documents(texts))
    spec = analytics20.QUERIES["capture_recapture_dup_estimate"]
    (r,) = spec.fn(spark, d).collect()
    assert (r.n_dup_exact, r.n_dup_fingerprint, r.n_overlap) == (0, 0, 0)
    assert r.chapman_estimate == 0.0
    assert r.coverage_exact_permille is None  # nullif(0) on both engines
    _parity(spark, spec, d)


def test_seasonal_under_seven_days_is_all_null(spark, tmp_path):
    # 5 observed days: no full 7-row window exists -> every trend NULL,
    # every weekday group has zero detrended rows -> the rule-9 count
    # guard must fire on BOTH engines (ANSI Spark would throw without it)
    rows = [(i, _day(i), 1, "view", 10.0) for i in range(5)]
    d = _edge_dir(tmp_path, events=_events(rows))
    spec = analytics19.QUERIES["seasonal_decompose_additive"]
    out = spec.fn(spark, d).collect()
    assert len(out) == 5
    for r in out:
        assert r.trend_mc is None
        assert r.seasonal_mc is None
        assert r.residual_mc is None
        assert r.cents == 1000
    _parity(spark, spec, d)


def test_delta_ci_single_user_arm_yields_null_se(spark, tmp_path):
    rows = [
        (0, _day(0), 1, "purchase", 50.0),
        (1, _day(1), 1, "view", 1.0),
    ]
    d = _edge_dir(tmp_path, events=_events(rows))
    spec = analytics20.QUERIES["ratio_metric_delta_ci"]
    (r,) = spec.fn(spark, d).collect()
    assert r.n_users == 1 and r.sum_x_events == 2
    assert r.ratio_cents_per_event == 2500.0
    assert r.se is None and r.ci_lo is None and r.ci_hi is None
    _parity(spark, spec, d)


def test_bhattacharyya_single_source_is_empty(spark, tmp_path):
    d = _edge_dir(
        tmp_path, documents=_documents(["alpha beta", "beta gamma"])
    )
    spec = analytics20.QUERIES["source_similarity_bhattacharyya"]
    assert spec.fn(spark, d).count() == 0
    _parity(spark, spec, d)


def test_ndcg_zero_relevant_corpus(spark, tmp_path):
    # every doc holds at most ONE of the three query terms -> the
    # >=2-of-3 judgment marks nothing relevant -> idcg 0, ndcg NULL
    texts = ["merge alpha beta", "scan gamma", "window delta", "eps zeta"]
    d = _edge_dir(tmp_path, documents=_documents(texts))
    spec = analytics19.QUERIES["retrieval_eval_ndcg"]
    (r,) = spec.fn(spark, d).collect()
    assert r.n_relevant == 0
    assert r.dcg_e9 == 0 and r.idcg_e9 == 0
    assert r.ndcg_permille is None
    _parity(spark, spec, d)


def test_pvm_one_sided_period(spark, tmp_path):
    # all volume ships in H2: R1 = Q1 = 0 -> both effect numerators are
    # exactly 0 (flat/flat) and delta carries the whole move
    rows = [
        (1, "N", 5.0, 200.0, 0.0),
        (2, "N", 3.0, 100.0, 0.0),
    ]
    t = _lineitem(rows)
    # shipdates default to 1996 (H1) — move them into H2
    t = t.set_column(
        t.schema.get_field_index("l_shipdate"),
        "l_shipdate",
        pa.array([dt.datetime(1999, 1, 1)] * 2, pa.timestamp("us")),
    )
    d = _edge_dir(tmp_path, lineitem=t)
    spec = analytics19.QUERIES["price_volume_mix_bridge"]
    (r,) = spec.fn(spark, d).collect()
    assert (r.r1_cents, r.q1) == (0, 0)
    assert r.delta_cents == r.r2_cents == 30000
    assert (r.price_direction, r.volume_direction) == (
        "price_flat",
        "volume_flat",
    )
    _parity(spark, spec, d)
