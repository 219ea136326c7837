"""Edge-regime tests for batches 17/18 (all in the r08 driver window):
boundary-exact SLA lag and backfill gaps, single-demand forecasting,
single-item copurchase graphs, empty-delta view maintenance, one-sided
elasticity, and empty-input contribution bounding — each case runs the
ORACLE on the same synthetic dir (the batch-19/20 edge-harness
pattern)."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa

from data_pipeline_bigquery_spark.queries import analytics17, analytics18
from tests.test_analytics19_20_edges import (
    _edge_dir,
    _events,
    _lineitem,
    _orders,
    _parity,
)


def _day(n, hour=9, minute=0):
    return dt.datetime(2024, 1, 1, hour, minute) + dt.timedelta(days=n)


def test_ewma_single_demand_day_has_no_trend(spark, tmp_path):
    rows = [
        (0, _day(0), 1, "purchase", 50.00),
        (1, _day(0), 1, "view", 1.0),
        (2, _day(0), 2, "purchase", 10.00),
        (3, _day(3), 2, "purchase", 20.00),
    ]
    d = _edge_dir(tmp_path, events=_events(rows))
    spec = analytics17.QUERIES["ewma_trend_forecast"]
    out = {r.user_id: r for r in spec.fn(spark, d).collect()}
    # single demand day: level is the lone size << 29, trend/forecast NULL
    assert out[1].n_days == 1
    assert out[1].level30 == 5000 << 29
    assert out[1].trend30 is None and out[1].forecast7 is None
    # two days: trend = delta << 29, forecast exact dyadic scaling
    assert out[2].n_days == 2
    lvl = (1000 << 28) + (2000 << 29)
    trd = 1000 << 29
    assert (out[2].level30, out[2].trend30) == (lvl, trd)
    assert out[2].forecast7 == (lvl + 7 * trd) / 1073741824.0
    _parity(spark, spec, d)


def test_freshness_sla_boundary_is_strict(spark, tmp_path):
    # freshest feed at minute 0; 'click' exactly 60 min behind (NOT a
    # breach — the flag is strictly >), 'error' 61 min behind (breach)
    rows = [
        (0, _day(5, hour=12, minute=0), 1, "purchase", 1.0),
        (1, _day(5, hour=11, minute=0), 1, "click", 1.0),
        (2, _day(5, hour=10, minute=59), 1, "error", 1.0),
    ]
    d = _edge_dir(tmp_path, events=_events(rows))
    spec = analytics17.QUERIES["freshness_sla_audit"]
    out = {r.event_type: r for r in spec.fn(spark, d).collect()}
    assert out["purchase"].lag_minutes == 0
    assert out["click"].lag_minutes == 60 and not out["click"].sla_breach
    assert out["error"].lag_minutes == 61 and out["error"].sla_breach
    _parity(spark, spec, d)


def test_backfill_gap_boundary(spark, tmp_path):
    # user 1: purchases on days 0 and 4 (3 missing days — NOT a range,
    # the planner only emits gaps of MORE than _MIN_GAP_DAYS=3);
    # user 2: days 0 and 5 (4 missing days — exactly one range)
    rows = [
        (0, _day(0), 1, "purchase", 1.0),
        (1, _day(4), 1, "purchase", 1.0),
        (2, _day(0), 2, "purchase", 1.0),
        (3, _day(5), 2, "purchase", 1.0),
    ]
    d = _edge_dir(tmp_path, events=_events(rows))
    spec = analytics17.QUERIES["missing_date_backfill_ranges"]
    out = spec.fn(spark, d).collect()
    assert len(out) == 1
    (r,) = out
    assert r.user_id == 2 and r.n_days_missing == 4
    assert (r.gap_start, r.gap_end) == (
        _day(1).date(),
        _day(4).date(),
    )
    _parity(spark, spec, d)


def test_fd_audit_counts_planted_violation(spark, tmp_path):
    # custkey 1 maps to TWO priorities (violating); custkey 2 to one
    t = _orders(
        [
            (1, 1, 10.0, _day(0)),
            (2, 1, 10.0, _day(1)),
            (3, 2, 10.0, _day(2)),
        ]
    )
    t = t.set_column(
        t.schema.get_field_index("o_orderpriority"),
        "o_orderpriority",
        pa.array(["1-URGENT", "2-HIGH", "1-URGENT"]),
    )
    d = _edge_dir(tmp_path, orders=t)
    spec = analytics17.QUERIES["functional_dependency_audit"]
    out = {r.fd: r for r in spec.fn(spark, d).collect()}
    r = out["orders: o_custkey -> o_orderpriority"]
    assert (r.n_determinants, r.n_violating) == (2, 1)
    assert r.violation_permille == 500
    _parity(spark, spec, d)


def test_copurchase_all_single_item_baskets(spark, tmp_path):
    rows = [(k, "N", 1.0, 10.0, 0.0) for k in range(1, 6)]
    t = _lineitem(rows)
    # distinct parts per order (the writer defaults every l_partkey=1)
    t = t.set_column(
        t.schema.get_field_index("l_partkey"),
        "l_partkey",
        pa.array([10, 20, 30, 40, 50], pa.int64()),
    )
    d = _edge_dir(tmp_path, lineitem=t)
    spec = analytics17.QUERIES["copurchase_degree_distribution"]
    out = spec.fn(spark, d).collect()
    # no basket has two parts: every part lands in the zero bucket
    assert [(r.connectivity_bucket, r.n_parts) for r in out] == [("000", 5)]
    _parity(spark, spec, d)


def test_ivm_empty_delta_still_reconciles(spark, tmp_path):
    # every order before the IVM cutoff and no custkey % 97 == 0:
    # both deltas are EMPTY — maintained == unchanged must equal the
    # full recompute exactly
    rows = [(k, k, 100.0 + k, _day(k)) for k in range(1, 8)]
    d = _edge_dir(tmp_path, orders=_orders(rows))
    spec = analytics18.QUERIES["incremental_join_view_maintenance"]
    out = spec.fn(spark, d).collect()
    assert out and all(r.parity for r in out)
    _parity(spark, spec, d)


def test_elasticity_one_sided_history_is_undefined(spark, tmp_path):
    # all volume in H1: q2 = pc2 = 0 -> num = den = 0 -> 'undefined'
    rows = [
        (1, "N", 5.0, 200.0, 0.0),
        (2, "N", 3.0, 100.0, 0.0),
    ]
    d = _edge_dir(tmp_path, lineitem=_lineitem(rows))
    spec = analytics18.QUERIES["arc_price_elasticity"]
    for r in spec.fn(spark, d).collect():
        if r.q1 > 0:  # the brands our rows touch
            assert r.q2 == 0 and r.demand_class == "undefined"
            assert int(r.num_sign) == 0
            assert int(r.den_sign) == 0
    _parity(spark, spec, d)


def test_contribution_bounding_empty_orders(spark, tmp_path):
    d = _edge_dir(tmp_path, orders=_orders([]))
    spec = analytics18.QUERIES["contribution_bounding_curve"]
    out = {r.cap_label: r for r in spec.fn(spark, d).collect()}
    assert set(out) == {
        "cap_01",
        "cap_02",
        "cap_05",
        "cap_10",
        "unbounded",
    }
    for r in out.values():
        assert (r.n_kept_orders, r.kept_cents, r.total_cents) == (0, 0, 0)
        assert r.loss_permille is None  # nullif(0) on both engines
    _parity(spark, spec, d)
