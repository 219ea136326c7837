"""Evalops semantic tests: hash parity lives in the oracle sweep;
these pin the statistics against an independent in-memory model
(pure-Python CUPED on the raw fixture) and the report invariants."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.queries import evalops
from tests.conftest import SF_DIR


def _run(spark, key, sf=SF_DIR):
    return evalops.QUERIES[key].fn(spark, sf).collect()


def _arm(user_id: int) -> int:
    h = hashlib.md5(str(user_id).encode()).hexdigest()[:7]
    return int(h, 16) % 2


def test_cuped_matches_pure_python_model(spark):
    import duckdb

    rows = duckdb.sql(
        f"select user_id, ts, value from '{SF_DIR}/events.parquet'"
    ).fetchall()
    agg: dict[int, list[int]] = {}
    for uid, ts, value in rows:
        cents = int(value * 100 + 0.5)  # floor(v*100+0.5), v >= 0
        xy = agg.setdefault(uid, [0, 0])
        xy[0 if ts.day <= 15 else 1] += cents
    n = len(agg)
    sx = sum(v[0] for v in agg.values())
    sy = sum(v[1] for v in agg.values())
    sxy = sum(v[0] * v[1] for v in agg.values())
    sxx = sum(v[0] * v[0] for v in agg.values())
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    arms = {uid: _arm(uid) for uid in agg}
    n_c = sum(1 for a in arms.values() if a == 0)
    n_t = n - n_c
    mean = lambda a, i: (
        sum(v[i] for u, v in agg.items() if arms[u] == a)
        / (n_c if a == 0 else n_t)
    )
    lift_raw = mean(1, 1) - mean(0, 1)
    lift_cuped = lift_raw - theta * (mean(1, 0) - mean(0, 0))

    out = _run(spark, "cuped_adjusted_lift")[0]
    assert (out.n_control, out.n_treatment) == (n_c, n_t)
    assert out.theta == pytest.approx(theta, abs=1e-9)
    assert out.lift_raw_cents == pytest.approx(lift_raw, abs=1e-6)
    assert out.lift_cuped_cents == pytest.approx(lift_cuped, abs=1e-6)


def test_backtest_window_sizes_and_seasonal_edge(spark):
    rows = {r.model: r for r in _run(spark, "forecast_backtest_mae")}
    # 30-day fixture series: naive scores 29 origins, seasonal 23
    assert rows["naive"].n_days == rows["seasonal"].n_days + 6
    for r in rows.values():
        assert r.mae_milli == r.total_abs_err * 1000 // r.n_days


def test_expectations_report_shape_and_soft_cap_fires(spark):
    rows = {r.rule: r for r in _run(spark, "data_expectations_report")}
    assert set(rows) == set(evalops._EXPECTATION_RULES)
    assert all(r.n_checked == rows["orderkey_not_null"].n_checked
               for r in rows.values())
    # the soft cap is the one rule designed to fire on the fixtures
    assert rows["totalprice_below_soft_cap"].n_violations > 0
    assert rows["totalprice_below_soft_cap"].passed == 0
    for rule in ("orderkey_not_null", "orderkey_unique",
                 "orderstatus_in_set", "custkey_references_customer"):
        assert rows[rule].n_violations == 0 and rows[rule].passed == 1


def test_retrieval_eval_consistency(spark):
    r = _run(spark, "retrieval_eval_precision")[0]
    assert 0 <= r.hits_at10 <= 10
    assert r.precision_at10_permille == r.hits_at10 * 100
    assert 0 <= r.recall_at10_permille <= 1000
    assert r.n_relevant >= r.hits_at10


def test_uplift_segments_partition_ab_totals(spark):
    from data_pipeline_bigquery_spark.queries import analytics9

    sf = "/root/testdata/sf0.01"
    seg = _run(spark, "uplift_by_segment", sf)
    ab = analytics9.QUERIES["ab_test_lift"].fn(spark, sf).collect()[0]
    assert sum(r.n_control for r in seg) == ab.n_control
    assert sum(r.n_treatment for r in seg) == ab.n_treatment
    assert sum(r.conv_control for r in seg) == ab.conv_control
    assert sum(r.conv_treatment for r in seg) == ab.conv_treatment


def test_calibration_bins_partition_corpus(spark):
    rows = _run(spark, "score_calibration_bins")
    import duckdb

    n_docs = duckdb.sql(
        f"select count(*) from '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 0 <= r.bin <= 9
        assert 0 <= r.cascade_pass_permille <= 1000
        # the bin's mean score must sit inside the bin's range (millis)
        assert r.bin * 100 <= r.mean_score_millis <= (r.bin + 1) * 100
