"""Batch-22 pins: rolling actives, duplication shape, latency
quantiles, the 7x24 grid, and the shared Wilson generator."""

from __future__ import annotations

import math

from data_pipeline_bigquery_spark.queries import analytics22
from tests.conftest import SF_DIR


def _run(spark, key):
    return analytics22.QUERIES[key].fn(spark, SF_DIR).collect()


def test_rolling_actives_invariants(spark):
    rows = _run(spark, "rolling_7d_active_users")
    assert rows
    for r in rows:
        # DAU can never exceed the trailing-window actives
        assert 0 < r.dau <= r.wau_7d
        assert r.stickiness_permille == r.dau * 1000 // r.wau_7d
    # first observed day has WAU == DAU (no history before it)
    first = min(rows, key=lambda r: r.day)
    assert first.wau_7d == first.dau


def test_dup_distribution_partitions_the_corpus(spark):
    import duckdb

    rows = _run(spark, "dup_cluster_size_distribution")
    assert rows
    total = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/documents.parquet'"
        " WHERE text IS NOT NULL"
    ).fetchone()[0]
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        assert r.n_docs == r.cluster_size * r.n_clusters
        assert r.doc_share_permille == r.n_docs * 1000 // total


def test_order_latency_quantiles_ordered_and_nonnegative(spark):
    rows = _run(spark, "order_latency_by_priority")
    assert rows
    for r in rows:
        assert r.n_lines > 0
        assert 0 <= r.p50_days <= r.p90_days <= r.p99_days


def test_heatmap_shares_sum_per_weekday(spark):
    rows = _run(spark, "weekday_hour_activity_heatmap")
    assert rows
    by_wd: dict[int, list] = {}
    for r in rows:
        assert 0 <= r.weekday <= 6 and 0 <= r.hour_utc <= 23
        by_wd.setdefault(r.weekday, []).append(r)
    for wd, grp in by_wd.items():
        tot = sum(r.n_events for r in grp)
        for r in grp:
            assert r.weekday_share_permille == r.n_events * 1000 // tot


def test_wilson_bounds_match_scalar_formula(spark):
    rows = _run(spark, "supplier_return_rate_wilson")
    assert rows
    z = 1.96
    for r in rows[:10]:
        k, n = r.k, r.n
        assert 0 <= k <= n and n > 0
        rate = k / n
        denom = 1.0 + z * z / n
        center = rate + z * z / (2.0 * n)
        half = z * math.sqrt((rate * (1.0 - rate) + z * z / (4.0 * n)) / n)
        assert abs(r.return_rate - rate) < 1e-12
        assert abs(r.wilson_lo - (center - half) / denom) < 1e-9
        assert abs(r.wilson_hi - (center + half) / denom) < 1e-9
        assert r.wilson_lo <= r.return_rate <= r.wilson_hi


def test_wilson_generator_is_fixed_order_text():
    """The generator must be deterministic text (the cross-engine
    contract is string-level): same inputs, same strings, and the lo/hi
    forms differ ONLY in the +- sign."""
    from data_pipeline_bigquery_spark.queries.analytics7 import (
        wilson_bounds_sql,
    )

    a = wilson_bounds_sql("k", "n")
    b = wilson_bounds_sql("k", "n")
    assert a == b
    assert a["lo"].replace("- 1.96 * sqrt", "+ 1.96 * sqrt") == a["hi"]
