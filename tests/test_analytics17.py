"""Batch-17 semantic tests: the trend forecast against a pure-Python
EWMA replay, backfill ranges against a brute-force day-set scan, and
the FD audit against a Counter replay."""

from __future__ import annotations

from collections import defaultdict

from data_pipeline_bigquery_spark.queries import analytics17
from tests.conftest import SF_DIR


def _run(spark, key, sf=SF_DIR):
    return analytics17.QUERIES[key].fn(spark, sf).collect()


def _shift_sum_py(vals):
    """Python replay of the dyadic closed form: Σ a_i·2^(29−L+i)."""
    L = len(vals)
    return sum(a * (1 << (29 - L + i + 1)) for i, a in enumerate(vals))


def test_trend_forecast_matches_python_replay(spark):
    import duckdb

    rows = duckdb.sql(f"""
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(coalesce(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)), 0)
                    AS BIGINT) AS cents
        FROM '{SF_DIR}/events.parquet'
        WHERE event_type = 'purchase' GROUP BY 1, 2 HAVING cents > 0
    """).fetchall()
    series = defaultdict(list)
    for uid, d, cents in rows:
        series[uid].append((d, cents))
    out = {r.user_id: r for r in _run(spark, "ewma_trend_forecast")}
    assert set(out) == set(series)
    for uid, pts in series.items():
        pts.sort()
        cents = [c for _, c in pts]
        r = out[uid]
        assert r.n_days == len(cents)
        level = _shift_sum_py(cents[-30:])
        assert r.level30 == level
        if len(cents) >= 2:
            dz = [b - a for a, b in zip(cents, cents[1:])][-30:]
            trend = _shift_sum_py(dz)
            assert r.trend30 == trend
            assert r.forecast7 == (level + 7 * trend) / 2**30
        else:
            assert r.trend30 is None and r.forecast7 is None


def test_backfill_ranges_match_brute_force(spark):
    import duckdb

    rows = duckdb.sql(f"""
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        FROM '{SF_DIR}/events.parquet' WHERE event_type = 'purchase'
    """).fetchall()
    days = defaultdict(set)
    for uid, d in rows:
        days[uid].add(d)
    got = {
        (r.user_id, r.gap_start, r.gap_end): r.n_days_missing
        for r in _run(spark, "missing_date_backfill_ranges")
    }
    import datetime as dt

    expected = {}
    for uid, ds in days.items():
        ordered = sorted(ds)
        for a, b in zip(ordered, ordered[1:]):
            missing = (b - a).days - 1
            if missing > analytics17._MIN_GAP_DAYS:
                expected[
                    (uid, a + dt.timedelta(days=1), b - dt.timedelta(days=1))
                ] = missing
    assert got == expected
    # every emitted range is truly empty of purchase days
    for (uid, start, end), n in got.items():
        span = {start + dt.timedelta(days=i) for i in range(n)}
        assert span.isdisjoint(days[uid])


def test_fd_audit_matches_counter_replay(spark):
    import duckdb

    out = {r.fd: r for r in _run(spark, "functional_dependency_audit")}
    assert len(out) == len(analytics17._FDS)
    for label, table, det, dep in analytics17._FDS:
        pairs = duckdb.sql(
            f"SELECT {det}, count(DISTINCT {dep}) FROM "
            f"'{SF_DIR}/{table}.parquet' GROUP BY 1"
        ).fetchall()
        r = out[label]
        assert r.n_determinants == len(pairs)
        viol = sum(1 for _, nd in pairs if nd > 1)
        assert r.n_violating == viol
        assert r.violation_permille == viol * 1000 // len(pairs)


def test_degree_distribution_partitions_inventory(spark):
    out = _run(spark, "copurchase_degree_distribution")
    import duckdb

    n_parts = duckdb.sql(
        f"SELECT count(DISTINCT l_partkey) FROM '{SF_DIR}/lineitem.parquet'"
    ).fetchone()[0]
    assert sum(r.n_parts for r in out) == n_parts  # buckets partition parts
    assert all(r.n_parts > 0 for r in out)


def test_freshness_lag_consistent(spark):
    out = _run(spark, "freshness_sla_audit")
    assert any(r.lag_minutes == 0 for r in out)  # the freshest feed itself
    assert all(r.lag_minutes >= 0 for r in out)
    for r in out:
        assert r.sla_breach == (r.lag_minutes > analytics17._SLA_MINUTES)
