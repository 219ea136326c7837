"""Batch-20 semantic tests: independent recomputation of the delta-CI
algebra, the Bhattacharyya bounds, the Simpson sign audit, the breaks
partition, and the Chapman estimator — the oracle sweep proves the
engines AGREE; these prove the shared logic is RIGHT."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from data_pipeline_bigquery_spark.queries import analytics20
from tests.conftest import SF_DIR


def _run(spark, key, sf=SF_DIR):
    return analytics20.QUERIES[key].fn(spark, sf).collect()


def test_delta_ci_matches_numpy_user_grain_recompute(spark):
    rows = _run(spark, "ratio_metric_delta_ci")
    assert {r.arm for r in rows} == {0, 1}
    con = duckdb.connect()
    users = con.sql(
        f"""
        SELECT user_id,
               coalesce(sum(CASE WHEN event_type = 'purchase'
                 THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END), 0) AS y,
               count(*) AS x,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))
                 AS BIGINT) % 2 AS arm
        FROM '{SF_DIR}/events.parquet' GROUP BY user_id
        """
    ).fetchall()
    by_arm = defaultdict(list)
    for _, y, x, arm in users:
        by_arm[arm].append((int(y), int(x)))
    for r in rows:
        pts = by_arm[r.arm]
        n = len(pts)
        sy, sx = sum(y for y, _ in pts), sum(x for _, x in pts)
        assert (r.n_users, r.sum_y_cents, r.sum_x_events) == (n, sy, sx)
        ratio = sy / sx
        assert math.isclose(r.ratio_cents_per_event, ratio, rel_tol=1e-12)
        # direct definition of the variance: sample var of y - R*x
        resid = [(y - ratio * x) for y, x in pts]
        s2 = sum(v * v for v in resid) / (n - 1)
        se = math.sqrt(s2 / n) / (sx / n)
        assert math.isclose(r.se, se, rel_tol=1e-9)
        assert math.isclose(r.ci_lo, ratio - 1.96 * se, rel_tol=1e-9)
        assert math.isclose(r.ci_hi, ratio + 1.96 * se, rel_tol=1e-9)
        assert r.ci_lo <= r.ratio_cents_per_event <= r.ci_hi


def test_bhattacharyya_bounds_identity_and_float_recompute(spark):
    rows = _run(spark, "source_similarity_bhattacharyya")
    srcs = set()
    for r in rows:
        srcs.add(r.src_a)
        srcs.add(r.src_b)
        assert 0 <= r.bc_e9 <= 10**9
        assert r.bc_permille == r.bc_e9 // 10**6
    # every unordered source pair appears exactly once
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
    # float recompute of one pair (floor-per-term tolerance ≤ n_terms)
    r = max(rows, key=lambda r: r.n_shared_terms)
    con = duckdb.connect()
    counts = {}
    for src in (r.src_a, r.src_b):
        got = con.sql(
            f"""
            SELECT token, count(*) FROM (
              SELECT unnest(string_split(text, ' ')) AS token
              FROM '{SF_DIR}/documents.parquet' WHERE source = '{src}')
            GROUP BY 1
            """
        ).fetchall()
        counts[src] = dict(got)
    ca, cb = counts[r.src_a], counts[r.src_b]
    na, nb = sum(ca.values()), sum(cb.values())
    assert (r.n_tokens_a, r.n_tokens_b) == (na, nb)
    shared = set(ca) & set(cb)
    assert r.n_shared_terms == len(shared)
    bc = sum(math.sqrt(ca[t] * cb[t] / (na * nb)) for t in shared)
    assert r.bc_e9 <= bc * 1e9 < r.bc_e9 + len(shared) + 1


def test_simpson_signs_match_exact_fraction_recompute(spark):
    rows = _run(spark, "simpsons_paradox_audit")
    by_key = {r.group_key: r for r in rows}
    assert "ALL" in by_key
    pooled = by_key["ALL"]
    assert pooled.pooled_assoc == pooled.assoc
    assert pooled.simpson_flag is False
    # pooled moments are the stratum sums
    strata = [r for r in rows if r.group_key != "ALL"]
    assert pooled.n == sum(r.n for r in strata)
    assert pooled.sum_xy == sum(r.sum_xy for r in strata)
    for r in rows:
        cov = int(r.n) * int(r.sum_xy) - int(r.sum_x) * int(r.sum_y)
        assert int(r.cov_sign) == (cov > 0) - (cov < 0)
        expect = "positive" if cov > 0 else "negative" if cov < 0 else "none"
        assert r.assoc == expect
        if r.group_key != "ALL":
            assert r.pooled_assoc == pooled.assoc
            assert r.simpson_flag == (
                r.assoc != pooled.assoc
                and "none" not in (r.assoc, pooled.assoc)
            )


def test_natural_breaks_partition_customers_into_ordered_bands(spark):
    rows = _run(spark, "natural_breaks_segmentation")
    con = duckdb.connect()
    (n_cust,) = con.sql(
        f"SELECT count(DISTINCT o_custkey) FROM '{SF_DIR}/orders.parquet'"
    ).fetchone()
    assert sum(r.n_customers for r in rows) == n_cust
    assert [r.band for r in rows] == sorted(r.band for r in rows)
    assert len(rows) <= analytics20._N_BREAKS + 1
    # bands are disjoint, ordered intervals
    for a, b in zip(rows, rows[1:]):
        assert a.max_cents < b.min_cents
    for r in rows:
        assert r.min_cents <= r.max_cents
    # independent recompute of the break boundaries
    spends = sorted(
        con.sql(
            f"""SELECT CAST(coalesce(sum(CAST(floor(o_totalprice*100+0.5)
            AS BIGINT)), 0) AS BIGINT) FROM '{SF_DIR}/orders.parquet'
            GROUP BY o_custkey"""
        ).fetchall()
    )
    vals = [s for (s,) in spends]
    gaps = sorted(
        (
            (b - a, b)
            for a, b in zip(vals, vals[1:])
            if b - a > 0
        ),
        key=lambda t: (-t[0], t[1]),
    )
    bounds = sorted(b for _, b in gaps[: analytics20._N_BREAKS])
    expect = Counter(
        1 + sum(1 for b in bounds if b <= v) for v in vals
    )
    assert {r.band: r.n_customers for r in rows} == dict(expect)


def test_batch20_lineage_cuts_are_real(spark):
    from data_pipeline_bigquery_spark.plans.audit import assert_lineage_cut

    for key in (
        "source_similarity_bhattacharyya",
        "natural_breaks_segmentation",
        "simpsons_paradox_audit",
    ):
        assert_lineage_cut(analytics20.QUERIES[key].fn(spark, SF_DIR))


def test_chapman_estimate_matches_duckdb_recompute(spark):
    (r,) = _run(spark, "capture_recapture_dup_estimate")
    con = duckdb.connect()
    n1, n2, ovl = con.sql(
        f"""
        WITH d AS (SELECT md5(text) AS k1, n_chars, substr(text,1,24) AS p
                   FROM '{SF_DIR}/documents.parquet'
                   WHERE text IS NOT NULL),
        f AS (SELECT CASE WHEN count(*) OVER (PARTITION BY k1) > 1
                     THEN 1 ELSE 0 END AS fa,
                     CASE WHEN count(*) OVER (PARTITION BY n_chars, p) > 1
                     THEN 1 ELSE 0 END AS fb FROM d)
        SELECT sum(fa), sum(fb), sum(fa*fb) FROM f
        """
    ).fetchone()
    assert (r.n_dup_exact, r.n_dup_fingerprint, r.n_overlap) == (
        n1,
        n2,
        ovl,
    )
    # overlap can't exceed either catch; estimate can't undershoot the
    # union of the two catches by more than the estimator's -1 bias
    assert r.n_overlap <= min(r.n_dup_exact, r.n_dup_fingerprint)
    chapman = (n1 + 1) * (n2 + 1) / (ovl + 1) - 1
    assert math.isclose(r.chapman_estimate, chapman, rel_tol=1e-12)
    if chapman > 0:
        assert r.coverage_exact_permille == math.floor(
            n1 * 1000.0 / chapman
        )
