"""Batch-18 semantic tests: independent recomputation of the IVM
parity claim, the bounding curve, the elasticity classification, run
statistics, and the migration matrix — the oracle sweep proves the
engines AGREE; these prove the shared logic is RIGHT."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from data_pipeline_bigquery_spark.queries import analytics18
from tests.conftest import SF_DIR


def _run(spark, key, sf=SF_DIR):
    return analytics18.QUERIES[key].fn(spark, sf).collect()


def _cents(x):
    return math.floor(x * 100 + 0.5)


def test_ivm_parity_holds_and_totals_match_plain_join(spark):
    import duckdb

    rows = _run(spark, "incremental_join_view_maintenance")
    assert rows and all(r.parity for r in rows)
    # the full-recompute side must equal a directly computed join with
    # the customer update applied (independent of the delta algebra)
    got = {r.segment: (r.n_f, r.order_cents_f) for r in rows}
    mod = analytics18._IVM_DELTA_MOD
    exp = duckdb.sql(f"""
        SELECT c.c_mktsegment, count(*),
               sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
        FROM '{SF_DIR}/orders.parquet' o
        JOIN '{SF_DIR}/customer.parquet' c ON o.o_custkey = c.c_custkey
        GROUP BY 1
    """).fetchall()
    assert got == {seg: (n, cents) for seg, n, cents in exp}
    assert mod == 97  # the delta population the docstring documents


def test_contribution_curve_matches_python_replay(spark):
    import duckdb

    orders = duckdb.sql(
        f"SELECT o_custkey, o_orderkey, o_totalprice FROM "
        f"'{SF_DIR}/orders.parquet'"
    ).fetchall()
    per_cust = defaultdict(list)
    for ck, ok, tp in orders:
        per_cust[ck].append((-_cents(tp), ok))
    out = {r.cap_label: r for r in _run(spark, "contribution_bounding_curve")}
    total = sum(-c for lst in per_cust.values() for c, _ in lst)
    assert out["unbounded"].kept_cents == total
    assert out["unbounded"].loss_permille == 0
    for cap in analytics18._CAPS:
        kept = n = 0
        for lst in per_cust.values():
            top = sorted(lst)[:cap]
            n += len(top)
            kept += sum(-c for c, _ in top)
        r = out[f"cap_{cap:02d}"]
        assert (r.n_kept_orders, r.kept_cents) == (n, kept)
        assert r.loss_permille == (total - kept) * 1000 // total
    # monotone: a looser cap never loses more
    caps = sorted(analytics18._CAPS)
    for a, b in zip(caps, caps[1:]):
        assert (
            out[f"cap_{a:02d}"].loss_permille
            >= out[f"cap_{b:02d}"].loss_permille
        )


def test_elasticity_classification_matches_float_formula(spark):
    rows = _run(spark, "arc_price_elasticity")
    assert rows
    seen = Counter(r.demand_class for r in rows)
    for r in rows:
        q1, q2, pc1, pc2 = r.q1, r.q2, r.pc1, r.pc2
        num = (q2 - q1) * (pc1 * q2 + pc2 * q1)
        den = (pc2 * q1 - pc1 * q2) * (q1 + q2)
        assert int(r.num_sign) == (num > 0) - (num < 0)
        assert int(r.den_sign) == (den > 0) - (den < 0)
        if den == 0:
            assert r.demand_class == "undefined"
        else:
            # |E| > 1 ⟺ |num| > |den| — check against the float formula
            e = num / den
            expected = (
                "elastic"
                if abs(e) > 1
                else ("inelastic" if abs(e) < 1 else "unit")
            )
            assert r.demand_class == expected
    assert seen["elastic"] and seen["inelastic"]  # fixture spans both


def test_encoding_advisor_run_counts_match_replay(spark):
    import duckdb

    li = duckdb.sql(f"""
        SELECT l_orderkey, l_linenumber, l_partkey, l_returnflag, l_shipdate
        FROM '{SF_DIR}/lineitem.parquet'
        ORDER BY l_orderkey, l_linenumber, l_partkey, l_returnflag,
                 l_shipdate
    """).fetchall()
    runs = Counter()
    nd = defaultdict(set)
    prev_order, prev = None, {}
    for ok, ln, pk, rf, sd in li:
        vals = {"l_orderkey": ok, "l_partkey": pk,
                "l_returnflag": rf, "l_shipdate": sd}
        for c, v in vals.items():
            nd[c].add(v)
            if prev_order != ok or prev.get(c) != v:
                runs[c] += 1
        prev_order, prev = ok, vals
    out = {r.column_name: r for r in _run(spark, "column_encoding_advisor")}
    assert set(out) == set(analytics18._ENC_COLS)
    for c in analytics18._ENC_COLS:
        r = out[c]
        assert r.n_distinct == len(nd[c])
        assert r.n_runs == runs[c]
        assert r.n_rows == len(li)
    # the fixture exercises all three recommendations
    assert {r.recommendation for r in out.values()} == {
        "RLE", "DICT", "PLAIN"
    }


def test_migration_matrix_partitions_customers(spark):
    import duckdb

    rows = _run(spark, "segment_migration_matrix")
    n_custs = duckdb.sql(
        f"SELECT count(DISTINCT o_custkey) FROM '{SF_DIR}/orders.parquet'"
    ).fetchone()[0]
    assert sum(r.n_customers for r in rows) == n_custs
    # quartile classes per half are near-balanced (rank-rule thresholds)
    from_tot = Counter()
    for r in rows:
        from_tot[r.from_segment] += r.n_customers
    present = {k: v for k, v in from_tot.items() if k != "none"}
    assert set(present) == {"Q1", "Q2", "Q3", "Q4"}
    hi, lo = max(present.values()), min(present.values())
    assert hi - lo <= max(3, n_custs // 10)
