"""Batch-23 pins: RR estimator algebra + determinism, Pettitt on a
known step series, PR-curve counts, McNemar algebra, assortativity on
a hand graph, the phonetic key rule, and Kendall counts."""

from __future__ import annotations

import datetime as dt
from unittest import mock

import pytest
from pyspark.sql import Row

import data_pipeline_bigquery_spark.queries.analytics23 as a23
from tests.conftest import SF_DIR


def _run(spark, key):
    return a23.QUERIES[key].fn(spark, SF_DIR).collect()


def test_randomized_response_estimator_identity_and_determinism(spark):
    rows = _run(spark, "randomized_response_audit")
    assert rows
    total = rows[0].n_events
    for r in rows:
        assert r.n_events == total  # per-type n is the full stream
        assert r.est_count_x2 == 4 * r.reported_count - r.n_events
        assert r.est_error_x2 == r.est_count_x2 - 2 * r.true_count
    # md5 coins: a second run reports byte-identical counts
    again = {r.event_type: r.reported_count
             for r in _run(spark, "randomized_response_audit")}
    assert {r.event_type: r.reported_count for r in rows} == again
    # the estimator is actually close at fixture scale: the flip noise
    # has sd ~ sqrt(n·3/16); allow 5 sd
    import math

    for r in rows:
        assert abs(r.est_error_x2) <= 2 * 5 * math.sqrt(total * 3 / 16)


def test_pettitt_flags_the_known_step(spark):
    d0 = dt.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [
            Row(o_orderkey=i + 1, o_custkey=1, o_orderstatus="F",
                o_totalprice=v, o_orderdate=d0 + dt.timedelta(days=i),
                o_orderpriority="1-URGENT")
            for i, v in enumerate([1.0, 2.0, 3.0, 100.0, 110.0, 120.0])
        ]
    )
    with mock.patch.object(a23, "load", lambda spark, sf, name: orders):
        rows = a23.QUERIES["pettitt_changepoint"].fn(spark, "unused").collect()
    xs = [100, 200, 300, 10000, 11000, 12000]
    # brute-force U_t for the oracle-of-the-oracle
    def u(t):
        return sum(
            (1 if xs[i] > xs[j] else -1 if xs[i] < xs[j] else 0)
            for i in range(t + 1)
            for j in range(t + 1, len(xs))
        )

    by_day = {r.day - rows[0].day: r for r in rows}
    for t in range(len(xs)):
        assert by_day[t].u_stat == u(t)
    # max |U| lands exactly at the step (after index 2)
    assert [r.day - rows[0].day for r in rows if r.is_changepoint] == [2]


def test_precision_recall_curve_pinned_counts(spark):
    li = spark.createDataFrame(
        [
            # score 100: 2 pos / 1 neg; score 50: 1 pos / 2 neg;
            # score 0: 0 pos / 2 neg
            Row(l_discount=0.10, l_returnflag="R"),
            Row(l_discount=0.10, l_returnflag="R"),
            Row(l_discount=0.10, l_returnflag="N"),
            Row(l_discount=0.05, l_returnflag="R"),
            Row(l_discount=0.05, l_returnflag="A"),
            Row(l_discount=0.05, l_returnflag="N"),
            Row(l_discount=0.00, l_returnflag="N"),
            Row(l_discount=0.00, l_returnflag="A"),
        ]
    )
    with mock.patch.object(a23, "load", lambda spark, sf, name: li):
        rows = a23.QUERIES["precision_recall_curve"].fn(
            spark, "unused"
        ).collect()
    got = {r.threshold: (r.tp, r.fp, r.fn, r.precision_permille,
                         r.recall_permille) for r in rows}
    assert got == {
        100: (2, 1, 1, 666, 666),
        50: (3, 3, 0, 500, 1000),
        0: (3, 5, 0, 375, 1000),
    }


def test_mcnemar_statistic_algebra(spark):
    rows = _run(spark, "mcnemar_detector_disagreement")
    assert len(rows) == 1
    r = rows[0]
    if r.b + r.c:
        assert r.mcnemar_permille == (r.b - r.c) ** 2 * 1000 // (r.b + r.c)
    else:
        assert r.mcnemar_permille is None


def test_assortativity_star_graph_pinned(spark):
    # one order holding parts {1,2,3,4} -> K4: all degrees equal -> den
    # 0 -> NULL; a path graph 1-2, 2-3 (two orders) -> disassortative
    li_path = spark.createDataFrame(
        [
            Row(l_orderkey=1, l_partkey=1),
            Row(l_orderkey=1, l_partkey=2),
            Row(l_orderkey=2, l_partkey=2),
            Row(l_orderkey=2, l_partkey=3),
        ]
    )
    with mock.patch.object(a23, "load", lambda spark, sf, name: li_path):
        r = a23.QUERIES["copurchase_degree_assortativity"].fn(
            spark, "unused"
        ).collect()[0]
    # edges (1,2),(2,3); degrees: d1=1, d2=2, d3=1
    # ends (x,y): (1,2),(2,3),(2,1),(3,2) -> dx=[1,2,2,1], dy=[2,1,1,2]
    assert (r.n_ends, r.sum_deg, r.sum_deg_prod, r.sum_deg_sq) == (
        4, 6, 8, 10,
    )
    # r = (4*8 - 36) / (4*10 - 36) = -4/4 = -1 -> perfectly
    # disassortative path
    assert r.assortativity_e6 == -1_000_000

    li_k4 = spark.createDataFrame(
        [Row(l_orderkey=1, l_partkey=p) for p in (1, 2, 3, 4)]
    )
    with mock.patch.object(a23, "load", lambda spark, sf, name: li_k4):
        r = a23.QUERIES["copurchase_degree_assortativity"].fn(
            spark, "unused"
        ).collect()[0]
    assert r.assortativity_e6 is None  # zero variance -> NULL, rule 9


def test_phonetic_key_rule(spark):
    parts = spark.createDataFrame(
        [
            Row(p_name="blue anvil"),
            Row(p_name="black anvil"),
            Row(p_name="aqua gear"),
            Row(p_name="e"),
        ]
    )
    with mock.patch.object(a23, "load", lambda spark, sf, name: parts):
        rows = a23.QUERIES["phonetic_block_profile"].fn(
            spark, "unused"
        ).collect()
    got = {r.phonetic_key: (r.n_parts, r.pair_budget) for r in rows}
    # blue -> b + "l"; black -> b + "lck" ; aqua -> a + "q"; e -> "e"
    assert got == {"bl": (1, 0), "blck": (1, 0), "aq": (1, 0), "e": (1, 0)}


def test_kendall_counts_pinned(spark):
    d0 = dt.datetime(2024, 1, 1)
    # day revenues 1,2,3 / order counts 1,1,2 (one 100.0-order day, one
    # 200.0-order day, one day with 150.0+150.0)
    orders = spark.createDataFrame(
        [
            Row(o_orderkey=1, o_custkey=1, o_orderstatus="F",
                o_totalprice=100.0, o_orderdate=d0,
                o_orderpriority="1"),
            Row(o_orderkey=2, o_custkey=1, o_orderstatus="F",
                o_totalprice=200.0, o_orderdate=d0 + dt.timedelta(days=1),
                o_orderpriority="1"),
            Row(o_orderkey=3, o_custkey=1, o_orderstatus="F",
                o_totalprice=150.0, o_orderdate=d0 + dt.timedelta(days=2),
                o_orderpriority="1"),
            Row(o_orderkey=4, o_custkey=1, o_orderstatus="F",
                o_totalprice=150.0, o_orderdate=d0 + dt.timedelta(days=2),
                o_orderpriority="1"),
        ]
    )
    with mock.patch.object(a23, "load", lambda spark, sf, name: orders):
        r = a23.QUERIES["kendall_tau_daily_metrics"].fn(
            spark, "unused"
        ).collect()[0]
    # series: x=[10000,20000,30000], y=[1,1,2]
    # pairs: (d0,d1): dx>0, dy=0 -> tie_y; (d0,d2): dx>0,dy>0 -> C;
    # (d1,d2): C
    assert (r.n_pairs, r.concordant, r.discordant, r.ties_x, r.ties_y,
            r.ties_both) == (3, 2, 0, 0, 1, 0)
    assert r.tau_a_e6 == 2 * 1_000_000 // 3


def test_batch23_empty_input_edges(spark):
    """Empty sources must yield the same shape on both engines: the
    scalar aggregates emit their one NULL-laden row, the grouped keys
    emit zero rows, and nothing throws under ANSI mode."""
    empty_orders = spark.createDataFrame(
        [],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    with mock.patch.object(a23, "load", lambda spark, sf, name: empty_orders):
        assert a23.QUERIES["pettitt_changepoint"].fn(spark, "x").count() == 0
        r = a23.QUERIES["kendall_tau_daily_metrics"].fn(
            spark, "x"
        ).collect()
        assert len(r) == 1 and r[0].n_pairs == 0
        assert r[0].tau_a_e6 is None  # nullif guard, rule 9

    empty_events = spark.createDataFrame(
        [], "event_id long, event_type string"
    )
    with mock.patch.object(a23, "load", lambda spark, sf, name: empty_events):
        assert (
            a23.QUERIES["randomized_response_audit"].fn(spark, "x").count()
            == 0
        )

    # single-day orders: pettitt's U_1 = 0 on a 1-point series, no
    # window crash; kendall has zero pairs
    one = spark.createDataFrame(
        [
            Row(
                o_orderkey=1,
                o_custkey=1,
                o_orderstatus="F",
                o_totalprice=10.0,
                o_orderdate=dt.datetime(2024, 1, 1),
                o_orderpriority="1",
            )
        ]
    )
    with mock.patch.object(a23, "load", lambda spark, sf, name: one):
        rows = a23.QUERIES["pettitt_changepoint"].fn(spark, "x").collect()
        assert len(rows) == 1 and rows[0].u_stat == 0
        assert rows[0].is_changepoint is True
        r = a23.QUERIES["kendall_tau_daily_metrics"].fn(spark, "x").collect()
        assert r[0].n_pairs == 0


def test_rr_and_pettitt_null_edges_parity(spark, tmp_path):
    """Review-r10 regressions, replayed through BOTH engines: a NULL
    event_id must not make the engines flip different md5 coins
    (concat_ws skips NULLs, '||' nullifies), and an all-NULL-price day
    must not rank NULLS FIRST/LAST differently in the Pettitt ranks."""
    import datetime as edt

    import pyarrow as pa

    from data_pipeline_bigquery_spark.queries import registry
    from tests.test_analytics19_20_edges import (
        _edge_dir,
        _events,
        _orders,
        _parity,
    )

    d0 = edt.datetime(2024, 1, 5, 9)
    events = _events(
        [
            (0, d0, 1, "click", 1.0),
            (None, d0, 1, "click", 1.0),  # NULL id: excluded, both engines
            (2, d0, 2, "purchase", 3.0),
            (3, d0, 2, "view", 1.0),
        ]
    )
    orders = _orders(
        [
            (1, 1, 100.0, d0),
            (2, 1, None, d0 + edt.timedelta(days=1)),  # all-NULL-price day
            (3, 2, 250.0, d0 + edt.timedelta(days=2)),
            (4, 2, 80.0, d0 + edt.timedelta(days=3)),
        ]
    )
    d = _edge_dir(tmp_path, events=events, orders=orders)
    reg = registry()
    for key in (
        "randomized_response_audit",
        "pettitt_changepoint",
        "kendall_tau_daily_metrics",
    ):
        _parity(spark, reg[key], d)
