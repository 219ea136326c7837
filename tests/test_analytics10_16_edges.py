"""Edge-regime tests for the round-7 statistics keys queued in the r08
driver window: the rule-9 variance-zero guards (Spearman single-day
month, Mann-Kendall all-tied series, one-class AUC), the rule-13
max_by NULL guard in CDC compaction, and the empty-pair vocabulary
overlap — each case runs the ORACLE on the same synthetic dir."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa

from data_pipeline_bigquery_spark.queries import (
    analytics10,
    analytics11,
    analytics16,
)
from tests.test_analytics19_20_edges import (
    _documents,
    _edge_dir,
    _events,
    _orders,
    _parity,
)


def _day(n, hour=9):
    return dt.datetime(2024, 1, 1, hour) + dt.timedelta(days=n)


def test_spearman_single_day_month_rho_is_null(spark, tmp_path):
    # one active day per month: n=1 -> n(n^2-1)=0 -> rho NULL (guard)
    rows = [
        (1, 1, 100.0, dt.datetime(2024, 1, 15)),
        (2, 2, 150.0, dt.datetime(2024, 1, 15)),
        (3, 3, 200.0, dt.datetime(2024, 2, 20)),
    ]
    d = _edge_dir(tmp_path, orders=_orders(rows))
    spec = analytics10.QUERIES["spearman_rank_corr"]
    out = spec.fn(spark, d).collect()
    assert len(out) == 2
    for r in out:
        assert r.n_days == 1 and r.sum_d2 == 0
        assert r.rho is None
    _parity(spark, spec, d)


def test_mann_kendall_tied_and_single_day_series(spark, tmp_path):
    # 'view': 4 days with IDENTICAL counts -> S=0, tie term wipes the
    # variance -> z exactly 0.0 (the otherwise branch, never 0/0);
    # 'click': a single day -> no pairs, S coalesces to 0, z 0.0
    rows, eid = [], 0
    for day in range(4):
        for _ in range(3):
            rows.append((eid, _day(day), 1, "view", 1.0))
            eid += 1
    rows.append((eid, _day(0), 1, "click", 1.0))
    d = _edge_dir(tmp_path, events=_events(rows))
    spec = analytics10.QUERIES["mann_kendall_trend"]
    out = {r.event_type: r for r in spec.fn(spark, d).collect()}
    v = out["view"]
    assert (v.n_days, v.s_stat, v.var_num, v.z) == (4, 0, 0, 0.0)
    c = out["click"]
    assert (c.n_days, c.s_stat, c.var_num, c.z) == (1, 0, 0, 0.0)
    _parity(spark, spec, d)


def test_auc_one_class_is_null(spark, tmp_path):
    # every user converts: n_neg = 0 -> denominator guard -> auc NULL
    rows = [
        (0, _day(0), 1, "purchase", 300.0),
        (1, _day(0), 1, "view", 5.0),
        (2, _day(1), 2, "purchase", 400.0),
    ]
    d = _edge_dir(tmp_path, events=_events(rows))
    spec = analytics11.QUERIES["model_auc_ranksum"]
    (r,) = spec.fn(spark, d).collect()
    assert (r.n_pos, r.n_neg) == (2, 0)
    assert r.u2 == 0 and r.auc is None
    _parity(spark, spec, d)


def test_cdc_compaction_classes_on_synthetic_keys(spark, tmp_path):
    # 300 keys in one month: the md5 buckets hit every class (counts
    # probed independently via duckdb's md5: 16/37/12/203, with 32
    # untouched pre-existing keys correctly absent from the stream);
    # the D rows carry NULL values, so the rule-13 max_by guard runs
    # on BOTH engines over this corpus
    rows = [
        (k, k, 100.0 + k, dt.datetime(2024, 3, 10)) for k in range(1, 301)
    ]
    d = _edge_dir(tmp_path, orders=_orders(rows))
    spec = analytics10.QUERIES["cdc_net_effect_compaction"]
    out = {r.net_op: r for r in spec.fn(spark, d).collect()}
    assert {k: r.n_keys for k, r in out.items()} == {
        "DELETE": 16,
        "NOOP": 37,
        "UPDATE": 12,
        "INSERT": 203,
    }
    for r in out.values():
        if r.net_op in ("DELETE", "NOOP"):
            assert r.surviving_cents == 0
        else:
            assert r.surviving_cents > 0
    _parity(spark, spec, d)


def test_vocab_overlap_single_language_is_empty(spark, tmp_path):
    texts = ["alpha beta gamma", "beta gamma delta"]
    t = _documents(texts)
    # both docs in ONE language: no pair rows exist at all
    t = t.set_column(
        t.schema.get_field_index("lang"), "lang", pa.array(["en", "en"])
    )
    d = _edge_dir(tmp_path, documents=t)
    spec = analytics16.QUERIES["vocabulary_overlap_between_langs"]
    assert spec.fn(spark, d).count() == 0
    _parity(spark, spec, d)
