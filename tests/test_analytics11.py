"""Batch-11 semantic tests: t-closeness EMD against a pure-Python
distribution model, rank-sum AUC against the brute-force pairwise
definition, pinball loss and order-statistic forecasts against an
in-memory replay, and the chunk grid against a reference chunker."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.queries import analytics11
from tests.conftest import SF_DIR


def _run(spark, key, sf=SF_DIR):
    return analytics11.QUERIES[key].fn(spark, sf).collect()


# --- t_closeness_audit -------------------------------------------------------


def _emd_model(group_bands, all_bands, m=3):
    """Reference t-closeness: EMD between normalized band histograms
    of an ordered attribute = mean |cumulative difference|."""
    ng, nt = len(group_bands), len(all_bands)
    p = [group_bands.count(i) / ng for i in range(m)]
    q = [all_bands.count(i) / nt for i in range(m)]
    cum, acc = 0.0, 0.0
    for i in range(m - 1):
        acc += p[i] - q[i]
        cum += abs(acc)
    return cum / (m - 1)


def test_t_closeness_matches_model(spark, tmp_path):
    # group A mirrors the global mix; group B is all-band-2 (skewed)
    rows = []
    # band 0: acctbal < 0; band 1: < 5000; band 2: >= 5000
    bal = {0: -100.0, 1: 2000.0, 2: 9000.0}
    layout = {
        ("SEG1", 1): [0, 1, 1, 2],
        ("SEG1", 2): [2, 2, 2, 2],
        ("SEG2", 3): [0, 1, 2, 2],
    }
    ck = 0
    for (seg, nat), bands in layout.items():
        for b in bands:
            rows.append((ck, seg, nat, bal[b]))
            ck += 1
    spark.createDataFrame(
        rows,
        "c_custkey long, c_mktsegment string, c_nationkey long,"
        " c_acctbal double",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    out = {
        (r.c_mktsegment, r.c_nationkey): r
        for r in _run(spark, "t_closeness_audit", str(tmp_path))
    }
    all_bands = [b for bands in layout.values() for b in bands]
    for key, bands in layout.items():
        assert out[key].n_members == len(bands)
        assert out[key].emd == pytest.approx(
            _emd_model(bands, all_bands), abs=1e-12
        )
    # the skewed group leaks hardest
    emds = {k: v.emd for k, v in out.items()}
    assert max(emds, key=emds.get) == ("SEG1", 2)


def test_t_closeness_uniform_group_is_zero(spark, tmp_path):
    # every group has the identical distribution → EMD exactly 0
    rows = []
    ck = 0
    for seg in ("A", "B"):
        for nat in (1, 2):
            for bal in (-5.0, 1000.0, 8000.0):
                rows.append((ck, seg, nat, bal))
                ck += 1
    spark.createDataFrame(
        rows,
        "c_custkey long, c_mktsegment string, c_nationkey long,"
        " c_acctbal double",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    out = _run(spark, "t_closeness_audit", str(tmp_path))
    assert all(r.emd_num == 0 and r.emd == 0.0 for r in out)


# --- model_auc_ranksum -------------------------------------------------------


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double"
    ).withColumn("props", F.lit("{}")).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )


def _auc_events(spark, tmp_path, scored):
    """scored: list of (user_id, engagement_value, converts)."""
    rows, eid = [], 0
    t0 = dt.datetime(2024, 1, 1, 12)
    for uid, val, conv in scored:
        rows.append((eid, t0, uid, "view", float(val)))
        eid += 1
        if conv:
            rows.append((eid, t0, uid, "purchase", 300.0))
            eid += 1
    _write_events(spark, tmp_path, rows)


def test_auc_perfect_and_inverted(spark, tmp_path):
    # positives all score above negatives → AUC 1.0
    _auc_events(
        spark, tmp_path,
        [(1, 10, False), (2, 20, False), (3, 30, True), (4, 40, True)],
    )
    out = _run(spark, "model_auc_ranksum", str(tmp_path))
    assert (out[0].n_pos, out[0].n_neg) == (2, 2)
    assert out[0].auc == 1.0
    # inverted → 0.0
    _auc_events(
        spark, tmp_path,
        [(1, 40, False), (2, 30, False), (3, 20, True), (4, 10, True)],
    )
    out = _run(spark, "model_auc_ranksum", str(tmp_path))
    assert out[0].auc == 0.0


def test_auc_ties_get_half_credit(spark, tmp_path):
    # one positive tied with one negative, one negative below:
    # pairs: (pos vs tied-neg) = 0.5, (pos vs low-neg) = 1 → AUC 0.75
    _auc_events(
        spark, tmp_path,
        [(1, 5, False), (2, 10, False), (3, 10, True)],
    )
    out = _run(spark, "model_auc_ranksum", str(tmp_path))
    assert out[0].auc == pytest.approx(0.75, abs=1e-12)


def test_auc_matches_brute_force_on_fixture(spark):
    import duckdb

    rows = duckdb.sql(f"""
        SELECT CAST(sum(CASE WHEN event_type <> 'purchase'
                   THEN CAST(floor(value*100+0.5) AS BIGINT) ELSE 0 END)
                 AS BIGINT) AS s,
               max(CASE WHEN event_type = 'purchase' AND value >= 250
                   THEN 1 ELSE 0 END) AS y
        FROM '{SF_DIR}/events.parquet' GROUP BY user_id
    """).fetchall()
    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    u = sum(
        1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg
    )
    out = _run(spark, "model_auc_ranksum")
    assert (out[0].n_pos, out[0].n_neg) == (len(pos), len(neg))
    assert out[0].auc == pytest.approx(u / (len(pos) * len(neg)), abs=1e-12)


# --- quantile_pinball_eval ---------------------------------------------------


def _pinball_model(train, test, q10):
    n = len(train)
    srt = sorted(train)
    f = srt[(q10 * n + 9) // 10 - 1]
    loss = sum(max(q10 * (y - f), (q10 - 10) * (y - f)) for y in test)
    return f, loss


def test_pinball_matches_model(spark, tmp_path):
    # 10 train days (values 100..1000 dollars), 5 test days
    daily = [100.0 * (i + 1) for i in range(10)] + [
        250.0, 777.0, 50.0, 1200.0, 400.0
    ]
    rows = [
        (d, dt.datetime(2024, 3, 1) + dt.timedelta(days=d), 1, "sale", v)
        for d, v in enumerate(daily)
    ]
    _write_events(spark, tmp_path, rows)
    out = {r.q_tenths: r for r in _run(
        spark, "quantile_pinball_eval", str(tmp_path))}
    # split: nd=15 → train = first ceil((15+1)/2)... rn_d <= 8 → 8 days
    train = [round(v * 100) for v in daily[:8]]
    test = [round(v * 100) for v in daily[8:]]
    for q10 in (5, 9):
        f, loss = _pinball_model(train, test, q10)
        r = out[q10]
        assert (r.n_train, r.n_test) == (8, 7)
        assert r.forecast_cents == f
        assert r.pinball_x10 == loss


def test_pinball_quantile_forecasts_monotone(spark):
    out = {(r.event_type, r.q_tenths): r for r in _run(
        spark, "quantile_pinball_eval")}
    # structural: each type has both quantiles, and the P90 forecast
    # is >= the P50 forecast (order statistics are monotone in q);
    # loss-asymmetry itself is pinned exactly by test_pinball_matches
    # _model and test_pinball_loss_asymmetry
    types = {t for t, _ in out}
    for t in types:
        assert out[(t, 9)].forecast_cents >= out[(t, 5)].forecast_cents


def test_pinball_loss_asymmetry(spark, tmp_path):
    # train pins both forecasts to 100.00; the single test day
    # overshoots by 50.00 → q=.9 charges 9×50×100 = 45000,
    # q=.5 charges 5×50×100 = 25000 (a q/(q-10) sign flip would
    # instead charge 5000/25000 and fail both)
    rows = [
        (d, dt.datetime(2024, 9, 1) + dt.timedelta(days=d), 1, "sale", 100.0)
        for d in range(3)
    ] + [(9, dt.datetime(2024, 9, 4), 1, "sale", 150.0)]
    _write_events(spark, tmp_path, rows)
    out = {r.q_tenths: r for r in _run(
        spark, "quantile_pinball_eval", str(tmp_path))}
    assert out[5].forecast_cents == 10000 and out[9].forecast_cents == 10000
    assert out[5].pinball_x10 == 5 * 5000
    assert out[9].pinball_x10 == 9 * 5000


# --- rag_chunk_windows -------------------------------------------------------


def test_chunk_grid_matches_reference_chunker(spark, tmp_path):
    texts = {
        1: " ".join(f"t{i}" for i in range(40)),   # 40 tokens → 2 chunks
        2: " ".join(f"u{i}" for i in range(32)),   # one window, no tail dup
        3: "single",                                # 1 token → 1 chunk
        4: " ".join(f"v{i}" for i in range(100)),  # 6 chunks
    }
    spark.createDataFrame(
        [(k, v, "en", "src", len(v)) for k, v in texts.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = analytics11.QUERIES["rag_chunk_windows"].fn(
        spark, str(tmp_path)
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r.doc_id, []).append(r)
    for doc_id, text in texts.items():
        toks = text.split(" ")
        # reference chunker: emit while the previous window has not
        # yet reached end-of-document (no chunk may be a strict
        # suffix of its predecessor; the last window reaches EOD)
        expect = []
        s = 0
        while s == 0 or s + 16 < len(toks):
            expect.append((s, toks[s : s + 32]))
            s += 16
        chunks = sorted(got[doc_id], key=lambda r: r.chunk_no)
        assert len(chunks) == len(expect)
        for r, (start, window) in zip(chunks, expect):
            assert r.start_tok == start
            assert r.n_tok == len(window)
            assert r.chunk_text == " ".join(window)
        # full-coverage reconstruction: each chunk's fresh (first-
        # stride) tokens, plus the final chunk's tail, re-cover the
        # document exactly
        rebuilt = []
        for i, r in enumerate(chunks):
            window = r.chunk_text.split(" ")
            rebuilt.extend(window if i == len(chunks) - 1 else window[:16])
        assert rebuilt == toks
        assert chunks[0].chunk_no == 1
