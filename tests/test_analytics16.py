"""Batch-16 semantic tests: cycle-time quartiles against a brute-force
per-priority replay, and the language-overlap matrix against a Counter
replay of the top-set construction."""

from __future__ import annotations

from collections import Counter, defaultdict

from data_pipeline_bigquery_spark.queries import analytics16
from tests.conftest import SF_DIR


def _run(spark, key, sf=SF_DIR):
    return analytics16.QUERIES[key].fn(spark, sf).collect()


def test_cycle_percentiles_match_brute_force(spark):
    import duckdb

    rows = duckdb.sql(f"""
        SELECT o_orderpriority,
               date_diff('day', o_orderdate, s.shipped) AS days
        FROM '{SF_DIR}/orders.parquet' o
        JOIN (SELECT l_orderkey, max(l_shipdate) AS shipped
              FROM '{SF_DIR}/lineitem.parquet' GROUP BY 1) s
          ON o.o_orderkey = s.l_orderkey
    """).fetchall()
    by_prio = defaultdict(list)
    for prio, days in rows:
        by_prio[prio].append(days)
    out = {r.o_orderpriority: r for r in _run(
        spark, "order_cycle_time_percentiles")}
    assert set(out) == set(by_prio)
    for prio, days in by_prio.items():
        days.sort()
        n = len(days)

        def q(p):
            # the integer rank rule: smallest v with cum*100 >= p*total
            return days[-(-p * n // 100) - 1]

        r = out[prio]
        assert r.n_orders == n
        assert (r.p25_cycle_days, r.p50_cycle_days, r.p75_cycle_days) \
            == (q(25), q(50), q(75))
        assert r.p25_cycle_days <= r.p50_cycle_days <= r.p75_cycle_days


def test_vocab_overlap_matches_counter_replay(spark):
    import duckdb

    docs = duckdb.sql(
        f"SELECT lang, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    counts = defaultdict(Counter)
    for lang, text in docs:
        counts[lang].update(text.split(" "))
    top_k = analytics16._VOCAB_TOP
    tops = {
        lang: set(sorted(c, key=lambda t: (-c[t], t))[:top_k])
        for lang, c in counts.items()
    }
    langs = sorted(tops)
    expect = {}
    for i, a in enumerate(langs):
        for b in langs[i + 1:]:
            shared = len(tops[a] & tops[b])
            # EVERY pair appears, zero-overlap included
            expect[(a, b)] = (
                shared, len(tops[a]), len(tops[b]),
                shared * 1000 // min(len(tops[a]), len(tops[b])),
            )
    got = {(r.lang_a, r.lang_b): (
        r.n_shared, r.n_a, r.n_b, r.overlap_permille)
        for r in _run(spark, "vocabulary_overlap_between_langs")}
    assert got == expect
