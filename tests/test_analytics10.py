"""Batch-10 semantic tests: the oracle sweep pins cross-engine hash
parity; these pin the STATISTICS and OPERATOR SEMANTICS against
independent in-memory models — a pure-Python average-rank Spearman, a
brute-force Mann–Kendall (S, tie-corrected variance, continuity z), an
md5 replay of the reconciliation drift and CDC stream synthesis, and
the structural invariants (symmetry, top-k bounds, owned-exclusion,
partition-of-total) the recsys and curation keys must satisfy."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pytest
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.queries import analytics10
from tests.conftest import SF_DIR


def _run(spark, key, sf=SF_DIR):
    return analytics10.QUERIES[key].fn(spark, sf).collect()


def _bucket(k, n):
    return int(hashlib.md5(str(k).encode()).hexdigest()[:7], 16) % n


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    ).withColumn("user_id", F.lit(1)).withColumn(
        "props", F.lit("{}")
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


# --- spearman_rank_corr ----------------------------------------------------


def _avg_ranks(vals):
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    ranks = [0.0] * len(vals)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and vals[order[j]] == vals[order[i]]:
            j += 1
        avg = (i + 1 + j) / 2  # mean of positions i+1..j
        for k in range(i, j):
            ranks[order[k]] = avg
        i = j
    return ranks


def _spearman_model(xs, ys):
    rx, ry = _avg_ranks(xs), _avg_ranks(ys)
    n = len(xs)
    d2 = sum((a - b) ** 2 for a, b in zip(rx, ry))
    return 1.0 - 6.0 * d2 / (n * (n * n - 1))


@pytest.mark.slow  # r14: 12-16 s independent-model replay; parity
# for the key stays in the default oracle sweep
def test_spearman_matches_model_with_ties(spark, tmp_path):
    # one month, 8 days; revenue has a TIE (days 2 and 3) and the
    # association is noisy-monotone — exercises the doubled-rank path
    rev = [10.00, 20.00, 20.00, 35.00, 30.00, 50.00, 45.00, 60.00]
    n_orders = [1, 2, 4, 3, 5, 6, 8, 7]
    rows, oid = [], 0
    for day, (r, n) in enumerate(zip(rev, n_orders), start=1):
        # n orders summing to r dollars: n-1 at 0.00? zero-price rows
        # would tie ranks unintentionally — instead split r over n
        # orders as one order of r-(n-1) and n-1 orders of 1.00
        prices = [r - (n - 1)] + [1.00] * (n - 1)
        for p in prices:
            rows.append((oid, dt.date(2024, 5, day), float(p)))
            oid += 1
    _write_orders(spark, tmp_path, rows)
    out = analytics10.QUERIES["spearman_rank_corr"].fn(
        spark, str(tmp_path)
    ).collect()
    assert len(out) == 1
    got = out[0]
    assert got.n_days == 8
    rev_cents = [round(r * 100) for r in rev]
    assert got.rho == pytest.approx(
        _spearman_model(rev_cents, n_orders), abs=1e-12
    )
    # and the exact-integer channel agrees with the model's Σd²·4
    rx, ry = _avg_ranks(rev_cents), _avg_ranks(n_orders)
    assert got.sum_d2 == sum(
        round((2 * a - 2 * b) ** 2) for a, b in zip(rx, ry)
    )


def test_spearman_perfect_and_degenerate(spark, tmp_path):
    rows = [(i, dt.date(2024, 7, 1 + i), 100.0 * (i + 1)) for i in range(6)]
    # plus a single-day month → n(n²−1)=0 → rho NULL, not a crash
    rows.append((99, dt.date(2024, 8, 15), 42.0))
    _write_orders(spark, tmp_path, rows)
    out = {
        r.month: r
        for r in analytics10.QUERIES["spearman_rank_corr"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    july = out[dt.date(2024, 7, 1)]
    # one order per day → revenue and count are constant-vs-increasing:
    # count ties on every day (all 1) → model handles the full-tie case
    assert july.rho == pytest.approx(
        _spearman_model([100, 200, 300, 400, 500, 600], [1] * 6), abs=1e-12
    )
    assert out[dt.date(2024, 8, 1)].rho is None


# --- mann_kendall_trend ----------------------------------------------------


def _mann_kendall_model(counts):
    n = len(counts)
    s = sum(
        (counts[j] > counts[i]) - (counts[j] < counts[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    tie = sum(t * (t - 1) * (2 * t + 5) for t in Counter(counts).values())
    var_num = n * (n - 1) * (2 * n + 5) - tie
    sigma = math.sqrt(var_num / 18.0)
    if s > 0:
        z = (s - 1) / sigma
    elif s < 0:
        z = (s + 1) / sigma
    else:
        z = 0.0
    return s, var_num, z


def test_mann_kendall_matches_model(spark, tmp_path):
    # rising-with-ties series and a falling series, interleaved days
    up = [3, 5, 5, 7, 9, 9, 12, 15]
    down = [20, 18, 18, 15, 11, 9, 9, 2]
    rows, eid = [], 0
    for day in range(8):
        for _ in range(up[day]):
            rows.append((eid, dt.datetime(2024, 3, 1 + day, 9), "up", 1.0))
            eid += 1
        for _ in range(down[day]):
            rows.append((eid, dt.datetime(2024, 3, 1 + day, 9), "down", 1.0))
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = {
        r.event_type: r
        for r in analytics10.QUERIES["mann_kendall_trend"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    for name, series in (("up", up), ("down", down)):
        s, var_num, z = _mann_kendall_model(series)
        assert (out[name].s_stat, out[name].var_num) == (s, var_num)
        assert out[name].z == pytest.approx(z, abs=1e-12)
    assert out["up"].z > 2 and out["down"].z < -2


def test_mann_kendall_single_day_type_not_dropped(spark, tmp_path):
    # a type observed on ONE day has zero pairs — it must still appear
    # (n_days=1, S=0) rather than silently vanish from the report
    rows = [(0, dt.datetime(2024, 6, 1, 9), "lonely", 1.0)] + [
        (1 + d, dt.datetime(2024, 6, 1 + d, 9), "steady", 1.0)
        for d in range(4)
    ]
    _write_events(spark, tmp_path, rows)
    out = {r.event_type: r for r in _run(
        spark, "mann_kendall_trend", str(tmp_path))}
    assert set(out) == {"lonely", "steady"}
    assert (out["lonely"].n_days, out["lonely"].s_stat) == (1, 0)
    assert out["lonely"].var_num == 0 and out["lonely"].z == 0.0


def test_mann_kendall_constant_series_null_z(spark, tmp_path):
    rows = [
        (d * 2 + j, dt.datetime(2024, 4, 1 + d, 10), "flat", 1.0)
        for d in range(5)
        for j in range(2)
    ]
    _write_events(spark, tmp_path, rows)
    out = _run(spark, "mann_kendall_trend", str(tmp_path))
    assert len(out) == 1
    # all days tied → S=0 exactly and Var(S)=0; the S=0 branch wins
    # (z=0.0, "no trend") and the σ=0 guard never divides by zero
    assert out[0].s_stat == 0 and out[0].var_num == 0
    assert out[0].z == 0.0


# --- item_item_covisitation / covisitation_recs ----------------------------


def test_covisitation_cosine_topk_and_symmetry(spark, tmp_path):
    # orders: {1,2,3}, {1,2}, {1,4} → deg 1:3 2:2 3:1 4:1
    items = {10: [1, 2, 3], 20: [1, 2], 30: [1, 4]}
    rows = [(o, p) for o, ps in items.items() for p in ps]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = analytics10.QUERIES["item_item_covisitation"].fn(
        spark, str(tmp_path)
    ).collect()
    got = {(r.part, r.neighbor): r for r in out}
    # cosine(1,2) = 2 / sqrt(3*2)
    assert got[(1, 2)].cnt == 2
    assert got[(1, 2)].cosine == pytest.approx(2 / math.sqrt(6), abs=1e-12)
    # symmetric edge present with the same count/cosine
    assert got[(2, 1)].cnt == 2
    assert got[(2, 1)].cosine == got[(1, 2)].cosine
    # no self-pairs, rank bounded, rank 1 is each part's best neighbor
    assert all(r.part != r.neighbor for r in out)
    assert all(1 <= r.rank_no <= 5 for r in out)
    best_of_1 = [r for r in out if r.part == 1 and r.rank_no == 1][0]
    assert best_of_1.neighbor == 2  # highest cosine among 1's neighbors


@pytest.mark.slow  # r14: 12-16 s independent-model replay; parity
# for the key stays in the default oracle sweep
def test_recs_exclude_owned_and_rank_bounds(spark):
    recs = analytics10.QUERIES["covisitation_recs"].fn(spark, SF_DIR)
    from data_pipeline_bigquery_spark.catalog import load

    orders = load(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("o"), F.col("o_custkey").alias("cust")
    )
    owned = (
        load(spark, SF_DIR, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("candidate"))
        .join(orders, "o")
        .select("cust", "candidate")
        .distinct()
    )
    leaked = recs.join(owned, ["cust", "candidate"], "left_semi")
    assert leaked.count() == 0
    per_cust = recs.groupBy("cust").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank_no").alias("mx")
    )
    bad = per_cust.filter((F.col("n") > 3) | (F.col("mx") > 3)).count()
    assert bad == 0
    assert recs.filter(F.col("score_micro") <= 0).count() == 0


# --- seasonal_naive_skill --------------------------------------------------


def test_seasonal_skill_perfect_weekly_cycle(spark, tmp_path):
    # value cycles with period 7 exactly → lag-7 error 0, lag-1 error >0
    cycle = [10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0]
    rows = [
        (d, dt.datetime(2024, 1, 1) + dt.timedelta(days=d), "weekly",
         cycle[d % 7])
        for d in range(21)
    ]
    _write_events(spark, tmp_path, rows)
    out = _run(spark, "seasonal_naive_skill", str(tmp_path))
    assert len(out) == 1
    r = out[0]
    # days with both lags: d in 7..20 → 14 compared days
    assert r.n_days == 14
    assert r.seasonal_abs_cents == 0 and r.naive_abs_cents > 0
    assert r.ratio_permille == 0


def test_seasonal_skill_zero_naive_error_is_null(spark, tmp_path):
    rows = [
        (d, dt.datetime(2024, 2, 1) + dt.timedelta(days=d), "const", 5.0)
        for d in range(10)
    ]
    _write_events(spark, tmp_path, rows)
    out = _run(spark, "seasonal_naive_skill", str(tmp_path))
    assert out[0].naive_abs_cents == 0
    assert out[0].ratio_permille is None  # nullif guard, not a crash


# --- bigram_coverage_quality -----------------------------------------------


def test_bigram_buckets_partition_multiword_docs(spark):
    from data_pipeline_bigquery_spark.catalog import load

    out = _run(spark, "bigram_coverage_quality")
    assert all(0 <= r.bucket <= 10 for r in out)
    n_docs = sum(r.n_docs for r in out)
    eligible = (
        load(spark, SF_DIR, "documents")
        .filter(F.size(F.split("text", " ")) >= 2)
        .count()
    )
    assert n_docs == eligible


def test_bigram_coverage_extremes(spark, tmp_path):
    # doc A repeats its two bigrams at count 50+ → both enter the
    # vocabulary → full coverage (bucket 10).  doc B is all-unique
    # gibberish (every bigram a singleton).  250 filler docs' bigrams
    # at count 2 crowd the top-200 so B's singletons CAN'T enter →
    # coverage 0 (bucket 0).
    filler = " ".join(f"a{i} b{i} a{i} b{i}" for i in range(250))
    docs = [
        (1, "x y " * 50 + "x y", "clean"),
        (2, " ".join(f"tok{i}" for i in range(40)), "garbled"),
        (3, filler, "filler"),
    ]
    spark.createDataFrame(docs, "doc_id long, text string, source string") \
        .withColumn("lang", F.lit("en")) \
        .withColumn("n_chars", F.length("text").cast("long")) \
        .write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {(r.source, r.bucket): r.n_docs for r in _run(
        spark, "bigram_coverage_quality", str(tmp_path))}
    assert out[("clean", 10)] == 1
    assert out[("garbled", 0)] == 1
    assert sum(out.values()) == 3


# --- reconciliation_row_checksum -------------------------------------------


def test_reconciliation_statuses_match_md5_replay(spark):
    import duckdb

    rows = duckdb.sql(
        f"SELECT o_orderkey, date_trunc('month', o_orderdate) AS m,"
        f" CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents"
        f" FROM '{SF_DIR}/orders.parquet'"
    ).fetchall()
    expected = {}
    for k, m, cents in rows:
        drift = _bucket(k, 97)
        e = expected.setdefault(m, [0, 0])
        e[0] += 1
        if drift != 1:
            e[1] += 1
    out = _run(spark, "reconciliation_row_checksum")
    assert len(out) == len(expected)
    for r in out:
        n_src, n_rep = expected[r.part]
        assert (r.n_src, r.n_rep) == (n_src, n_rep)
        if n_src != n_rep:
            assert r.status == "COUNT_MISMATCH"
        elif r.status == "OK":
            assert r.checksum_src == r.checksum_rep
        else:
            assert r.status == "CHECKSUM_MISMATCH"
            assert r.checksum_src != r.checksum_rep


# --- cdc_net_effect_compaction ---------------------------------------------


def test_cdc_net_effect_matches_md5_replay(spark):
    import duckdb
    from collections import Counter

    rows = duckdb.sql(
        f"SELECT o_orderkey, date_trunc('month', o_orderdate) AS m,"
        f" CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents"
        f" FROM '{SF_DIR}/orders.parquet'"
    ).fetchall()
    exp_counts, exp_cents = Counter(), Counter()
    for k, m, cents in rows:
        pre = _bucket(k, 5) == 0
        upd = _bucket(k, 3) == 0
        del_ = _bucket(k, 7) == 0
        if pre and not upd and not del_:
            continue  # no stream rows → absent from the compaction
        if del_:
            net = "DELETE" if pre else "NOOP"
            final = 0
        else:
            net = "UPDATE" if pre else "INSERT"
            final = cents + 500 if upd else cents
        exp_counts[(m, net)] += 1
        exp_cents[(m, net)] += final
    out = _run(spark, "cdc_net_effect_compaction")
    got_counts = {(r.month, r.net_op): r.n_keys for r in out}
    got_cents = {(r.month, r.net_op): r.surviving_cents for r in out}
    assert got_counts == dict(exp_counts)
    for key, cents in exp_cents.items():
        assert got_cents[key] == cents
