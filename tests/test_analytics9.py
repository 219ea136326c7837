"""Batch-9 semantic tests: the oracle sweep pins cross-engine hash
parity; these pin the STATISTICS against independent in-memory models
(a pure-Python Theil–Sen, the Poisson(1) weight law, the temperature-
flattening property) and the invariants the SQL shares with the
engine (partition-of-total, bounds, label constraints)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.queries import analytics9
from tests.conftest import SF_DIR


def _run(spark, key, sf=SF_DIR):
    return analytics9.QUERIES[key].fn(spark, sf).collect()


# --- theil_sen_trend -------------------------------------------------------


def _theil_sen_model(series):
    """Reference Theil–Sen: lower-median pairwise slope with the
    (slope, t1, t2) tie-break — mirrors the distributed selection."""
    pairs = []
    for i, (t1, n1) in enumerate(series):
        for t2, n2 in series[i + 1 :]:
            pairs.append(((n2 - n1) / (t2 - t1), t1, t2))
    pairs.sort()
    return pairs[(len(pairs) + 1) // 2 - 1][0]


def test_theil_sen_matches_model_and_resists_outliers(spark, tmp_path):
    import datetime as dt

    # linear n = 2t + 3 with ONE wild outlier day: OLS would bend,
    # the pairwise median must stay exactly 2.0
    rows = []
    for t in range(12):
        n = 2 * t + 3 if t != 6 else 500
        for j in range(n):
            rows.append(
                (
                    dt.datetime(2024, 3, 1 + t, 8, 0, 0),
                    "probe",
                    1000 * t + j,
                )
            )
    spark.createDataFrame(
        rows, "ts timestamp, event_type string, event_id long"
    ).withColumn("user_id", F.lit(1)).withColumn(
        "value", F.lit(1.0)
    ).withColumn("props", F.lit("{}")).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = {
        r.event_type: r
        for r in analytics9.QUERIES["theil_sen_trend"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    series = [(t, 2 * t + 3 if t != 6 else 500) for t in range(12)]
    assert out["probe"].median_slope == pytest.approx(
        _theil_sen_model(series), abs=1e-9
    )
    assert out["probe"].median_slope == pytest.approx(2.0, abs=1e-9)
    assert out["probe"].n_pairs == 12 * 11 // 2


# --- bootstrap_ci_revenue --------------------------------------------------


def test_bootstrap_weights_follow_poisson1_and_ci_brackets_mean(spark):
    row = _run(spark, "bootstrap_ci_revenue")[0]
    assert row.b_count == 64
    assert row.ci_lo_cents < row.ci_hi_cents
    # the point estimate need not sit inside every resample CI, but at
    # B=64 on ~1.5k orders it always does
    assert row.ci_lo_cents <= row.mean_cents_full <= row.ci_hi_cents

    # the deterministic weight function must reproduce Poisson(1):
    # empirical mean weight ~ 1 within 2% over ~96k draws
    from data_pipeline_bigquery_spark.catalog import load
    from data_pipeline_bigquery_spark.extensions.sampling import hash_bucket

    orders = load(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    reps = orders.select(
        "k", F.explode(F.sequence(F.lit(0), F.lit(63))).alias("b")
    )
    u = hash_bucket(
        F.concat_ws("_", F.col("k").cast("string"), F.col("b").cast("string")),
        1_000_000,
    )
    wexpr = F.lit(7)
    for wk in range(len(analytics9._POISSON1_CDF_PPM) - 1, -1, -1):
        wexpr = F.when(
            u < analytics9._POISSON1_CDF_PPM[wk], wk
        ).otherwise(wexpr)
    stats = reps.select(wexpr.alias("w")).agg(
        F.avg("w").alias("mean_w"),
        F.avg(F.when(F.col("w") == 0, 1).otherwise(0)).alias("p0"),
    ).first()
    assert stats.mean_w == pytest.approx(1.0, rel=0.02)
    assert stats.p0 == pytest.approx(0.3679, rel=0.05)


# --- lang_temperature_mixture ----------------------------------------------


def test_temperature_mixture_flattens_shares(spark):
    rows = _run(spark, "lang_temperature_mixture")
    assert all(r.n_after <= r.n_before for r in rows)
    # at least one language is the binding constraint (kept ~whole)
    assert any(r.n_after >= int(r.n_before * 0.99) for r in rows)

    def spread(counts):
        tot = sum(counts)
        shares = [c / tot for c in counts]
        return max(shares) - min(shares)

    before = [r.n_before for r in rows]
    after = [max(r.n_after, 1) for r in rows]
    # α=0.5 must FLATTEN the language distribution
    assert spread(after) < spread(before)
    # target shares are a valid permille partition (floor rounding)
    tgt = sum(r.target_share_permille for r in rows)
    assert 1000 - len(rows) <= tgt <= 1000


# --- ab_test_lift / diff_in_diff ------------------------------------------


def test_ab_arms_partition_users_and_did_cells_sum(spark):
    ab = _run(spark, "ab_test_lift", "/root/testdata/sf0.01")[0]
    from data_pipeline_bigquery_spark.catalog import load

    n_users = (
        load(spark, "/root/testdata/sf0.01", "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert ab.n_control + ab.n_treatment == n_users
    assert 0 <= ab.conv_control <= ab.n_control
    assert 0 <= ab.conv_treatment <= ab.n_treatment
    # md5 split is balanced: SRM deviation under 10%
    assert ab.srm_dev_permille < 100

    did = _run(spark, "diff_in_diff_revenue")[0]
    total = (
        load(spark, SF_DIR, "events")
        .agg(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).alias("c")
        )
        .first()
        .c
    )
    cells = (
        did.control_pre_cents
        + did.control_post_cents
        + did.treatment_pre_cents
        + did.treatment_post_cents
    )
    assert cells == total
    assert did.did_cents == (
        did.treatment_post_cents - did.treatment_pre_cents
    ) - (did.control_post_cents - did.control_pre_cents)


# --- autocorr / hard negatives / l-diversity ------------------------------


def test_autocorr_bounded_and_lags_present(spark):
    rows = {r.lag: r for r in _run(spark, "autocorr_daily_revenue")}
    assert set(rows) == {1, 7}
    for r in rows.values():
        assert -1.0 <= r.autocorr <= 1.0
    assert rows[1].n_pairs == rows[7].n_pairs + 6  # 30-day fixture series


def test_hard_negatives_cross_label_and_cover_anchors(spark):
    rows = _run(spark, "hard_negative_mining")
    assert len(rows) == 12  # one negative per anchor
    for r in rows:
        assert r.anchor_label != r.negative_label
        assert -1.0 <= r.cosine_sim <= 1.0
    assert len({r.anchor_id for r in rows}) == 12

    # optimality vs a brute-force numpy model: for each anchor the
    # mined negative's (rounded) cosine equals the max over ALL
    # cross-label candidates, with the id tie-break
    import duckdb
    import numpy as np

    emb = duckdb.sql(
        f"select vec_id, label, embedding from '{SF_DIR}/embeddings.parquet'"
    ).fetchall()
    vecs = {vid: (lab, np.array(v, dtype=np.float64)) for vid, lab, v in emb}
    for r in rows:
        alab, avec = vecs[r.anchor_id]
        best = max(
            (
                (
                    round(
                        float(avec @ v) / (np.linalg.norm(avec) * np.linalg.norm(v)),
                        6,
                    ),
                    -vid,
                )
                for vid, (lab, v) in vecs.items()
                if lab != alab
            ),
        )
        assert r.cosine_sim == best[0]
        assert r.negative_id == -best[1]


def test_l_diversity_histogram_partitions_customers(spark):
    from data_pipeline_bigquery_spark.catalog import load

    rows = _run(spark, "l_diversity_audit")
    n_cust = load(spark, SF_DIR, "customer").count()
    assert sum(r.n_customers for r in rows) == n_cust
    assert all(1 <= r.l <= 3 for r in rows)


# --- review-fix regressions: degenerate inputs must NULL, not crash -------


def _write_events(spark, path, rows):
    from pyspark.sql import functions as SF

    (
        spark.createDataFrame(
            rows, "ts timestamp, event_type string, event_id long"
        )
        .withColumn("user_id", (SF.col("event_id") % 7).cast("long"))
        .withColumn("value", SF.lit(10.0))
        .withColumn("props", SF.lit("{}"))
        .write.mode("overwrite")
        .parquet(str(path / "events.parquet"))
    )


def test_theil_sen_single_day_type_emits_null_slope(spark, tmp_path):
    import datetime as dt

    rows = [(dt.datetime(2024, 3, 1 + t), "multi", t) for t in range(5)]
    rows += [(dt.datetime(2024, 3, 4), "oneday", 100 + j) for j in range(3)]
    _write_events(spark, tmp_path, rows)
    out = {
        r.event_type: r
        for r in analytics9.QUERIES["theil_sen_trend"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out["oneday"].n_pairs == 0
    assert out["oneday"].median_slope is None
    assert out["multi"].n_pairs == 10  # 5 days → C(5,2)


def test_autocorr_constant_series_is_null_not_crash(spark, tmp_path):
    import datetime as dt

    # identical daily totals → zero variance → NULL autocorr (both
    # engines; pre-fix this was an ANSI DIVIDE_BY_ZERO crash)
    rows = [
        (dt.datetime(2024, 3, 1 + t, 12), "e", t) for t in range(10)
    ]
    _write_events(spark, tmp_path, rows)
    out = (
        analytics9.QUERIES["autocorr_daily_revenue"]
        .fn(spark, str(tmp_path))
        .collect()
    )
    assert {r.lag for r in out} == {1, 7}
    assert all(r.autocorr is None for r in out)


def test_cuped_zero_pre_variance_is_null_not_crash(spark, tmp_path):
    import datetime as dt

    from data_pipeline_bigquery_spark.queries import evalops

    # every event after day 15 → all pre-period sums are 0 → var(X)=0
    rows = [
        (dt.datetime(2024, 3, 20, 12, 0, t % 60), "e", t)
        for t in range(40)
    ]
    _write_events(spark, tmp_path, rows)
    out = (
        evalops.QUERIES["cuped_adjusted_lift"]
        .fn(spark, str(tmp_path))
        .collect()[0]
    )
    assert out.theta is None
    assert out.lift_cuped_cents is None
    assert out.lift_raw_cents is not None  # raw lift still defined


def test_funnel_lag_percentiles_ordered_and_bounded(spark):
    r = _run(spark, "funnel_conversion_lag_percentiles",
             "/root/testdata/sf0.01")[0]
    assert 0 < r.n_converted <= r.n_signups
    assert r.conversion_permille == r.n_converted * 1000 // r.n_signups
    assert 0 <= r.p25_lag_min <= r.p50_lag_min <= r.p75_lag_min


def test_iqr_outliers_match_brute_force(spark):
    import duckdb

    rows = {r.event_type: r for r in _run(spark, "iqr_outlier_audit")}
    raw = duckdb.sql(
        f"select event_type, CAST(floor(value*100+0.5) AS BIGINT) c "
        f"from '{SF_DIR}/events.parquet'"
    ).fetchall()
    by_type: dict[str, list[int]] = {}
    for et, c in raw:
        by_type.setdefault(et, []).append(c)
    for et, vals in by_type.items():
        vals.sort()
        n = len(vals)
        # the rank rule: smallest v with cum*100 >= p*total
        def q(p):
            cum = 0
            from collections import Counter

            for v, c in sorted(Counter(vals).items()):
                cum += c
                if cum * 100 >= p * n:
                    return v
        q1, q3 = q(25), q(75)
        iqr = q3 - q1
        lo, hi = 2 * q1 - 3 * iqr, 2 * q3 + 3 * iqr
        outliers = sum(1 for v in vals if v * 2 < lo or v * 2 > hi)
        r = rows[et]
        assert (r.q1_cents, r.q3_cents, r.n_outliers) == (q1, q3, outliers)
