"""Coverage batch 7 unit tests: media lake scan semantics, PIT lookup
boundaries, U-shaped attribution weights, pseudonymization properties.
The oracle sweep (`test_oracle_parity.py`) covers the hash parity; the
tests here pin the semantics the oracle shares with the engine."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.sources.media import (
    media_inventory,
    scan_media_dir,
    write_media_dir,
)


def test_media_inventory_magic_sniffing_and_glob(spark, tmp_path):
    payloads = {
        "a.ppm": b"P6\n2 2 255\n" + b" " * 12,
        "b.bmp": b"BM" + b"\x00" * 20,
        "c.wav": b"RIFF\x24\x00\x00\x00WAVE",
        "d.txt": b"plain text",
        "skip.log": b"never opened",
    }
    df = spark.createDataFrame(
        [Row(file_name=k, payload=v) for k, v in payloads.items()]
    )
    write_media_dir(df, str(tmp_path), "file_name", "payload")
    assert sorted(os.listdir(tmp_path)) == sorted(payloads)

    # glob pruning: .log never appears
    inv = media_inventory(
        scan_media_dir(spark, str(tmp_path), glob="*.{ppm,bmp,wav,txt}")
    )
    rows = {r.file_name: r for r in inv.collect()}
    assert "skip.log" not in rows
    assert rows["a.ppm"].kind == "ppm"
    assert rows["b.bmp"].kind == "bmp"
    assert rows["c.wav"].kind == "riff"
    assert rows["d.txt"].kind == "unknown"
    for name, r in rows.items():
        assert r.n_bytes == len(payloads[name])
        assert r.digest == hashlib.md5(payloads[name]).hexdigest()


def test_pit_lookup_half_open_boundary(spark):
    """A lookup instant exactly AT a version boundary must resolve to
    the NEW version (half-open [valid_from, valid_to))."""
    dim = spark.createDataFrame(
        [
            Row(d_custkey=1, status_then="O", valid_from="2020-01-01",
                valid_to="2020-06-01"),
            Row(d_custkey=1, status_then="F", valid_from="2020-06-01",
                valid_to=None),
        ]
    ).select(
        "d_custkey", "status_then",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    fact = spark.createDataFrame(
        [Row(k=1, ts="2020-06-01"), Row(k=1, ts="2020-05-31"),
         Row(k=1, ts="2021-01-01")]
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    out = fact.join(
        dim,
        (fact.k == dim.d_custkey)
        & (dim.valid_from <= fact.ts)
        & (dim.valid_to.isNull() | (dim.valid_to > fact.ts)),
    ).select(F.col("ts").cast("string").alias("ts"), "status_then")
    got = {r.ts[:10]: r.status_then for r in out.collect()}
    assert got == {"2020-06-01": "F", "2020-05-31": "O", "2021-01-01": "F"}
    # exactly one version matches each instant
    assert out.count() == 3


def test_multi_touch_weights_sum_to_one_per_purchase(spark):
    """For every purchase with >=1 touch, credited weights must sum to
    1.0 (so total attributed == total attributable revenue), covering
    the n=1 / n=2 / n>2 branches."""
    from data_pipeline_bigquery_spark.queries.analytics7 import (
        _multi_touch_attribution,
    )
    from tests.conftest import SF_DIR

    out = _multi_touch_attribution(spark, SF_DIR)
    total = out.agg(F.sum("attributed_value")).first()[0]

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    p = ev.filter(F.col("event_type") == "purchase").alias("p")
    t = ev.filter(F.col("event_type").isin("view", "click", "signup")).alias("t")
    attributable = (
        p.join(
            t,
            (F.col("p.user_id") == F.col("t.user_id"))
            & (F.col("t.ts") < F.col("p.ts")),
            "left_semi",
        )
        .agg(F.sum(F.col("value").cast("decimal(38,12)")))
        .first()[0]
    )
    # credits are rounded to micro-units, so the reconstruction is
    # exact up to 5e-7 per credit row
    n_credits = out.agg(F.sum("n_credits")).first()[0]
    assert abs(float(total) - float(attributable)) < 5e-7 * n_credits + 1e-9


def test_pseudonymize_is_deterministic_and_collision_free(spark):
    from data_pipeline_bigquery_spark.queries.analytics7 import (
        _pii_pseudonymize,
    )
    from tests.conftest import SF_DIR

    out = _pii_pseudonymize(spark, SF_DIR)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    n_tokens = out.select("user_token").distinct().count()
    assert n_tokens == n_users  # injective on this domain
    # raw ids never survive into the feed
    assert "user_id" not in out.columns


def test_wilson_bounds_bracket_rate(spark):
    from data_pipeline_bigquery_spark.queries.analytics7 import (
        _wilson_conversion_bounds,
    )
    from tests.conftest import SF_DIR

    rows = _wilson_conversion_bounds(spark, SF_DIR).collect()
    assert len(rows) == 24
    for r in rows:
        assert 0.0 <= r.wilson_lo <= r.rate <= r.wilson_hi <= 1.0
        # Wilson never collapses to a zero-width interval for 0<k<n
        if 0 < r.k < r.n:
            assert r.wilson_hi - r.wilson_lo > 0


def test_dwell_excludes_open_intervals(spark):
    from data_pipeline_bigquery_spark.queries.analytics7 import (
        _status_dwell_time,
    )
    from tests.conftest import SF_DIR

    rows = {r.status: r for r in _status_dwell_time(spark, SF_DIR).collect()}
    # every tracked customer's history ends in an open interval, so
    # open intervals must exist and never contribute days
    assert sum(r.n_open for r in rows.values()) > 0
    for r in rows.values():
        if r.n_closed:
            assert abs(r.avg_days - r.total_days / r.n_closed) < 1e-12


def test_grouped_ols_matches_numpy_lstsq(spark):
    """Cramer-over-exact-integers must agree with an independent
    float solver to well past the rounding grain."""
    import numpy as np

    from data_pipeline_bigquery_spark.queries.analytics7 import (
        _grouped_ols_price_model,
    )
    from tests.conftest import SF_DIR

    got = {r.flag: r for r in _grouped_ols_price_model(spark, SF_DIR).collect()}
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_returnflag", "l_quantity", "l_discount", "l_extendedprice"
    ).toPandas()
    for flag, grp in li.groupby("l_returnflag"):
        q = np.floor(grp.l_quantity + 0.5)
        d = np.floor(grp.l_discount * 100 + 0.5)
        p = np.floor(grp.l_extendedprice * 100 + 0.5)
        X = np.column_stack([np.ones(len(grp)), q, d])
        beta, *_ = np.linalg.lstsq(X, p, rcond=None)
        r = got[flag]
        assert abs(r.b0_cents - beta[0]) < 1e-3 * max(1, abs(beta[0]))
        assert abs(r.b1_cents_per_unit - beta[1]) < 1e-3 * max(1, abs(beta[1]))
        assert abs(r.b2_cents_per_pp - beta[2]) < 1e-3 * max(1, abs(beta[2]))


def test_rest_datasource_partitions_cover_exactly_once(spark, tmp_path):
    """The engine-planned page ranges must cover every record exactly
    once, across many partitions."""
    import json

    from data_pipeline_bigquery_spark.sources.rest_datasource import (
        RestOffsetDataSource,
    )

    spark.dataSource.register(RestOffsetDataSource)
    path = str(tmp_path / "recs.jsonl")
    with open(path, "w") as f:
        for i in range(137):  # deliberately not a multiple of the span
            f.write(json.dumps({"id": i, "v": f"r{i}"}) + "\n")
    df = (
        spark.read.format("restoffset")
        .schema("id long, v string")
        .option("path", path)
        .option("page_size", "10")
        .option("pages_per_task", "2")
        .load()
    )
    assert df.rdd.getNumPartitions() == 7  # ceil(137 / 20)
    rows = df.collect()
    assert len(rows) == 137
    assert sorted(r.id for r in rows) == list(range(137))


def test_ewma_matches_sequential_replay(spark):
    """The windowed closed form must equal a sequential truncated-EWMA
    replay per (user, type) stream."""
    from collections import defaultdict, deque

    from data_pipeline_bigquery_spark.queries.analytics7 import (
        _ewma_event_value,
    )
    from tests.conftest import SF_DIR

    got = {r.event_id: r.ewma_cents
           for r in _ewma_event_value(spark, SF_DIR).collect()}
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .orderBy("ts", "event_id")
        .collect()
    )
    hist = defaultdict(lambda: deque(maxlen=30))
    for r in ev:
        cents = int(r.value * 100 + 0.5)
        key = (r.user_id, r.event_type)
        hist[key].append(cents)
        frame = list(hist[key])
        want = sum(c * 2 ** (29 - len(frame) + i)
                   for i, c in enumerate(frame, start=1)) / 2**30
        assert abs(got[r.event_id] - want) < 1e-12, r.event_id


def test_apportionment_sums_to_budget_exactly(spark):
    from data_pipeline_bigquery_spark.queries.analytics7 import (
        _APPORTION_BUDGET,
        _budget_apportionment,
    )
    from tests.conftest import SF_DIR

    rows = _budget_apportionment(spark, SF_DIR).collect()
    assert sum(r.slots for r in rows) == _APPORTION_BUDGET
    # proportionality: every slot count within 1 of the exact quota
    n_total = sum(r.n_docs for r in rows)
    for r in rows:
        exact = r.n_docs * _APPORTION_BUDGET / n_total
        assert exact - 1 < r.slots < exact + 1


def test_churn_hazard_life_table_invariants(spark):
    from data_pipeline_bigquery_spark.queries.analytics7 import (
        _churn_hazard_by_tenure,
    )
    from tests.conftest import SF_DIR

    rows = sorted(
        _churn_hazard_by_tenure(spark, SF_DIR).collect(),
        key=lambda r: r.tenure,
    )
    # at_risk is non-increasing in tenure and starts at the cohort size
    for a, b in zip(rows, rows[1:]):
        assert a.at_risk >= b.at_risk
        assert b.at_risk == a.at_risk - a.ended
    assert rows[-1].hazard_rate == 1.0  # everyone at max tenure ends there


def test_dim_key_assignment_contiguous_and_rerun_stable(spark):
    from data_pipeline_bigquery_spark.queries.analytics7 import (
        _dim_key_assignment,
    )
    from tests.conftest import SF_DIR

    rows = _dim_key_assignment(spark, SF_DIR).collect()
    new = sorted(
        (r.natural_key, r.surrogate_key) for r in rows if r.is_new
    )
    existing_max = max(r.surrogate_key for r in rows if not r.is_new)
    # contiguous block right after the existing max, in key order
    assert [sk for _, sk in new] == list(
        range(existing_max + 1, existing_max + 1 + len(new))
    )
    # rerun-stable: second run assigns identical keys
    rows2 = _dim_key_assignment(spark, SF_DIR).collect()
    assert sorted((r.natural_key, r.surrogate_key) for r in rows2 if r.is_new) == new


def test_simhash_pairs_pigeonhole_never_misses(spark):
    """Constructed fingerprints: h=2 pair found via at least one equal
    band, h=3 pair excluded even though a band may collide."""
    from pyspark.sql import Row

    from data_pipeline_bigquery_spark.extensions.dedup_text import (
        simhash_hamming_pairs,
    )

    def bits(v):
        return format(v, "016b")

    fps = spark.createDataFrame(
        [
            Row(doc_id=1, simhash=bits(0b1010101010101010)),
            Row(doc_id=2, simhash=bits(0b1010101010101001)),  # h=2 vs 1
            Row(doc_id=3, simhash=bits(0b1010101010101101)),  # h=3 vs 1
        ]
    )
    assert bin(0b1010101010101010 ^ 0b1010101010101101).count("1") == 3
    got = {(r.doc_a, r.doc_b): r.hamming
           for r in simhash_hamming_pairs(fps).collect()}
    assert got.get((1, 2)) == 2
    # doc 3 shares two whole bands with doc 1 (it IS bucketed with it)
    # yet the exact hamming filter must still exclude the h=3 pair
    assert (1, 3) not in got

    # raising max_hamming auto-widens to 4 bands: the h=3 pair is now
    # structurally guaranteed to be found
    got3 = {(r.doc_a, r.doc_b): r.hamming
            for r in simhash_hamming_pairs(fps, max_hamming=3).collect()}
    assert got3.get((1, 3)) == 3

    # more bands than bits is impossible — refuse loudly
    import pytest

    with pytest.raises(ValueError, match="bands"):
        simhash_hamming_pairs(fps, max_hamming=16)


def test_asof_null_value_comes_from_matched_row(spark):
    """A NULL value in the matched right row must surface as NULL with
    that row's ts — not silently skip to a further row (the pandas
    merge_asof contract; the payload-struct pick guarantees it)."""
    from pyspark.sql import Row

    from data_pipeline_bigquery_spark.operators.asof import asof_join

    def ts(h):
        import datetime

        return datetime.datetime(2024, 1, 1, h)

    left = spark.createDataFrame(
        [Row(id=1, k=1, ts=ts(5)), Row(id=2, k=1, ts=ts(23))]
    )
    right = spark.createDataFrame(
        [Row(k=1, ts=ts(10), v=None), Row(k=1, ts=ts(20), v=5.0)],
        "k long, ts timestamp, v double",
    )
    fwd = {r.id: (r.asof_ts, r.asof_v)
           for r in asof_join(left, right, "k", "ts", ["v"],
                              direction="forward").collect()}
    assert fwd[1] == (ts(10), None)   # matched row's NULL, not 5.0
    bwd = {r.id: (r.asof_ts, r.asof_v)
           for r in asof_join(left, right, "k", "ts", ["v"]).collect()}
    assert bwd[2] == (ts(20), 5.0)
    # backward at ts=5: no match at all
    assert bwd[1] == (None, None)


def test_cusum_integer_accumulator_exact_on_long_series(spark):
    """Round-7 review finding: a windowed running sum of DOUBLES
    diverges between engines past ~30 rows (DuckDB sums via segment
    trees, Spark sequentially).  The cusum rewrite keeps the running
    sum INTEGER with one double multiply at the end — this pins both
    engines to a sequential Python model on a 100-day series, far past
    the fixture's 30-day span where the old form happened to agree."""
    import duckdb

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    counts = [(i, 1000 + (i * 37) % 113) for i in range(100)]
    # python model: exact integer cumsum, one double op per row
    total = sum(n for _, n in counts)
    mean = float(total) / float(len(counts))
    cum, model = 0, []
    for t, (_, n) in enumerate(counts, start=1):
        cum += n
        model.append(float(cum) - float(t) * mean)

    df = spark.createDataFrame(counts, "day int, n long")
    w_all = Window.partitionBy()
    w_run = Window.partitionBy().orderBy("day")
    got = [
        r.cusum
        for r in df.withColumn(
            "mean_n",
            F.sum("n").over(w_all).cast("double")
            / F.count(F.lit(1)).over(w_all).cast("double"),
        )
        .withColumn("cum_n", F.sum("n").over(w_run))
        .withColumn("t", F.row_number().over(w_run))
        .withColumn(
            "cusum",
            F.col("cum_n").cast("double")
            - F.col("t").cast("double") * F.col("mean_n"),
        )
        .orderBy("day")
        .collect()
    ]
    assert got == model  # bit-exact, not approx

    con = duckdb.connect()
    con.execute("CREATE TABLE d AS SELECT * FROM (VALUES " +
                ",".join(f"({d},{n})" for d, n in counts) + ") t(day, n)")
    duck = [
        r[0]
        for r in con.execute(
            """
            WITH m AS (SELECT CAST(sum(n) AS DOUBLE)/CAST(count(*) AS DOUBLE)
                       AS mean_n FROM d)
            SELECT CAST(CAST(sum(n) OVER (ORDER BY day) AS BIGINT) AS DOUBLE)
                   - CAST(row_number() OVER (ORDER BY day) AS DOUBLE) * mean_n
            FROM d CROSS JOIN m ORDER BY day
            """
        ).fetchall()
    ]
    assert duck == model  # bit-exact in DuckDB too
