"""Batch-21 pins: fuzzy blocking, Markov rows, kappa recompute, MRR
ranks, char-class impurity, lift, and the (rows-only) zlib ratio key."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import Row

from data_pipeline_bigquery_spark.queries import analytics21
from tests.conftest import SF_DIR


def _run(spark, key):
    return analytics21.QUERIES[key].fn(spark, SF_DIR).collect()


def test_fuzzy_pairs_are_within_threshold_and_blocked(spark):
    import duckdb

    rows = _run(spark, "fuzzy_match_blocked")
    assert rows
    assert all(0 <= r.edit_dist <= analytics21._FUZZY_MAX_DIST for r in rows)
    assert all(r.key_a < r.key_b for r in rows)
    # recall vs the UNBLOCKED per-brand ground truth, recomputed in
    # DuckDB: at fixture scale the two 3-char blocks catch every d<=2
    # pair (a pair must change BOTH name ends to escape — the
    # documented miss class)
    full = duckdb.sql(
        f"""SELECT count(*) FROM '{SF_DIR}/part.parquet' a
            JOIN '{SF_DIR}/part.parquet' b
            ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
            WHERE levenshtein(a.p_name, b.p_name)
                  <= {analytics21._FUZZY_MAX_DIST}"""
    ).fetchone()[0]
    assert len(rows) == full


def test_fuzzy_fold_ambiguous_flags_nonascii_conflation(spark, tmp_path):
    """ascii_fold maps every non-ASCII code point to '?', so different
    non-Latin names fold EQUAL (edit_dist 0) — the r10-ADVICE false-
    positive class.  Pin that such pairs carry fold_ambiguous=1, that
    pure-ASCII and raw-equal pairs carry 0, and that the hostile
    fixture still hash-matches the DuckDB oracle."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    fixture = [
        (1, "B1", "abc王"),  # abc王
        (2, "B1", "abc龍"),  # abc龍 — folds equal to #1: dist 0, AMBIGUOUS
        (3, "B1", "abcd1"),
        (4, "B1", "abcd2"),  # pure-ASCII dist 1: exact, flag 0
        (5, "B1", "abc王"),  # raw-equal to #1: dist 0 is sound, flag 0
    ]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([r[0] for r in fixture], pa.int64()),
                "p_brand": [r[1] for r in fixture],
                "p_name": [r[2] for r in fixture],
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    spec = analytics21.QUERIES["fuzzy_match_blocked"]
    got = {
        (r.key_a, r.key_b): (r.edit_dist, r.fold_ambiguous)
        for r in spec.fn(spark, str(tmp_path)).collect()
    }
    assert got[(1, 2)] == (0, 1)  # the conflation class, flagged
    assert got[(3, 4)] == (1, 0)  # ASCII distance is exact
    assert got[(1, 5)] == (0, 0)  # bytewise-equal raws: 0 is sound
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM '{tmp_path}/part.parquet'")
    oracle = {
        (a, b): (d, f) for _, a, b, d, f in con.sql(spec.oracle).fetchall()
    }
    assert oracle == got


def test_markov_rows_are_conditional_distributions(spark):
    rows = _run(spark, "markov_event_transitions")
    assert rows
    by_from: dict[str, list] = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r)
    for frm, grp in by_from.items():
        tot = sum(r.n for r in grp)
        for r in grp:
            assert r.p_permille == r.n * 1000 // tot
        # permille floors sum to <= 1000 and within |types| of it
        s = sum(r.p_permille for r in grp)
        assert 1000 - len(grp) < s <= 1000


def test_interarrival_quantiles_are_ordered(spark):
    rows = _run(spark, "event_interarrival_profile")
    assert rows
    for r in rows:
        assert r.n_gaps > 0
        assert 0 <= r.p50_us <= r.p90_us <= r.p99_us


def test_kappa_matches_scalar_recompute(spark):
    (r,) = _run(spark, "cohens_kappa_detectors")
    n, n11, n10, n01, n00 = r.n, r.n11, r.n10, r.n01, r.n00
    assert n == n11 + n10 + n01 + n00
    pe = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    num = n * (n11 + n00) - pe
    den = n * n - pe
    if den == 0:
        # degenerate marginals (e.g. a corpus with no duplicates at
        # all): kappa is undefined and must surface as NULL, never a
        # division crash
        assert r.kappa_permille is None
    else:
        assert r.kappa_permille == num * 1000 // den
        # exact md5 is strictly finer than the fingerprint, so when
        # both detectors fire at all they agree far beyond chance
        assert r.kappa_permille > 0


def test_mrr_rank_reciprocal_consistency(spark):
    rows = _run(spark, "retrieval_eval_mrr")
    assert len(rows) == analytics21._MRR_N_QUERIES
    for r in rows:
        if r.first_rel_rank == 0:
            assert r.rr_permille == 0
        else:
            assert r.rr_permille == 1000 // r.first_rel_rank


def test_char_class_gini_bounds(spark):
    rows = _run(spark, "char_class_gini_by_source")
    assert rows
    for r in rows:
        # 4 classes: impurity in [0, 750] by definition
        assert 0 <= r.avg_gini_permille <= 750
        assert r.n_docs > 0


def test_lift_matches_incidence_recompute(spark):
    import duckdb

    rows = _run(spark, "cooccurrence_lift_topterms")
    assert rows
    con = duckdb.connect()
    n, = con.sql(
        f"SELECT count(DISTINCT doc_id) FROM '{SF_DIR}/documents.parquet'"
        " WHERE text IS NOT NULL"
    ).fetchone()
    for r in rows[:5]:
        # parameter binding, not interpolation: a corpus term with an
        # apostrophe must not produce malformed SQL (review finding)
        cx, cy, cxy = con.execute(
            f"""WITH inc AS (
                  SELECT DISTINCT doc_id, term FROM (
                    SELECT doc_id,
                           unnest(string_split(lower(text), ' ')) AS term
                    FROM '{SF_DIR}/documents.parquet'
                    WHERE text IS NOT NULL) WHERE term != '')
                SELECT
                  (SELECT count(*) FROM inc WHERE term = $ta),
                  (SELECT count(*) FROM inc WHERE term = $tb),
                  (SELECT count(*) FROM inc a JOIN inc b USING (doc_id)
                   WHERE a.term = $ta AND b.term = $tb)
             """,
            {"ta": r.term_a, "tb": r.term_b},
        ).fetchone()
        assert r.c_xy == cxy
        assert r.lift_e6 == cxy * n * 1_000_000 // (cx * cy)


def test_compression_ratio_pinned_values(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, source="s", text="a" * 1000),  # max repetitive
            Row(doc_id=2, source="s", text=None),
            Row(doc_id=3, source="s", text=""),
        ],
        "doc_id long, source string, text string",
    )
    rows = {
        r.doc_id: r
        for r in analytics21.compression_ratio_per_doc(docs).collect()
    }
    r1 = rows[1]
    assert r1.raw_bytes == 1000
    assert r1.zlib_bytes == len(zlib.compress(b"a" * 1000, 6))
    assert r1.ratio_permille == r1.zlib_bytes * 1000 // 1000
    assert r1.is_repetitive is True
    assert r1.roundtrip_ok is True
    for d in (2, 3):
        assert rows[d].raw_bytes == 0 and rows[d].ratio_permille is None
        assert rows[d].roundtrip_ok is True  # vacuous: nothing compressed


def test_compression_ratio_per_doc_fixture(spark):
    from data_pipeline_bigquery_spark.catalog import load

    rows = analytics21.compression_ratio_per_doc(
        load(spark, SF_DIR, "documents")
    ).collect()
    assert rows
    for r in rows:
        assert r.roundtrip_ok is True
        if r.raw_bytes > 0:
            assert r.zlib_bytes > 0
            assert r.ratio_permille == r.zlib_bytes * 1000 // r.raw_bytes


def test_compression_contract_matches_oracle_and_gates(spark):
    """The registered key's aggregates equal DuckDB's independent
    byte-sum recompute, and the gate empties when a doc fails the
    roundtrip (simulated via a broken-kernel monkeypatch)."""
    import duckdb

    rows = _run(spark, "compression_ratio_quality")
    assert rows
    ora = duckdb.sql(
        analytics21.QUERIES["compression_ratio_quality"].oracle.replace(
            "FROM documents", f"FROM '{SF_DIR}/documents.parquet'"
        )
    ).fetchall()
    assert [tuple(r) for r in rows] == ora

    # gate trips: a per-doc frame with one roundtrip_ok=false row must
    # empty the contract output
    import data_pipeline_bigquery_spark.queries.analytics21 as a21
    from unittest import mock

    from pyspark.sql import functions as F

    broken = analytics21.compression_ratio_per_doc(
        spark.createDataFrame(
            [Row(doc_id=1, source="s", text="xyz")],
            "doc_id long, source string, text string",
        )
    ).withColumn("roundtrip_ok", F.lit(False))
    with mock.patch.object(
        a21, "compression_ratio_per_doc", lambda docs: broken
    ):
        assert (
            a21.QUERIES["compression_ratio_quality"]
            .fn(spark, SF_DIR)
            .count()
            == 0
        )
