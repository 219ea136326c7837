"""Batch-24 pins: the explicit Unicode-normalization pre-processing op.

The sf fixtures are ASCII (NFC is a no-op there — the registry hash
gate proves plumbing, not normalization), so the real proof lives on a
constructed hostile corpus: decomposed/precomposed pairs, combining-
mark reordering, Hangul jamo, ligatures, and the casefold tier's
engine-specific classes.
"""

from __future__ import annotations

import unicodedata

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.functions.unicode_norm import (
    nfc_normalize,
    nfkc_casefold,
)
from data_pipeline_bigquery_spark.queries import analytics24
from tests.conftest import SF_DIR

# (raw, expected-NFC-changed) — each row exercises one NFC clause
_HOSTILE = [
    ("café", 1),  # e + combining acute → é composes
    ("café", 0),  # already precomposed
    ("ṩ", 1),  # dot-below + dot-above: canonical order + compose
    ("ṩ", 0),  # ṩ precomposed
    ("가", 1),  # Hangul jamo pair → syllable 가
    ("가", 0),  # Hangul syllable already composed
    ("ﬁle", 0),  # fi ligature: NFC KEEPS compatibility chars
    ("Å", 1),  # angstrom sign → Å (canonical singleton)
    ("plain ascii", 0),
    ("", 0),
    (None, 0),
]


def _write_docs(tmp_path, texts):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": ["xx"] * len(texts),
                "source": ["hostile"] * len(texts),
                "n_chars": pa.array(
                    [0 if t is None else len(t) for t in texts], pa.int64()
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )


def test_nfc_audit_on_hostile_corpus_matches_duckdb(spark, tmp_path):
    _write_docs(tmp_path, [t for t, _ in _HOSTILE])
    spec = analytics24.QUERIES["unicode_nfc_audit"]
    got = {
        r.doc_id: (r.norm_md5, r.changed)
        for r in spec.fn(spark, str(tmp_path)).collect()
    }
    # changed flags are exactly the per-clause expectations
    assert {i: c for i, (_, c) in got.items()} == {
        i + 1: exp for i, (_, exp) in enumerate(_HOSTILE)
    }
    # NULL text → NULL digest, flagged unchanged
    assert got[len(_HOSTILE)] == (None, 0)
    # byte-exact cross-engine parity on the hostile corpus, not just
    # the ASCII fixtures the registry gate sees
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    oracle = {d: (m, c) for d, m, c in con.sql(spec.oracle).fetchall()}
    assert oracle == got


def test_nfc_audit_fixture_runs_and_is_noop_on_ascii(spark):
    out = analytics24.QUERIES["unicode_nfc_audit"].fn(spark, SF_DIR)
    rows = out.limit(50).collect()
    assert rows
    assert all(r.changed == 0 for r in rows)  # ASCII fixtures: no-op


def test_nfc_idempotent_and_equivalence_classes_collapse(spark):
    df = spark.createDataFrame(
        [(t,) for t, _ in _HOSTILE if t is not None], "t string"
    ).select(
        "t",
        nfc_normalize(F.col("t")).alias("n1"),
    ).select("t", "n1", nfc_normalize(F.col("n1")).alias("n2"))
    for r in df.collect():
        assert r.n2 == r.n1  # idempotent
        assert r.n1 == unicodedata.normalize("NFC", r.t)
    # the decomposed/precomposed pairs land on identical keys
    pairs = [("café", "café"), ("ṩ", "ṩ"),
             ("가", "가")]
    flat = spark.createDataFrame(pairs, "a string, b string").select(
        (nfc_normalize(F.col("a")) == nfc_normalize(F.col("b"))).alias("eq")
    )
    assert all(r.eq for r in flat.collect())


def test_nfkc_casefold_is_single_engine_match_key(spark):
    """The casefold tier builds keys NO cross-engine oracle could match
    (İ/ß/ς — probed divergent); pin its semantics against Python's own
    casefold so the single-engine contract is explicit."""
    cases = [
        ("İstanbul",),  # İ: dotted capital I
        ("STRASSE", ), ("straße",),  # ß ↔ SS fold together
        ("Σος",),  # final sigma
        ("ﬁle",),  # NFKC folds the ligature (unlike NFC)
        (None,),
    ]
    df = spark.createDataFrame(cases, "t string").select(
        "t", nfkc_casefold(F.col("t")).alias("k")
    )
    got = {r.t: r.k for r in df.collect()}
    for t, k in got.items():
        want = (
            None
            if t is None
            else unicodedata.normalize(
                "NFC", unicodedata.normalize("NFKC", t).casefold()
            )
        )
        assert k == want
    assert got["STRASSE"] == got["straße"] == "strasse"
    assert got["ﬁle"] == "file"
