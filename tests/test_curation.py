"""Curation operator semantics: redaction counts/bytes, repetition
fractions, group caps, packing invariants."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.extensions.curation import (
    cap_per_group,
    pack_sequences,
    redact_pii,
    repetition_stats,
)


def test_redact_pii_counts_and_digest(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="Mail a@b.co or c.d+x@e-f.org now"),
            Row(doc_id=2, text="call +1 555-123-4567 thanks"),
            Row(doc_id=3, text="no pii here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in redact_pii(df, "doc_id", "text").collect()}
    assert (out[1].n_emails, out[1].n_phones) == (2, 0)
    assert (out[2].n_emails, out[2].n_phones) == (0, 1)
    assert (out[3].n_emails, out[3].n_phones) == (0, 0)
    assert out[1].redacted_md5 == hashlib.md5(b"mail <email> or <email> now").hexdigest()
    assert out[2].redacted_md5 == hashlib.md5(b"call <phone> thanks").hexdigest()
    assert out[3].redacted_md5 == hashlib.md5(b"no pii here").hexdigest()


def test_repetition_fraction(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b a b a b"),  # grams: ab,ba,ab,ba,ab -> 2/5 distinct
            Row(doc_id=2, text="all words here differ fully"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_stats(df, "doc_id", "text", n=2).collect()}
    assert (out[1].total_grams, out[1].distinct_grams, out[1].dup_fraction) == (5, 2, 0.6)
    assert out[2].dup_fraction == 0.0


def test_cap_per_group_keeps_top_n_deterministically(spark):
    df = spark.createDataFrame(
        [(g, i, 100 - i) for g in ("x", "y") for i in range(10)],
        "g string, id long, score long",
    )
    kept = cap_per_group(df, "g", [F.col("score").desc(), F.col("id").asc()], n=3).collect()
    by_g = {}
    for r in kept:
        by_g.setdefault(r.g, []).append(r.id)
    assert sorted(by_g["x"]) == [0, 1, 2]  # highest scores = lowest ids
    assert sorted(by_g["y"]) == [0, 1, 2]


def test_pack_sequences_invariants(spark):
    df = spark.createDataFrame(
        [(s, i, 100) for s in ("s1", "s2") for i in range(20)],
        "shard string, doc_id long, tok long",
    )
    out = pack_sequences(df, "shard", "doc_id", F.col("tok"), ctx=512).collect()
    for r in out:
        # doc i (100 tokens each): bin = floor(100*i / 512)
        assert r.bin_id == (100 * r.doc_id) // 512, r
    # bins independent per shard, every doc assigned exactly once
    assert len(out) == 40
    # packing respects order: bin ids are monotone in doc_id within shard
    for s in ("s1", "s2"):
        bins = [r.bin_id for r in sorted(out, key=lambda r: r.doc_id) if r.shard == s]
        assert bins == sorted(bins)
