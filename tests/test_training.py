"""Deterministic-sampling semantics: hash splits must be stable under
repartitioning and re-runs (the leakage-prevention property), rates
must land near their targets, contamination must find planted leaks."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.extensions.dedup_text import word_ngrams
from data_pipeline_bigquery_spark.extensions.sampling import (
    assign_split,
    contamination_report,
    deterministic_shuffle,
    hash_bucket,
    stratified_sample,
)


def _py_bucket(key: int, n: int = 100) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:7], 16) % n


def test_hash_bucket_matches_python_md5(spark):
    df = spark.range(0, 500).select(F.col("id"), hash_bucket("id").alias("b"))
    for r in df.collect():
        assert r.b == _py_bucket(r.id), r


def test_split_stable_under_repartition(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = {r.k: r.split for r in assign_split(df, "k").collect()}
    b = {r.k: r.split for r in assign_split(df.repartition(17, "k"), "k").collect()}
    assert a == b
    # fractions land near 80/10/10 (md5 is uniform; 2000 keys)
    from collections import Counter

    c = Counter(a.values())
    assert abs(c["train"] / 2000 - 0.8) < 0.05
    assert abs(c["valid"] / 2000 - 0.1) < 0.03
    assert abs(c["test"] / 2000 - 0.1) < 0.03


def test_split_percents_must_sum_to_100(spark):
    import pytest

    df = spark.range(5)
    with pytest.raises(ValueError):
        assign_split(df, "id", {"train": 50, "test": 40})


def test_stratified_sample_is_subset_with_target_rates(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "sw") for i in range(4000)], "k long, lang string"
    )
    kept = stratified_sample(df, "k", "lang", {"en": 25})
    rows = kept.collect()
    assert all(_py_bucket(r.k) < (25 if r.lang == "en" else 100) for r in rows)
    n_en = sum(1 for r in rows if r.lang == "en")
    assert abs(n_en / 2000 - 0.25) < 0.05
    assert sum(1 for r in rows if r.lang == "sw") == 2000  # default: keep all


def test_deterministic_shuffle_fixed_order(spark):
    df = spark.range(0, 300).withColumnRenamed("id", "k")
    o1 = [r.k for r in deterministic_shuffle(df, "k").collect()]
    o2 = [r.k for r in deterministic_shuffle(df.repartition(7), "k").collect()]
    assert o1 == o2
    assert o1 != sorted(o1)  # actually shuffled
    assert sorted(o1) == list(range(300))  # a permutation, nothing lost


def test_contamination_finds_planted_leak(spark):
    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight")], "doc_id long, t string"
    )
    corpus = spark.createDataFrame(
        [
            (10, "quick brown fox jumps over the lazy dog tonight"),  # near-copy
            (11, "completely unrelated words about spark shuffles and parquet"),
        ],
        "doc_id long, t string",
    )
    out = contamination_report(
        word_ngrams(corpus, "doc_id", "t"), word_ngrams(bench, "doc_id", "t"), min_rate=0.3
    ).collect()
    assert [r.doc_id for r in out] == [10]
    assert out[0].contamination_rate == 1.0  # every 3-gram of the near-copy is in bench


class TestMixtureResample:
    def _toy(self, spark):
        # 400 web, 100 books, 100 code — recipe wants 2:1:1
        rows = (
            [Row(doc_id=i, source="web") for i in range(400)]
            + [Row(doc_id=1000 + i, source="books") for i in range(100)]
            + [Row(doc_id=2000 + i, source="code") for i in range(100)]
        )
        return spark.createDataFrame(rows, "doc_id long, source string")

    def _weights(self, spark, d):
        return spark.createDataFrame(
            [Row(source=s, w=w) for s, w in d.items()], "source string, w int"
        )

    def test_output_tracks_target_mixture_without_upsampling(self, spark):
        from data_pipeline_bigquery_spark.extensions.sampling import mixture_resample

        df = self._toy(spark)
        out = mixture_resample(df, self._weights(spark, {"web": 2, "books": 1, "code": 1}))
        got = {r.source: r.n for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
        # books is the binding source (100/1 < 400/2): T=100, targets 200/100/100
        assert got["books"] == 100 and got["code"] == 100  # rate 1000 keeps all
        # web downsamples toward 200 via md5 buckets (binomial, wide tolerance)
        assert 150 <= got["web"] <= 250
        # strict subset of the input, no duplicated rows
        assert out.count() == out.select("doc_id").distinct().count()
        assert out.join(df, ["doc_id", "source"], "left_anti").count() == 0

    def test_deterministic_and_recipe_sensitive(self, spark):
        from data_pipeline_bigquery_spark.extensions.sampling import mixture_resample

        df = self._toy(spark)
        w = self._weights(spark, {"web": 2, "books": 1, "code": 1})
        a = {r.doc_id for r in mixture_resample(df, w).collect()}
        b = {r.doc_id for r in mixture_resample(df, w).collect()}
        assert a == b  # md5 membership, not sampling randomness
        w2 = self._weights(spark, {"web": 1, "books": 1, "code": 1})
        c = {r.doc_id for r in mixture_resample(df, w2).collect()}
        assert a != c  # the recipe actually drives membership

    def test_unlisted_source_dropped(self, spark):
        from data_pipeline_bigquery_spark.extensions.sampling import mixture_resample

        df = self._toy(spark)
        out = mixture_resample(df, self._weights(spark, {"web": 1, "books": 1}))
        assert out.filter(F.col("source") == "code").count() == 0


def test_mixture_resample_duplicate_recipe_rows_never_upsample(spark):
    """A source listed twice in the recipe (unioned config fragments)
    must combine additively — NOT fan out the corpus join into
    duplicated rows."""
    from data_pipeline_bigquery_spark.extensions.sampling import mixture_resample

    df = spark.createDataFrame(
        [Row(doc_id=i, source="web") for i in range(100)]
        + [Row(doc_id=1000 + i, source="books") for i in range(100)],
        "doc_id long, source string",
    )
    dup = spark.createDataFrame(
        [Row(source="web", w=1), Row(source="web", w=1), Row(source="books", w=2)],
        "source string, w int",
    )
    out = mixture_resample(df, dup)
    assert out.count() == out.select("doc_id").distinct().count()  # no dup rows
    merged = spark.createDataFrame(
        [Row(source="web", w=2), Row(source="books", w=2)], "source string, w int"
    )
    assert {r.doc_id for r in out.collect()} == {
        r.doc_id for r in mixture_resample(df, merged).collect()
    }


def test_token_weighted_sample_inclusion_tracks_length(spark, tmp_path):
    """Long docs must be sampled at (close to) their proportional rate
    and the longest doc is always kept; membership is md5-deterministic
    (identical across runs)."""
    from data_pipeline_bigquery_spark.queries.training import _token_weighted_sample

    rows = (
        [(i, " ".join(["w"] * 100)) for i in range(200)]          # long: rate 1000
        + [(1000 + i, " ".join(["w"] * 10)) for i in range(200)]  # short: rate 100
    )
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    a = {r.doc_id for r in _token_weighted_sample(spark, str(tmp_path)).collect()}
    b = {r.doc_id for r in _token_weighted_sample(spark, str(tmp_path)).collect()}
    assert a == b  # deterministic membership
    long_kept = sum(1 for d in a if d < 1000)
    short_kept = len(a) - long_kept
    assert long_kept == 200               # rate 1000 permille keeps everything
    assert 5 <= short_kept <= 40          # ~10% of 200, binomial tolerance
