"""Corpus curation batch 2 (queries/curation2.py): invariants the
DuckDB parity sweep can't express — rule counts partition the corpus,
shard digests are layout-invariant, commonness bounds hold — checked on
synthetic corpora, including shapes the fixture never produces (docs
failing each cascade rule)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.queries.curation2 import (
    _N_SHARDS,
    _doc_commonness_score,
    _quality_filter_cascade,
    _training_shard_manifest,
)
from tests.conftest import SF_DIR


def test_cascade_counts_partition_the_corpus(spark):
    """Every document lands in exactly one bucket: the rule counts must
    sum to the corpus size."""
    out = {r.rule: r.n_docs for r in _quality_filter_cascade(spark, SF_DIR).collect()}
    from data_pipeline_bigquery_spark.catalog import load

    assert sum(out.values()) == load(spark, SF_DIR, "documents").count()


def test_cascade_first_failure_attribution(spark, tmp_path):
    """Synthetic docs engineered to fail each rule — and one failing
    SEVERAL rules, which must be attributed to the FIRST in cascade
    order (min_words before repetition before stopword)."""
    docs = [
        # 1: too short (also no stopword -> must still count as min_words)
        (1, "tiny doc"),
        # 2: 40 words but one word repeated -> repetition
        (2, " ".join(["spam"] * 40)),
        # 3: 40 distinct words, no 'the'/'a' -> stopword
        (3, " ".join(f"w{i}" for i in range(40))),
        # 4: clean passing doc (has 'the', distinct, normal lengths)
        (4, "the " + " ".join(f"word{i}" for i in range(40))),
        # 5: mean word length too long -> word_length (has stopword 'the',
        # words all distinct so repetition doesn't fire first)
        (5, "the " + " ".join("x" * 20 + str(i) for i in range(40))),
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs],
                               "doc_id long, text string")
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = {r.rule: r.n_docs for r in _quality_filter_cascade(spark, sf).collect()}
    assert out == {
        "min_words": 1,
        "repetition": 1,
        "stopword": 1,
        "pass": 1,
        "word_length": 1,
    }


def test_shard_manifest_partition_and_layout_invariance(spark, tmp_path):
    """Shards partition the corpus (counts sum to total; every doc in
    exactly one shard) and the membership digest is independent of the
    physical partitioning of the input."""
    from data_pipeline_bigquery_spark.catalog import load

    m1 = {r.shard: r for r in _training_shard_manifest(spark, SF_DIR).collect()}
    total = load(spark, SF_DIR, "documents").count()
    assert sum(r.n_docs for r in m1.values()) == total
    assert set(m1) <= set(range(_N_SHARDS))

    # re-layout the same corpus into 1 file; digests must not move
    docs = load(spark, SF_DIR, "documents")
    sf2 = str(tmp_path / "relayout")
    docs.coalesce(1).write.mode("overwrite").parquet(f"{sf2}/documents.parquet")
    m2 = {r.shard: r for r in _training_shard_manifest(spark, sf2).collect()}
    assert {s: r.ids_md5 for s, r in m1.items()} == {s: r.ids_md5 for s, r in m2.items()}
    assert {s: r.total_tokens for s, r in m1.items()} == {
        s: r.total_tokens for s, r in m2.items()
    }


def test_shard_digest_detects_membership_drift(spark, tmp_path):
    """Dropping a single document changes exactly that document's
    shard digest — the manifest is the drift alarm it claims to be."""
    from data_pipeline_bigquery_spark.catalog import load

    docs = load(spark, SF_DIR, "documents")
    victim = docs.select("doc_id").orderBy("doc_id").first().doc_id
    sf2 = str(tmp_path / "dropped")
    docs.filter(F.col("doc_id") != victim).write.mode("overwrite").parquet(
        f"{sf2}/documents.parquet"
    )
    m1 = {r.shard: r.ids_md5 for r in _training_shard_manifest(spark, SF_DIR).collect()}
    m2 = {r.shard: r.ids_md5 for r in _training_shard_manifest(spark, sf2).collect()}
    changed = [s for s in m1 if m1[s] != m2.get(s)]
    assert len(changed) == 1  # exactly the victim's shard


def test_commonness_score_bounds_and_extremes(spark, tmp_path):
    """avg_word_freq is bounded by [1, total_words]; an all-unique doc
    scores the minimum of the corpus, a one-word-corpus doc the max."""
    docs = [
        (1, "alpha alpha alpha alpha"),  # common word
        (2, "beta gamma delta epsilon"),  # all unique (freq 1 each)
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs],
                               "doc_id long, text string")
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = {r.doc_id: r for r in _doc_commonness_score(spark, sf).collect()}
    assert out[1].avg_word_freq == 4.0  # 'alpha' freq 4, all four words
    assert out[2].avg_word_freq == 1.0  # every word unique
    for r in out.values():
        assert 1.0 <= r.avg_word_freq <= 8.0


def test_model_quality_score_pluggable_weights(spark):
    """The default frozen init and a supplied (learned) weight table run
    through the same plan; scores stay in (0,1); an all-positive weight
    table pushes every doc above 0.5, all-negative below — the margin
    plumbing actually routes the weights."""
    from pyspark.sql import functions as F

    from data_pipeline_bigquery_spark.extensions.curation import model_quality_score

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="aa bb cc"), Row(doc_id=2, text="dd ee"),
         Row(doc_id=3, text="   ")],
        "doc_id long, text string",
    )
    default = {r.doc_id: r for r in model_quality_score(docs).collect()}
    assert set(default) == {1, 2, 3}  # token-less doc still scores
    assert (default[3].n_tok, default[3].sw_millis, default[3].model_score) == (0, 0, 0.5)
    for r in default.values():
        assert 0.0 < r.model_score < 1.0
        assert abs(r.sw_millis) <= r.n_tok * 1000  # weights are in [-1, 1]

    pos = spark.range(1024).select(
        F.col("id").alias("fid"), F.lit(700).alias("wt_millis")
    )
    neg = spark.range(1024).select(
        F.col("id").alias("fid"), F.lit(-700).alias("wt_millis")
    )
    up = {r.doc_id: r.model_score for r in model_quality_score(docs, weights=pos).collect()}
    down = {r.doc_id: r.model_score for r in model_quality_score(docs, weights=neg).collect()}
    assert all(s > 0.5 for d, s in up.items() if d != 3)
    assert all(s < 0.5 for d, s in down.items() if d != 3)
    assert up[3] == down[3] == 0.5  # token-less doc is weight-invariant
    # rational squash is symmetric: flipped weights mirror around 0.5
    assert all(abs(up[d] + down[d] - 1.0) < 1e-9 for d in up)


def test_chi_square_independence_extremes(spark, tmp_path):
    """A perfectly independent lang x source grid scores exactly 0; a
    perfectly dependent one (lang determined by source) scores N*(k-1)."""
    from data_pipeline_bigquery_spark.queries.curation2 import _chi_square_lang_source

    # independent: every (lang, source) cell has identical count
    indep = [
        (i, "t", l, s, 1)
        for i, (l, s) in enumerate(
            (l, s) for l in ("en", "fr") for s in ("a", "b") for _ in range(10)
        )
    ]
    spark.createDataFrame(
        indep, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    row = _chi_square_lang_source(spark, str(tmp_path)).collect()[0]
    assert row.n_cells == 4 and row.chi_square == 0.0

    # dependent: lang == f(source)
    dep = [(i, "t", "en" if i % 2 == 0 else "fr", "a" if i % 2 == 0 else "b", 1) for i in range(40)]
    spark.createDataFrame(
        dep, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    row = _chi_square_lang_source(spark, str(tmp_path)).collect()[0]
    assert row.n_cells == 2
    assert row.chi_square == 40.0  # N*(k-1) for a 2x2 perfect association


def test_bpe_merge_pair_symbol_boundaries_and_greedy_overlap(spark):
    """Round-7 review finding: the merge must respect symbol boundaries
    (pair (b,c) must NOT fire inside symbol 'ab' followed by 'c') and
    be greedy non-overlapping (pair (a,a) over five 'a's → 'aa aa a';
    '(a,b)' over 'a b a b' → 'ab ab', which substring-replace misses)."""
    from pyspark.sql import functions as F

    from data_pipeline_bigquery_spark.queries.training3 import bpe_merge_pair

    df = spark.createDataFrame(
        [("ab c",), ("a b a b",), ("a a a a a",), ("x",), ("b c b",)],
        "seq string",
    )
    got = {
        r.seq: (r.bc, r.ab, r.aa)
        for r in df.select(
            "seq",
            bpe_merge_pair(F.col("seq"), "b", "c").alias("bc"),
            bpe_merge_pair(F.col("seq"), "a", "b").alias("ab"),
            bpe_merge_pair(F.col("seq"), "a", "a").alias("aa"),
        ).collect()
    }
    assert got["ab c"] == ("ab c", "ab c", "ab c")  # no cross-boundary merge
    assert got["a b a b"] == ("a b a b", "ab ab", "a b a b")
    assert got["a a a a a"] == ("a a a a a", "a a a a a", "aa aa a")
    assert got["x"] == ("x", "x", "x")
    assert got["b c b"] == ("bc b", "b c b", "b c b")


def test_bpe_train_matches_reference_python_bpe(spark, tmp_path):
    """End-to-end: the distributed trainer must produce the exact merge
    sequence of a classic in-memory BPE trainer (count adjacent symbol
    pairs weighted by word freq, merge the winner greedily, repeat) on
    a corpus engineered to hit the cross-boundary trap: after 'a b'
    merges, ('b','c') pairs survive only where 'b' is still a whole
    symbol."""
    from collections import Counter

    from data_pipeline_bigquery_spark.queries import registry

    words = ["ab"] * 12 + ["abc"] * 6 + ["ybc"] * 4 + ["zbc"] * 3
    docs_dir = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, w, "en", "s", len(w)) for i, w in enumerate(words)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{docs_dir}/documents.parquet")
    # the other fixture tables aren't read by this key
    df = registry()["bpe_train_merges"].fn(spark, docs_dir)
    got = [(r.iteration, r.pair, r.cnt) for r in df.orderBy("iteration").collect()]

    # reference python BPE on word frequencies
    vocab = {tuple(w): n for w, n in Counter(words).items()}
    expect = []
    for it in range(1, 4):
        counts = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += n
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1])
        )
        expect.append((it, f"{a} {b}", cnt))
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    assert got == expect
