"""Behavioral check for boilerplate_span_removal (queries/corpus_ops.py):
corpus-frequent spans vanish from every document, unique spans survive
in order, and an all-boilerplate document still emits a row."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row

from data_pipeline_bigquery_spark.queries.corpus_ops import _boilerplate_span_removal


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_global_spans_removed_documents_reassembled(spark, tmp_path):
    # span grain is 3 words; "cookie banner text" opens docs 1 AND 2 →
    # corpus count 2 → boilerplate.  Doc 3 is nothing but that banner.
    docs = [
        (1, "cookie banner text alpha beta gamma"),
        (2, "cookie banner text delta epsilon zeta"),
        (3, "cookie banner text"),
        (4, "eta theta iota"),
    ]
    spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in docs], "doc_id long, text string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    out = {r.doc_id: r for r in _boilerplate_span_removal(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 3, 4}  # no doc lost, including the emptied one
    assert (out[1].n_kept, out[1].n_dropped) == (1, 1)
    assert out[1].clean_digest == _md5("alpha beta gamma")
    assert out[2].clean_digest == _md5("delta epsilon zeta")
    assert (out[3].n_kept, out[3].n_dropped) == (0, 1)
    assert out[3].clean_digest == _md5("")  # fully-boilerplate doc → empty text
    assert (out[4].n_kept, out[4].n_dropped) == (1, 0)
    assert out[4].clean_digest == _md5("eta theta iota")


def test_surviving_spans_keep_document_order(spark, tmp_path):
    # the repeated middle span drops; the outer spans must rejoin in
    # original order, not collection order
    docs = [
        (1, "one two three dup dup dup seven eight nine"),
        (2, "dup dup dup"),
    ]
    spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in docs], "doc_id long, text string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r.doc_id: r for r in _boilerplate_span_removal(spark, str(tmp_path)).collect()}
    assert out[1].clean_digest == _md5("one two three seven eight nine")


def test_corpus_drift_flags_flooded_term(spark, tmp_path):
    """A term that floods the candidate (new) half must rank first by
    the cross-multiplied drift statistic; a term with identical
    frequency in both halves contributes zero drift."""
    import hashlib

    from data_pipeline_bigquery_spark.queries.corpus_ops import (
        _corpus_drift_topterms,
    )

    def half(i):  # mirror of sampling.hash_bucket(..., 100) < 50
        return int(hashlib.md5(str(i).encode()).hexdigest()[:7], 16) % 100 < 50

    old_ids = [i for i in range(200) if half(i)]
    new_ids = [i for i in range(200) if not half(i)]
    # 'base' keeps identical relative frequency in both halves → zero
    # drift; 'spamword' (new-only) and 'filler' (old-only) carry the
    # shifted mass — L1 drift is symmetric, so they tie at the top
    rows = [(i, "base filler") for i in old_ids] + [
        (i, "base spamword") for i in new_ids
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")

    out = _corpus_drift_topterms(spark, str(tmp_path)).collect()
    drift = {r["term"]: r["drift_num"] for r in out}
    rows_by_term = {r["term"]: r for r in out}
    assert {out[0]["term"], out[1]["term"]} == {"filler", "spamword"}
    assert drift["filler"] == drift["spamword"] > 0
    assert rows_by_term["spamword"]["c_old"] == 0
    assert rows_by_term["spamword"]["c_new"] == len(new_ids)
    assert drift["base"] == 0  # stable-frequency term contributes nothing


def test_bpe_pair_stats_weighted_by_word_frequency(spark, tmp_path):
    """Pair counts must be weighted by corpus word frequency computed
    over the vocabulary (the BPE pre-aggregation trick), with the _
    end-marker keeping merges inside word boundaries."""
    from data_pipeline_bigquery_spark.queries.corpus_ops import _bpe_pair_stats

    docs = [(1, "ab ab ab"), (2, "ab cd")]
    spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in docs], "doc_id long, text string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r.pair: r.weighted_count for r in _bpe_pair_stats(spark, str(tmp_path)).collect()}
    # 'ab' occurs 4 times, 'cd' once; end-of-word pairs use the \x01 sentinel
    assert out == {"ab": 4, "b\x01": 4, "cd": 1, "d\x01": 1}


def test_bpe_sentinel_does_not_collide_with_literal_underscore(spark, tmp_path):
    """snake_case words carry literal underscores; their mid-word pairs
    must stay distinct from end-of-word pairs (the reason the sentinel
    is out-of-alphabet, not '_')."""
    from data_pipeline_bigquery_spark.queries.corpus_ops import _bpe_pair_stats

    spark.createDataFrame(
        [Row(doc_id=1, text="a_b ca")], "doc_id long, text string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r.pair: r.weighted_count for r in _bpe_pair_stats(spark, str(tmp_path)).collect()}
    # 'a_b\x01': pairs a_, _b, b\x01 ; 'ca\x01': ca, a\x01 — the literal
    # 'a_' (mid-word) and the end-marker 'a\x01' are separate candidates
    assert out["a_"] == 1 and out["a\x01"] == 1


def test_dedup_time_windowed_burst_chaining(spark, tmp_path):
    """Bursts chain: 0, 25min, 50min are ONE burst (each gap <= 30min)
    even though first-to-last exceeds the window; a 2h-later event
    starts burst 2.  Different (user, type) streams never interact."""
    from datetime import datetime, timedelta

    from data_pipeline_bigquery_spark.queries.coverage3 import _dedup_time_windowed

    t0 = datetime(2024, 1, 1, 12, 0)
    rows = [
        (1, t0, 10, "click", 0.0, "{}"),
        (2, t0 + timedelta(minutes=25), 10, "click", 0.0, "{}"),
        (3, t0 + timedelta(minutes=50), 10, "click", 0.0, "{}"),
        (4, t0 + timedelta(hours=3), 10, "click", 0.0, "{}"),
        (5, t0 + timedelta(minutes=1), 10, "view", 0.0, "{}"),
        (6, t0 + timedelta(minutes=2), 11, "click", 0.0, "{}"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    kept = {r.event_id: r.burst for r in _dedup_time_windowed(spark, str(tmp_path)).collect()}
    assert kept == {1: 1, 4: 2, 5: 1, 6: 1}  # 2,3 suppressed into burst 1


def test_pattern_no_intervening_negative_condition(spark, tmp_path):
    """The negation is interval-scoped and user-scoped: an error INSIDE
    the signup->purchase window kills the match; an error outside it,
    or another user's error inside it, does not."""
    from datetime import datetime, timedelta

    from data_pipeline_bigquery_spark.queries.coverage3 import _pattern_no_intervening

    t0 = datetime(2024, 1, 1, 12, 0)
    m = timedelta(minutes=1)
    rows = [
        # user 1: clean conversion
        (1, t0, 1, "signup", 0.0, "{}"),
        (2, t0 + 5 * m, 1, "purchase", 0.0, "{}"),
        # user 2: error inside the window -> excluded
        (3, t0, 2, "signup", 0.0, "{}"),
        (4, t0 + 2 * m, 2, "error", 0.0, "{}"),
        (5, t0 + 5 * m, 2, "purchase", 0.0, "{}"),
        # user 3: error BEFORE signup and AFTER purchase -> still clean
        (6, t0 - 5 * m, 3, "error", 0.0, "{}"),
        (7, t0, 3, "signup", 0.0, "{}"),
        (8, t0 + 5 * m, 3, "purchase", 0.0, "{}"),
        (9, t0 + 9 * m, 3, "error", 0.0, "{}"),
        # user 4: purchase before signup only -> no conversion
        (10, t0 - 5 * m, 4, "purchase", 0.0, "{}"),
        (11, t0, 4, "signup", 0.0, "{}"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {r.user_id for r in _pattern_no_intervening(spark, str(tmp_path)).collect()}
    assert got == {1, 3}


def test_clamped_running_balance_matches_sequential_replay(spark, tmp_path):
    """The prefix-min closed form must equal the literal recurrence
    b_i = max(0, b_{i-1} + delta_i) replayed sequentially."""
    from datetime import datetime, timedelta

    from data_pipeline_bigquery_spark.queries.coverage3 import _clamped_running_balance

    t0 = datetime(2024, 1, 1)
    # values chosen so deltas (floor(v*100) - 5000) swing both ways AND
    # the leading negatives force the clamp to fire
    values = [10.0, 1.0, 120.0, 95.0, 1.0, 1.0, 200.0]
    rows = [
        (i, t0 + timedelta(minutes=i), 1, "click", v, "{}")
        for i, v in enumerate(values)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    got = {
        r.event_id: r.balance
        for r in _clamped_running_balance(spark, str(tmp_path)).collect()
    }
    import math

    b, expected = 0, {}
    for i, v in enumerate(values):
        b = max(0, b + (math.floor(v * 100) - 5000))
        expected[i] = b
    assert got == expected
    assert any(v == 0 for v in expected.values())  # the clamp actually fired


def test_containment_catches_what_jaccard_misses(spark):
    """A short doc fully inside a much longer one: containment(short in
    long) = 1.0 while jaccard stays far below any dedup threshold —
    the asymmetric measure's reason to exist."""
    from pyspark.sql import functions as F

    from data_pipeline_bigquery_spark.extensions.dedup_text import (
        containment_pairs,
        ngram_jaccard_pairs,
        word_ngrams,
    )

    short = "alpha beta gamma delta epsilon"
    longer = short + " " + " ".join(f"w{i}" for i in range(50))
    docs = spark.createDataFrame(
        [Row(doc_id=1, t=short), Row(doc_id=2, t=longer)], "doc_id long, t string"
    )
    grams = word_ngrams(docs, "doc_id", "t")
    cont = containment_pairs(grams, threshold=0.8).collect()
    assert len(cont) == 1
    assert cont[0]["containment_a_in_b"] == 1.0  # doc 1 fully inside doc 2
    assert cont[0]["containment_b_in_a"] < 0.2
    jac = ngram_jaccard_pairs(grams, threshold=0.5).collect()
    assert jac == []  # symmetric measure misses the containment entirely


def test_event_transitions_count_consecutive_pairs_per_user(spark, tmp_path):
    """Transitions are per-user consecutive pairs in time order; streams
    of different users never chain, and permille shares normalize over
    each from-type's outgoing mass."""
    from datetime import datetime, timedelta

    from data_pipeline_bigquery_spark.queries.coverage3 import _event_transitions

    t0 = datetime(2024, 1, 1)
    m = timedelta(minutes=1)
    rows = [
        (1, t0, 1, "signup", 0.0, "{}"),
        (2, t0 + m, 1, "click", 0.0, "{}"),
        (3, t0 + 2 * m, 1, "click", 0.0, "{}"),
        (4, t0 + 3 * m, 1, "purchase", 0.0, "{}"),
        # user 2 starts with purchase: no cross-user chain from user 1
        (5, t0 + 4 * m, 2, "purchase", 0.0, "{}"),
        (6, t0 + 5 * m, 2, "click", 0.0, "{}"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {(r.from_type, r.to_type): r for r in _event_transitions(spark, str(tmp_path)).collect()}
    assert set(out) == {("signup", "click"), ("click", "click"), ("click", "purchase"), ("purchase", "click")}
    assert out[("click", "click")].n == 1 and out[("click", "purchase")].n == 1
    # click's outgoing mass = 2 → each transition is 500 permille
    assert out[("click", "click")].permille_of_from == 500
    assert out[("signup", "click")].permille_of_from == 1000


def test_event_lateness_audit_detects_late_arrivals(spark, tmp_path):
    """A perturbed arrival stream (event 3 carries an OLD timestamp)
    must register as late with the right lateness in seconds; the clean
    fixture asserts zeros in the registry oracle."""
    from datetime import datetime, timedelta

    from data_pipeline_bigquery_spark.queries.coverage3 import _event_lateness_audit

    t0 = datetime(2024, 1, 1)
    m = timedelta(minutes=1)
    rows = [
        (1, t0, 1, "a", 0.0, "{}"),
        (2, t0 + 10 * m, 1, "a", 0.0, "{}"),
        (3, t0 + 2 * m, 2, "a", 0.0, "{}"),   # arrives 3rd, 8 min late
        (4, t0 + 11 * m, 2, "a", 0.0, "{}"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    row = _event_lateness_audit(spark, str(tmp_path)).collect()[0]
    assert (row.n_events, row.n_late, row.max_late_s) == (4, 1, 480)
