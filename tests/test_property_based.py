"""Property-based checks (hypothesis): the two operators with the
subtlest semantics are verified against independent models —

* ``merge_upsert`` vs a row-at-a-time Python replay of the reference's
  MERGE statement (``/root/reference/config/bigquery/bigquery.py:245-256``),
  including the null-hostile ``!=`` cursor guard.
* ``asof_join`` vs ``pandas.merge_asof`` (direction='backward', the
  reference model implementation).

Spark round-trips are slow, so examples are kept small and deadlines
disabled; the value is in the adversarial shapes hypothesis finds
(null cursors, colliding timestamps, empty sides), not volume.
"""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: property-based model replays
pytestmark = _pytest_tier.mark.slow

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from data_pipeline_bigquery_spark.operators.asof import asof_join
from data_pipeline_bigquery_spark.operators.merge import merge_upsert

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_cursor = st.one_of(st.none(), st.integers(min_value=0, max_value=3))

_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=5), _cursor, st.text("ab", max_size=2)),
    max_size=8,
)


def _dedup_pk(rows):
    seen, out = set(), []
    for pk, cur, val in rows:
        if pk not in seen:
            seen.add(pk)
            out.append((pk, cur, val))
    return out


def _model_merge(target, source):
    """The MERGE statement replayed row-at-a-time: source wins when the
    pk is new, or when BOTH cursors are non-null and differ (SQL `!=`
    is never true against NULL)."""
    state = {pk: (cur, val) for pk, cur, val in target}
    for pk, s_cur, s_val in source:
        if pk not in state:
            state[pk] = (s_cur, s_val)
        else:
            t_cur = state[pk][0]
            if t_cur is not None and s_cur is not None and t_cur != s_cur:
                state[pk] = (s_cur, s_val)
    return {(pk, cur, val) for pk, (cur, val) in state.items()}


@given(target=_rows, source=_rows)
@settings(**_SETTINGS)
def test_merge_upsert_matches_model(spark, target, source):
    target, source = _dedup_pk(target), _dedup_pk(source)
    schema = "pk long, cursor long, val string"
    t_df = spark.createDataFrame(target, schema)
    s_df = spark.createDataFrame(source, schema)
    got = {
        (r["pk"], r["cursor"], r["val"])
        for r in merge_upsert(t_df, s_df, "pk", "cursor").collect()
    }
    assert got == _model_merge(target, source)


_ts = st.integers(min_value=0, max_value=50).map(
    lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)
)
_left_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2), _ts), min_size=1, max_size=8
)
_right_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2), _ts), max_size=8
)


@given(left=_left_rows, right=_right_rows)
@settings(**_SETTINGS)
def test_asof_join_matches_pandas(spark, left, right):
    # unique (key, ts) on the right → deterministic (operator contract);
    # value derived from (k, ts) so equality checks the chosen row.
    right = list({(k, ts) for k, ts in right})
    l_df = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)], "id long, k long, ts timestamp"
    )
    r_df = spark.createDataFrame(
        [(k, ts, float(k * 1000 + ts.minute)) for k, ts in right],
        "k long, ts timestamp, v double",
    )
    got = {
        r["id"]: (r["asof_ts"], r["asof_v"])
        for r in asof_join(l_df, r_df, "k", "ts", ["v"]).collect()
    }

    lp = pd.DataFrame(
        {
            "id": pd.array(range(len(left)), dtype="int64"),
            "k": pd.array([k for k, _ in left], dtype="int64"),
            "ts": pd.to_datetime([t for _, t in left]),
        }
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(
        {
            "k": pd.array([k for k, _ in right], dtype="int64"),
            "ts": pd.to_datetime([t for _, t in right]),
            "v": pd.array(
                [float(k * 1000 + t.minute) for k, t in right], dtype="float64"
            ),
        }
    ).sort_values("ts", kind="stable")
    merged = pd.merge_asof(
        lp, rp, on="ts", by="k", direction="backward", suffixes=("", "_r")
    )
    rts_by_kv = {(k, float(k * 1000 + t.minute)): t for k, t in right}
    for _, row in merged.iterrows():
        want_v = None if pd.isna(row["v"]) else row["v"]
        got_ts, got_v = got[row["id"]]
        assert got_v == want_v, (left, right)
        want_ts = None if want_v is None else rts_by_kv[(row["k"], want_v)]
        assert got_ts == want_ts, (left, right)
    assert len(got) == len(left)


@given(left=_left_rows, right=_right_rows)
@settings(**_SETTINGS)
def test_asof_forward_matches_pandas(spark, left, right):
    """direction='forward' mirror: next right row at or after each left
    ts, per key — vs pandas merge_asof(direction='forward')."""
    right = list({(k, ts) for k, ts in right})
    l_df = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)], "id long, k long, ts timestamp"
    )
    r_df = spark.createDataFrame(
        [(k, ts, float(k * 1000 + ts.minute)) for k, ts in right],
        "k long, ts timestamp, v double",
    )
    got = {
        r["id"]: (r["asof_ts"], r["asof_v"])
        for r in asof_join(
            l_df, r_df, "k", "ts", ["v"], direction="forward"
        ).collect()
    }

    lp = pd.DataFrame(
        {
            "id": pd.array(range(len(left)), dtype="int64"),
            "k": pd.array([k for k, _ in left], dtype="int64"),
            "ts": pd.to_datetime([t for _, t in left]),
        }
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(
        {
            "k": pd.array([k for k, _ in right], dtype="int64"),
            "ts": pd.to_datetime([t for _, t in right]),
            "v": pd.array(
                [float(k * 1000 + t.minute) for k, t in right], dtype="float64"
            ),
        }
    ).sort_values("ts", kind="stable")
    merged = pd.merge_asof(
        lp, rp, on="ts", by="k", direction="forward", suffixes=("", "_r")
    )
    rts_by_kv = {(k, float(k * 1000 + t.minute)): t for k, t in right}
    for _, row in merged.iterrows():
        want_v = None if pd.isna(row["v"]) else row["v"]
        got_ts, got_v = got[row["id"]]
        assert got_v == want_v, (left, right)
        want_ts = None if want_v is None else rts_by_kv[(row["k"], want_v)]
        assert got_ts == want_ts, (left, right)
    assert len(got) == len(left)


# --- connected components vs union-find model --------------------------------

_edges = st.lists(
    st.tuples(st.integers(min_value=0, max_value=12), st.integers(min_value=0, max_value=12)),
    min_size=1,
    max_size=14,
)


def _model_components(pairs):
    """Textbook union-find: component = min node id reachable."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    return {n: find(n) for n in parent}


@given(pairs=_edges)
@settings(**_SETTINGS)
def test_connected_components_matches_union_find(spark, pairs):
    from data_pipeline_bigquery_spark.extensions.clusters import connected_components

    # self-loops are legal input (a doc paired with itself by a detector)
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r.doc_id: r.component for r in connected_components(df).collect()}
    assert got == _model_components(pairs)


# --- incremental rollup maintenance vs full recompute ------------------------

_facts = st.lists(
    st.tuples(
        st.sampled_from(["click", "view", "buy"]),
        st.integers(min_value=0, max_value=3),   # day bucket
        st.integers(min_value=-100, max_value=100),  # cents (exact ints)
    ),
    max_size=16,
)
_splits = st.lists(st.integers(min_value=0, max_value=16), max_size=3)


@given(facts=_facts, splits=_splits)
@settings(**_SETTINGS)
def test_rollup_maintenance_any_batching_equals_recompute(spark, facts, splits):
    """IVM algebra: slicing the fact stream into ANY sequence of batches
    and folding merge_rollups over the partial aggregates must equal the
    one-shot groupBy over all facts.  Sums use exact ints so equality is
    bit-strict."""
    from pyspark.sql import functions as F

    from data_pipeline_bigquery_spark.operators.rollup_maintenance import (
        merge_rollups,
        partial_rollup,
    )

    cuts = sorted({min(s, len(facts)) for s in splits} | {0, len(facts)})
    batches = [facts[a:b] for a, b in zip(cuts, cuts[1:])]
    schema = "event_type string, day int, cents long"
    keys = ["event_type", "day"]
    sums = {"total_cents": F.col("cents")}

    rollup = None
    for batch in batches:
        if not batch:
            continue
        bdf = spark.createDataFrame(batch, schema)
        rollup = merge_rollups(
            rollup, partial_rollup(bdf, keys, sums), keys, ["n_rows", "total_cents"]
        )

    got = (
        {}
        if rollup is None
        else {
            (r.event_type, r.day): (r.n_rows, r.total_cents)
            for r in rollup.collect()
        }
    )
    expect = {}
    for et, day, cents in facts:
        n, tot = expect.get((et, day), (0, 0))
        expect[(et, day)] = (n + 1, tot + cents)
    assert got == expect


# --- mixture_resample vs an independent Python model -------------------------

_corpus = st.lists(
    st.tuples(st.integers(0, 10_000), st.sampled_from(["web", "books", "code"])),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)
_recipe = st.dictionaries(
    st.sampled_from(["web", "books", "code"]), st.integers(1, 5), min_size=1
)


@given(corpus=_corpus, recipe=_recipe)
@settings(**_SETTINGS)
def test_mixture_resample_matches_model(spark, corpus, recipe):
    """Row-level replay: the md5-bucket membership rule and the
    rate arithmetic are recomputed in plain Python; Spark must keep
    exactly the rows the model keeps."""
    import hashlib
    import math

    from pyspark.sql import Row

    from data_pipeline_bigquery_spark.extensions.sampling import mixture_resample

    df = spark.createDataFrame(
        [Row(doc_id=i, source=s) for i, s in corpus], "doc_id long, source string"
    )
    wdf = spark.createDataFrame(
        [Row(source=s, w=w) for s, w in sorted(recipe.items())], "source string, w int"
    )
    got = {(r.doc_id, r.source) for r in mixture_resample(df, wdf).collect()}

    counts: dict[str, int] = {}
    for _, s in corpus:
        counts[s] = counts.get(s, 0) + 1
    present = {s: w for s, w in recipe.items() if s in counts}
    if not present:
        assert got == set()
        return
    t = min(counts[s] / w for s, w in present.items())
    expected = set()
    for i, s in corpus:
        if s not in present:
            continue
        rate = min(1000, math.floor(1000.0 * t * present[s] / counts[s]))
        bucket = int(hashlib.md5(str(i).encode()).hexdigest()[:7], 16) % 1000
        if bucket < rate:
            expected.add((i, s))
    assert got == expected


# --- boilerplate_span_removal vs an independent Python model -----------------

_docs_corpus = st.lists(
    st.tuples(
        st.integers(0, 10_000),
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=8),
    ),
    min_size=1,
    max_size=10,
    unique_by=lambda t: t[0],
)


@given(corpus=_docs_corpus)
@settings(**_SETTINGS)
def test_boilerplate_removal_matches_model(spark, corpus, tmp_path_factory):
    """Span chunking, corpus-wide occurrence counting, keep/drop, and
    ordered reassembly replayed in plain Python; small vocab + short
    docs make span collisions (and all-boilerplate docs) common."""
    import hashlib
    from collections import Counter

    from pyspark.sql import Row

    from data_pipeline_bigquery_spark.queries.corpus_ops import (
        _BOILER_K,
        _SPAN,
        _boilerplate_span_removal,
    )

    tmp = tmp_path_factory.mktemp("bp")
    rows = [Row(doc_id=i, text=" ".join(ws)) for i, ws in corpus]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp}/documents.parquet")

    def spans(ws):
        return [
            " ".join(ws[i : i + _SPAN]) for i in range(0, len(ws), _SPAN)
        ]

    occ = Counter(s for _, ws in corpus for s in spans(ws))
    expected = {}
    for i, ws in corpus:
        kept = [s for s in spans(ws) if occ[s] < _BOILER_K]
        dropped = len(spans(ws)) - len(kept)
        clean = " ".join(kept)
        expected[i] = (
            len(kept),
            dropped,
            hashlib.md5(clean.encode()).hexdigest(),
        )

    got = {
        r.doc_id: (r.n_kept, r.n_dropped, r.clean_digest)
        for r in _boilerplate_span_removal(spark, str(tmp)).collect()
    }
    assert got == expected


# --- round 7: streaks, BFS, anomaly scoring ---------------------------------

_activity = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # user
        st.integers(min_value=0, max_value=12),  # day number
    ),
    max_size=25,
)


def _model_streaks(pairs):
    """Brute-force longest consecutive-day run per user."""
    from collections import defaultdict

    days = defaultdict(set)
    for u, d in pairs:
        days[u].add(d)
    out = {}
    for u, ds in days.items():
        best = 0
        for d in ds:
            if d - 1 not in ds:  # run start
                n = 1
                while d + n in ds:
                    n += 1
                best = max(best, n)
        out[u] = (best, len(ds))
    return out


@given(pairs=_activity)
@settings(**_SETTINGS)
def test_longest_streak_matches_bruteforce(spark, pairs):
    import datetime as dt

    from pyspark.sql import functions as F

    if not pairs:
        return
    rows = [
        (u, dt.datetime(2024, 1, 1) + dt.timedelta(days=d)) for u, d in pairs
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    # same gaps-and-islands pipeline as the registry key
    from pyspark.sql import Window

    active = df.select(
        "user_id",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"), F.lit("1970-01-01")
        ).alias("day_no"),
    ).distinct()
    grp = F.col("day_no") - F.row_number().over(
        Window.partitionBy("user_id").orderBy("day_no")
    )
    runs = (
        active.withColumn("grp", grp)
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    got = {
        r.user_id: (r.longest, r.n_days)
        for r in runs.groupBy("user_id")
        .agg(
            F.max("run_len").alias("longest"),
            F.sum("run_len").alias("n_days"),
        )
        .collect()
    }
    assert got == _model_streaks(pairs)


_graph_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7), st.integers(min_value=0, max_value=7)
    ),
    max_size=16,
)


def _model_bfs(edges, start, max_hops):
    adj = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    dist = {start: 0}
    frontier = {start}
    for h in range(1, max_hops + 1):
        frontier = {
            n for f in frontier for n in adj.get(f, ()) if n not in dist
        }
        for n in frontier:
            dist[n] = h
    return dist


@given(edges=_graph_edges)
@settings(**_SETTINGS)
def test_frontier_bfs_matches_python_bfs(spark, edges):
    from pyspark.sql import functions as F

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    start = min(min(a, b) for a, b in edges)
    und = list({(a, b) for a, b in edges} | {(b, a) for a, b in edges})
    e = spark.createDataFrame(und, "src long, dst long")
    visited = spark.createDataFrame([(start, 0)], "node long, hop int")
    frontier = visited
    for h in range(1, 4):
        reached = (
            frontier.join(e, frontier.node == e.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(h))
        )
        visited = visited.unionByName(reached)
        frontier = reached
    got = {r.node: r.hop for r in visited.collect()}
    assert got == _model_bfs(edges, start, 3)


_values = st.lists(
    st.floats(min_value=0.0, max_value=100.0, allow_nan=False, width=32),
    min_size=0,
    max_size=40,
)


def _model_zscore(values, threshold, min_n):
    import math

    flagged = []
    n, s, sq = 0, 0, 0
    for i, v in enumerate(values):
        c = math.floor(v * 100 + 0.5)
        if n >= min_n:
            mean = float(s) / float(n)
            var = float(sq) / float(n) - mean * mean
            if var > 0:
                z = (float(c) - mean) / math.sqrt(var)
                if abs(z) >= threshold:
                    flagged.append(i)
        n, s, sq = n + 1, s + c, sq + c * c
    return flagged


@given(values=_values)
@settings(**_SETTINGS)
def test_zscore_anomalies_match_sequential_model(spark, values):
    """The batch window form must flag EXACTLY the events a sequential
    integer-accumulator replay flags (same min_n/threshold) — windows
    see strictly-prior events only, in ts order."""
    import datetime as dt

    from data_pipeline_bigquery_spark.streaming.anomaly_stream import (
        zscore_anomalies,
    )

    rows = [
        (i, "t", dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i), float(v))
        for i, v in enumerate(values)
    ]
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )
    got = sorted(
        r.event_id for r in zscore_anomalies(df, threshold=2.0, min_n=5).collect()
    )
    assert got == _model_zscore(values, 2.0, 5)


# --- expectations evaluator vs a row-at-a-time model ----------------------


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 50),
            st.one_of(st.none(), st.integers(-100, 100)),
            st.one_of(st.none(), st.integers(0, 20)),
        ),
        min_size=1,
        max_size=25,
    ),
    threshold=st.integers(-50, 50),
)
@settings(**_SETTINGS)
def test_expectations_match_null_hostile_model(spark, rows, threshold):
    """evaluate_expectations vs a Python replay of the contract
    semantics: a row passes iff the predicate is True — None/NULL in
    any operand is a violation."""
    from data_pipeline_bigquery_spark.streaming.expectations_stream import (
        Expectation,
        evaluate_expectations,
    )

    rules = (
        Expectation("price_gt", f"price > {threshold}"),
        Expectation("qty_not_null", "qty IS NOT NULL"),
        Expectation("both", f"price > {threshold} AND qty < 15"),
    )

    def model(price, qty):
        return {
            "price_gt": price is not None and price > threshold,
            "qty_not_null": qty is not None,
            "both": price is not None
            and qty is not None
            and price > threshold
            and qty < 15,
        }

    expected = {r.name: 0 for r in rules}
    for _, price, qty in rows:
        ok = model(price, qty)
        for name, passed in ok.items():
            expected[name] += 0 if passed else 1

    df = spark.createDataFrame(rows, "id long, price long, qty long")
    got = {
        r.rule: r.n_violations
        for r in evaluate_expectations(df, rules).collect()
    }
    assert got == expected


# --- value-domain rank-rule percentiles vs numpy ----------------------------

_values = st.lists(
    st.integers(min_value=-50, max_value=50), min_size=1, max_size=40
)


@given(vals=_values)
@settings(**_SETTINGS)
def test_rank_rule_pct_matches_numpy_inverted_cdf(spark, vals):
    """The shared quantile_util machinery (now backing four registry
    keys) IS numpy's 'inverted_cdf' percentile: smallest value whose
    cumulative count reaches p% of the total."""
    import numpy as np
    from pyspark.sql import functions as F

    from data_pipeline_bigquery_spark.queries.quantile_util import (
        cumulative_value_histogram,
        rank_rule_pct,
    )

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    grain = df.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    cum = cumulative_value_histogram(grain, "v")
    row = cum.agg(
        rank_rule_pct(25, "v").alias("p25"),
        rank_rule_pct(50, "v").alias("p50"),
        rank_rule_pct(75, "v").alias("p75"),
        rank_rule_pct(100, "v").alias("p100"),
    ).collect()[0]
    for p, got in ((25, row.p25), (50, row.p50), (75, row.p75),
                   (100, row.p100)):
        want = int(np.percentile(vals, p, method="inverted_cdf"))
        assert got == want, (p, vals, got, want)
