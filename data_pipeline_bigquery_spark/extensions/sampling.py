"""Deterministic sampling / splitting for training-data pipelines.

A 100 TB pretraining corpus needs reproducible, cluster-stable answers
to "which split is this document in?", "keep 30% of English, all of
Swahili", and "give me the corpus in a fixed shuffled order".  Random
number generators are the wrong tool on a cluster — partition order and
task retries change the stream — so every operation here derives its
randomness from a content-stable hash of the row key:

    bucket(key) = int(hex(md5(key))[0:7]) mod N

md5 is available and bit-identical in every engine (Spark, DuckDB,
BigQuery, Python), which keeps the assignment portable and lets the
driver's oracle replay it exactly.  7 hex digits = 28 bits, far above
any bucket count we use, and the md5 avalanche makes the bucket
uniform and independent of key structure.

Scale design: every function below is a narrow map over the rows (hash,
compare, filter) — no shuffle, no state, no RNG — so it composes with
scans at full cluster parallelism and Catalyst pushes the resulting
filters into the parquet scan where possible.  The one exception is
:func:`deterministic_shuffle`, which is a global sort by hash — Spark
range-partitions it (sampled boundaries) so it scales as a proper
distributed sort; use it once at corpus-materialization time, not
per-epoch.

Reference parity: llgx10/data_pipeline_bigquery has no sampling surface
(SURVEY §2 end note); this module is part of the scale-out extension set
(training-data ops) the Spark engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column | str, n_buckets: int = 100) -> Column:
    """Stable uniform bucket in [0, n_buckets) from md5 of the key.

    Mirrors the DuckDB/ANSI expression
    ``CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 7)) AS BIGINT) % n``
    digit for digit.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    hex7 = F.substring(F.md5(key_col.cast("string")), 1, 7)
    return (F.conv(hex7, 16, 10).cast("long") % n_buckets).alias("bucket")


def md5_prefix_long(payload: Column) -> Column:
    """BIGINT from the first 7 hex digits of md5 of an already-built
    string payload — the row-digest idiom (< 2^28, so per-partition
    BIGINT sums never overflow).  Same digits as :func:`hash_bucket`
    without the modulus; oracle twin:
    ``CAST(('0x' || substr(md5(payload), 1, 7)) AS BIGINT)``."""
    return F.conv(F.substring(F.md5(payload), 1, 7), 16, 10).cast("long")


def assign_split(
    df: DataFrame,
    key: str,
    splits: dict[str, int] | None = None,
) -> DataFrame:
    """Add a ``split`` column ('train'/'valid'/'test' by default).

    ``splits`` maps split name -> percent; percents must sum to 100.
    The assignment is a pure function of the key, so re-runs, late
    arrivals, and incremental loads land in the same split forever —
    the property that matters for avoiding train/test leakage across
    pipeline versions.
    """
    splits = splits or {"train": 80, "valid": 10, "test": 10}
    if sum(splits.values()) != 100:
        raise ValueError(f"split percents must sum to 100: {splits}")
    b = hash_bucket(key)
    expr: Column | None = None
    hi = 0
    names = list(splits.items())
    for name, pct in names[:-1]:
        hi += pct
        branch = F.when(b < hi, F.lit(name))
        expr = branch if expr is None else expr.when(b < hi, F.lit(name))
    last = F.lit(names[-1][0])
    return df.withColumn("split", last if expr is None else expr.otherwise(last))


def stratified_sample(
    df: DataFrame,
    key: str,
    stratum: str,
    rates: dict[str, int],
    default_pct: int = 100,
) -> DataFrame:
    """Keep ``rates[stratum]`` percent of each stratum, deterministically.

    The per-stratum rate is a literal lookup (CASE), the keep decision a
    hash compare — the whole thing is one narrow filter that Catalyst
    can evaluate during the scan.  Used to rebalance a language/source
    mix (e.g. downsample English, keep all low-resource languages).
    """
    rate = F.lit(default_pct)
    for value, pct in sorted(rates.items()):
        rate = F.when(F.col(stratum) == value, F.lit(pct)).otherwise(rate)
    return df.filter(hash_bucket(key) < rate)


def deterministic_shuffle(df: DataFrame, key: str) -> DataFrame:
    """Corpus in a fixed pseudo-random global order (md5 sort key).

    A distributed sort (range partitioning), not an RNG shuffle —
    every run, on any cluster size, yields the identical order.  The
    md5 tie-break on the raw key makes the order total.
    """
    key_col = F.col(key)
    return df.orderBy(F.md5(key_col.cast("string")), key_col)


def contamination_report(
    corpus_grams: DataFrame,
    bench_grams: DataFrame,
    min_rate: float = 0.3,
) -> DataFrame:
    """Flag corpus docs whose n-gram set overlaps a benchmark set.

    Inputs are ``(doc_id, gram)`` distinct-gram tables (see
    ``dedup_text.word_ngrams``).  The benchmark side of the join is
    broadcast — eval/benchmark suites are tiny (MBs) next to a 100 TB
    corpus, so the membership probe runs map-side with no shuffle of
    the corpus grams; the only shuffle is the per-doc count aggregation,
    keyed on doc_id (naturally high-cardinality, skew-free).

    Returns ``(doc_id, n_shared, n_grams, contamination_rate)`` for
    docs with rate >= min_rate — the decontamination kill-list.
    """
    bench_set = bench_grams.select("gram").distinct()
    sizes = corpus_grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    shared = (
        corpus_grams.join(F.broadcast(bench_set), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        shared.join(sizes, "doc_id")
        .withColumn(
            "contamination_rate",
            F.round(F.col("n_shared") / F.col("n_grams"), 6),
        )
        .filter(F.col("contamination_rate") >= min_rate)
        .select("doc_id", "n_shared", "n_grams", "contamination_rate")
    )


def mixture_resample(
    df: DataFrame,
    weights: DataFrame,
    source_col: str = "source",
    key_col: str = "doc_id",
    precision: int = 1000,
) -> DataFrame:
    """Downsample sources to hit a TARGET MIXTURE — the data-recipe op
    every pretraining run starts with ("50% web, 30% books, 20% code")
    when the raw corpus arrives in whatever proportions crawling
    produced.

    Semantics: never upsample.  The feasible corpus total is set by the
    most over-demanded source — ``T = min_s(count_s / w_s)`` — and each
    source keeps ``T·w_s`` rows via a deterministic md5-bucket filter
    (per-``precision``-ile, same idiom as :func:`hash_bucket`), so the
    output mixture tracks ``weights`` and membership is stable across
    runs/engines.  Sources absent from ``weights`` are dropped (recipe
    says zero).

    One Catalyst plan, no driver math: per-source counts (one agg on a
    low-cardinality key), a 1-row min (broadcast scalar pattern), the
    rate table broadcast back onto the corpus, one map-side filter.
    The corpus itself is scanned once and never shuffled — at 100 TB
    the only full-size pass is the final filter.

    ``weights`` is ``(source, w)`` with integer ``w`` (relative parts,
    need not sum to anything); a source listed more than once (e.g.
    unioned recipe fragments) combines ADDITIVELY — the weights are
    aggregated before any join, so duplicate recipe rows can never fan
    out the corpus join and break the never-upsample contract.
    Returns the surviving rows of ``df``.
    """
    weights = weights.groupBy(source_col).agg(F.sum("w").alias("w"))
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    wt = counts.join(weights, source_col)
    t = wt.agg(
        F.min(F.col("__n").cast("double") / F.col("w").cast("double")).alias("__t")
    )
    rates = (
        wt.crossJoin(F.broadcast(t))
        .select(
            source_col,
            F.least(
                F.lit(precision).cast("long"),
                F.floor(
                    F.lit(float(precision)) * F.col("__t") * F.col("w").cast("double")
                    / F.col("__n").cast("double")
                ).cast("long"),
            ).alias("__rate"),
        )
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(hash_bucket(F.col(key_col), precision) < F.col("__rate"))
        .drop("__rate")
    )
