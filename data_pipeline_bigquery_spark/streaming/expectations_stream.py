"""Streaming data-contract monitor — the per-batch twin of
``queries/evalops._data_expectations_report``.

Every micro-batch of a typed stream is scored against a declarative
rule set (SQL boolean expressions; a row PASSES iff the expression is
TRUE — NULL counts as a violation, the null-hostile reading a contract
wants).  Three idempotent epoch-partitioned outputs:

- a **ledger**: one row per (epoch, rule) with checked/violation
  counts — the time series a quality dashboard plots;
- a **good** sink: rows passing every *blocking* rule;
- a **reject** sink: rows failing at least one blocking rule, stamped
  with the names of the rules they failed (the triage column).

Replay safety is the house recipe (:mod:`.neardup_stream`,
:mod:`.quarantine_stream`): every sink partitions by epoch with
dynamic partition overwrite, so an at-least-once replay of a batch
replaces its own partitions and the ledger never double-counts.
Per-batch cost is O(batch): one projection computes all rule flags,
one aggregate produces the ledger row set, and the routing filter
reuses the same flags.

Scope: rules here are PER-ROW predicates.  Cross-row contracts
(uniqueness) and cross-table ones (referential integrity) need state
beyond a micro-batch and stay batch/snapshot concerns —
``data_expectations_report`` covers both on the lake.

The reference has no quality layer at all (its pandas ETL trusts the
CRM payloads end-to-end) — this is beyond-reference hardening.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import reduce
from operator import and_

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.streaming.epochs import (
    write_epoch_partitioned,
)

_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


@dataclass(frozen=True)
class Expectation:
    """One per-row contract rule.

    ``expr`` is a SQL boolean over the stream's columns; a row passes
    iff it evaluates TRUE (NULL → violation).  ``blocking`` rules
    route failing rows to the reject sink; non-blocking ("warn")
    rules only count in the ledger.  Names are identifiers
    (``[A-Za-z_][A-Za-z0-9_]*``) — they become internal flag columns,
    and a dot or backtick would be parsed as a struct-field access.
    """

    name: str
    expr: str
    blocking: bool = True

    def __post_init__(self):
        if not _NAME_RE.match(self.name):
            raise ValueError(
                f"expectation name {self.name!r} must be an identifier "
                "([A-Za-z_][A-Za-z0-9_]*)"
            )


def _flag(rule: Expectation) -> F.Column:
    # TRUE -> 1, FALSE/NULL -> 0: coalesce AFTER the cast keeps the
    # null-hostile contract reading in one branch-free expression
    return F.coalesce(
        F.expr(rule.expr).cast("int"), F.lit(0)
    ).alias(f"__ok_{rule.name}")


def evaluate_expectations(
    df: DataFrame, rules: tuple[Expectation, ...] | list[Expectation]
) -> DataFrame:
    """Score a frame against the rule set: one row per rule with
    ``(rule, n_checked, n_violations, blocking)`` — ONE aggregate pass
    over the input.  Shared by the streaming monitor and the snapshot
    store's write-audit-publish verb."""
    return _ledger_from_flags(
        df.select(*[_flag(r) for r in rules]), rules
    )


def _ledger_from_flags(
    flagged: DataFrame, rules: tuple[Expectation, ...] | list[Expectation]
) -> DataFrame:
    counts = flagged.agg(
        F.count(F.lit(1)).alias("n_checked"),
        *[
            F.sum(1 - F.col(f"__ok_{r.name}")).alias(f"__v_{r.name}")
            for r in rules
        ],
    )
    return counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r.name).alias("rule"),
                        F.col("n_checked").cast("long").alias("n_checked"),
                        F.col(f"__v_{r.name}").cast("long").alias(
                            "n_violations"
                        ),
                        F.lit(int(r.blocking)).cast("long").alias(
                            "blocking"
                        ),
                    )
                    for r in rules
                ]
            )
        ).alias("o")
    ).select("o.rule", "o.n_checked", "o.n_violations", "o.blocking")


def process_expectations_batch(
    batch_df: DataFrame,
    epoch_id: int,
    rules: tuple[Expectation, ...] | list[Expectation],
    ledger_path: str,
    good_path: str | None = None,
    reject_path: str | None = None,
) -> None:
    """Score one micro-batch, append the ledger, route rows.

    Passing ``good_path``/``reject_path`` as None skips the routing
    sinks (monitor-only mode — the ledger still lands)."""
    if batch_df.isEmpty():
        return
    flagged = batch_df.select("*", *[_flag(r) for r in rules]).persist()
    try:
        write_epoch_partitioned(
            _ledger_from_flags(flagged, rules), epoch_id, ledger_path
        )

        if good_path or reject_path:
            blocking_rules = [r for r in rules if r.blocking]
            # conjunction via reduce, not F.least: least() requires >= 2
            # columns and a ONE-blocking-rule contract is perfectly normal
            ok_all = reduce(
                and_,
                [F.col(f"__ok_{r.name}") == 1 for r in blocking_rules],
                F.lit(True),
            )
            flags = [f"__ok_{r.name}" for r in rules]
            if good_path:
                write_epoch_partitioned(
                    flagged.filter(ok_all).drop(*flags), epoch_id, good_path
                )
            # all-warn rule sets can't produce rejects — and concat_ws
            # over zero name columns wouldn't build anyway
            if reject_path and blocking_rules:
                failed_names = F.concat_ws(
                    ",",
                    *[
                        F.when(
                            F.col(f"__ok_{r.name}") == 0, F.lit(r.name)
                        )
                        for r in blocking_rules
                    ],
                )
                write_epoch_partitioned(
                    flagged.filter(~ok_all)
                    .withColumn("failed_rules", failed_names)
                    .drop(*flags),
                    epoch_id,
                    reject_path,
                )
    finally:
        flagged.unpersist()


def expectations_stream(
    stream: DataFrame,
    rules: tuple[Expectation, ...] | list[Expectation],
    ledger_path: str,
    good_path: str | None = None,
    reject_path: str | None = None,
    checkpoint: str | None = None,
):
    """Attach the monitor to any streaming DataFrame.  Returns the
    StreamingQuery (caller stops it)."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        process_expectations_batch(
            batch_df, epoch_id, rules, ledger_path, good_path, reject_path
        )

    writer = stream.writeStream.foreachBatch(process)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def ledger_rollup(spark: SparkSession, ledger_path: str) -> DataFrame:
    """Cumulative per-rule totals over every epoch written so far —
    the dashboard query (a tiny keyed agg over the ledger, which is
    rules × epochs rows, never data-proportional).

    A just-started monitor that hasn't committed an epoch yet is a
    NORMAL state (ADVICE r07): it returns an empty ledger-shaped frame
    instead of leaking a raw PATH_NOT_FOUND AnalysisException."""
    from pyspark.errors import AnalysisException

    try:
        ledger = spark.read.parquet(ledger_path)
    except AnalysisException as exc:
        # Prefer the stable error class (ADVICE r08); the message
        # substring is only the fallback for Spark builds whose
        # AnalysisException carries no class.
        try:
            err_class = exc.getErrorClass()
        except Exception:
            err_class = None
        if err_class is not None:
            if err_class != "PATH_NOT_FOUND":
                raise
        elif (
            "PATH_NOT_FOUND" not in str(exc)
            and "Path does not exist" not in str(exc)
        ):
            raise
        # schema mirrors _ledger_from_flags (+ the discovered epoch
        # partition column) so the rollup's output types are identical
        # whether or not an epoch exists yet
        ledger = spark.createDataFrame(
            [],
            "rule STRING, n_checked BIGINT, n_violations BIGINT, "
            "blocking BIGINT, epoch INT",
        )
    return (
        ledger
        .groupBy("rule")
        .agg(
            F.sum("n_checked").alias("n_checked"),
            F.sum("n_violations").alias("n_violations"),
            F.max("blocking").alias("blocking"),
            F.countDistinct("epoch").alias("n_epochs"),
        )
    )
