"""Pluggable sink/source format seam — the BigQuery-connector north star.

BASELINE's stated approach for this engine is "DataFrame ops + BigQuery
connector", and the reference's entire sink layer is BigQuery
(``/root/reference/config/bigquery/bigquery.py:206-271``: temp-table
load + MERGE/append disposition against a configured table).  This
sandbox has no network and no BigQuery, so the engine's default sink is
the parquet lake — but everything below is format-parameterized so
``spark-bigquery-connector`` (or Delta, Iceberg, Kafka, any DataSource
short name on the classpath) drops in via CONFIG, not code edits::

    # lake default
    write_sink(df, SinkSpec(), path="/lake/orders")
    # BigQuery, the day the connector jar is on the classpath
    write_sink(df, SinkSpec(format="bigquery",
                            options={"table": "proj.ds.orders",
                                     "temporaryGcsBucket": "stage"}))

Dispatch rule: path-addressed formats (parquet/orc/csv/json/avro...)
``save(path)``; table-addressed connectors (bigquery, jdbc, kafka) are
configured entirely through options and ``save()`` without a path —
exactly how the Spark BigQuery connector is documented to be called.

The seam is exercised end-to-end with a second *local* format (ORC) in
``tests/test_sink_seam.py`` and by the ``sink_seam_merge_roundtrip``
registry key: the K2 MERGE result is staged out and re-read through the
seam and must still hash-match the DuckDB merge oracle — proving the
write path is semantics-preserving, not just runnable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class SinkSpec:
    """One sink/source binding: a DataSource short name plus its options.

    ``format`` is any registered DataSource name.  ``options`` go to
    ``DataFrameWriter.options`` verbatim (connector table refs,
    compression codecs, CSV headers...).  No engine code switches on the
    format name — that is the point of the seam.
    """

    format: str = "parquet"
    options: Mapping[str, Any] = field(default_factory=dict)


def write_sink(
    df: DataFrame,
    spec: SinkSpec = SinkSpec(),
    path: str | None = None,
    mode: str = "append",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Write ``df`` through the configured sink.

    Path-addressed sinks pass ``path``; connector-style sinks (e.g.
    ``bigquery`` with a ``table`` option) pass ``path=None``.  Retries
    remain Spark task retries; atomicity is the committer's/connector's
    job — no hand-rolled retry loop (the reference's per-file retry at
    ``gcs.py:204-229`` is subsumed).
    """
    writer = df.write.format(spec.format).mode(mode)
    if spec.options:
        writer = writer.options(**spec.options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if path is not None:
        writer.save(path)
    else:
        writer.save()


def read_source(
    spark: SparkSession,
    spec: SinkSpec = SinkSpec(),
    path: str | None = None,
    schema=None,
) -> DataFrame:
    """Read back through the same binding (scan twin of the sink)."""
    reader = spark.read.format(spec.format)
    if spec.options:
        reader = reader.options(**spec.options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path) if path is not None else reader.load()


def spec_from_table_config(config: Mapping[str, Any]) -> SinkSpec:
    """Build the sink binding from a catalog table config (the YAML
    ``config:`` mapping, underscore-normalized) — the reference resolves
    its write disposition/table ref the same way
    (``bigquery.py:41-90``).  Recognized keys: ``sink_format`` (default
    ``parquet``) and ``sink_options`` (a nested mapping)."""
    return SinkSpec(
        format=str(config.get("sink_format", "parquet")),
        options=dict(config.get("sink_options") or {}),
    )
