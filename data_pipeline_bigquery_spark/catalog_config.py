"""Config-file-driven table catalog — SURVEY §1.3 mechanism 2.

The reference resolves table schemas and write configs from a YAML
catalog at call time (``get_table_schema`` / ``get_table_config``,
``/root/reference/config/bigquery/bigquery.py:41-90``): each dataset
lists tables with ``columns: [{name, data-type}]`` and a dash-keyed
``config`` mapping (underscore-keyed after load).  Here the same file
shape resolves to Spark ``StructType`` (via the one BQ→Spark type map
in ``catalog.py``) and feeds the Spark session catalog: ``ensure_table``
issues the ``CREATE DATABASE`` / ``saveAsTable`` DDL so the table is
addressable as ``dataset.table`` by any SQL — the metastore plays the
role the reference's BigQuery dataset plays.

Pure metadata: parsing happens on the driver once; nothing here touches
data paths, so it is scale-independent.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from data_pipeline_bigquery_spark.catalog import schema_from_bq_dict

try:  # pyyaml is optional: JSON configs work without it
    import yaml
except ImportError:  # pragma: no cover
    yaml = None


@dataclass(frozen=True)
class TableSpec:
    dataset: str
    name: str
    schema: T.StructType
    config: dict[str, Any] = field(default_factory=dict)

    @property
    def qualified_name(self) -> str:
        return f"{self.dataset}.{self.name}"


def load_catalog_file(path: str) -> dict[str, TableSpec]:
    """Parse a catalog config file into ``{dataset.table: TableSpec}``.

    YAML when pyyaml is available; JSON otherwise (JSON is a YAML
    subset, so one loader covers both when pyyaml is present).
    Dash-keyed config entries become underscore-keyed, matching the
    reference's ``key.replace("-", "_")`` normalization.
    """
    with open(path) as fh:
        text = fh.read()
    if yaml is not None:
        data = yaml.safe_load(text)
    else:  # pragma: no cover
        import json

        data = json.loads(text)
    specs: dict[str, TableSpec] = {}
    datasets = data["project"]["datasets"]
    if isinstance(datasets, dict):  # tolerate the reference's single-mapping form
        datasets = [datasets]
    for ds in datasets:
        for tbl in ds.get("tables", ()):
            columns = {c["name"]: c["data-type"] for c in tbl.get("columns", ())}
            cfg = {
                k.replace("-", "_"): v for k, v in (tbl.get("config") or {}).items()
            }
            spec = TableSpec(
                dataset=ds["name"],
                name=tbl["name"],
                schema=schema_from_bq_dict(columns),
                config=cfg,
            )
            specs[spec.qualified_name] = spec
    return specs


def get_table_schema(specs: dict[str, TableSpec], dataset: str, table: str) -> T.StructType:
    """Reference ``get_table_schema`` analog: schema or KeyError."""
    return specs[f"{dataset}.{table}"].schema


def get_table_config(specs: dict[str, TableSpec], dataset: str, table: str) -> dict[str, Any]:
    """Reference ``get_table_config`` analog (underscore-keyed)."""
    return specs[f"{dataset}.{table}"].config


def ensure_table(spark: SparkSession, spec: TableSpec) -> None:
    """DDL round-trip: create the database and an empty managed table
    with the config-resolved schema (and partitioning, when the config
    names a ``partition_field``) if it doesn't exist yet.

    The table's storage provider comes from the config's
    ``sink-format`` key (default parquet) through the pluggable sink
    seam (:mod:`.sources.sink`) — a catalog entry can declare itself
    ORC (tested) or a connector format without any engine edit."""
    from data_pipeline_bigquery_spark.sources.sink import spec_from_table_config

    spark.sql(f"CREATE DATABASE IF NOT EXISTS {spec.dataset}")
    if spark.catalog.tableExists(spec.qualified_name):
        return
    sink = spec_from_table_config(spec.config)
    writer = spark.createDataFrame([], spec.schema).write.format(sink.format)
    if sink.options:
        writer = writer.options(**sink.options)
    part = spec.config.get("partition_field")
    if part:
        writer = writer.partitionBy(part)
    writer.saveAsTable(spec.qualified_name)


def write_table(spark: SparkSession, spec: TableSpec, df: DataFrame) -> None:
    """Write through the catalog honoring the config's
    ``write_disposition`` (append semantics; merge callers should use
    ``operators.merge.merge_upsert`` with the key config)."""
    ensure_table(spark, spec)
    # insertInto is positional, and saveAsTable(partitionBy=...) moves the
    # partition column to the END of the live table's layout — so select in
    # the live table's column order, not the YAML spec order, or a
    # partitioned table gets values written into the wrong columns.
    live_order = spark.table(spec.qualified_name).columns
    df.select(*live_order).write.insertInto(spec.qualified_name)
