"""Pluggable sink-format seam (sources/sink.py) — the BigQuery-connector
north star: any DataSource short name drops in via config, no engine
edits.  Proven here with a second LOCAL format (ORC) end-to-end through
write_sink / write_lake / the catalog DDL, plus the connector-style
path-less dispatch via Spark's built-in ``noop`` sink."""

from __future__ import annotations

import pyspark.sql.types as T
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.catalog_config import TableSpec, ensure_table
from data_pipeline_bigquery_spark.operators.merge import merge_upsert
from data_pipeline_bigquery_spark.sources.lake import write_lake
from data_pipeline_bigquery_spark.sources.sink import (
    SinkSpec,
    read_source,
    spec_from_table_config,
    write_sink,
)
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("fmt", ["parquet", "orc"])
def test_roundtrip_both_formats(spark, tmp_path, fmt):
    """Same data, same call, two formats: the seam is format-blind."""
    src = load(spark, SF_DIR, "nation")
    path = str(tmp_path / f"t_{fmt}")
    write_sink(src, SinkSpec(format=fmt), path=path, mode="overwrite")
    back = read_source(spark, SinkSpec(format=fmt), path=path)
    assert _rows(back) == _rows(src)


def test_partitioned_write_through_seam(spark, tmp_path):
    src = load(spark, SF_DIR, "nation")
    path = str(tmp_path / "part_orc")
    write_sink(
        src, SinkSpec(format="orc"), path=path, mode="overwrite",
        partition_by=("n_regionkey",),
    )
    back = read_source(spark, SinkSpec(format="orc"), path=path)
    # partition column round-trips (moved to the end by the layout, same values)
    assert _rows(back.select(*src.columns)) == _rows(src)
    import os

    assert any(d.startswith("n_regionkey=") for d in os.listdir(path))


def test_connector_style_pathless_dispatch(spark):
    """A table-addressed connector (bigquery, jdbc, kafka) takes no
    path — options carry the binding.  Spark's built-in ``noop`` sink is
    the in-sandbox stand-in: the same save() call shape the BigQuery
    connector documents."""
    src = load(spark, SF_DIR, "region")
    write_sink(src, SinkSpec(format="noop"), path=None, mode="overwrite")


def test_merge_upsert_green_through_orc_seam(spark, tmp_path):
    """K2 MERGE staged out through the seam in ORC and re-read must be
    row-identical to the in-memory merge result — the write path
    preserves merge semantics, not just schema."""
    orders = load(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    changed = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1)
        .withColumn("o_orderdate", F.date_add("o_orderdate", 30).cast("timestamp"))
    )
    merged = merge_upsert(orders, changed, pk="o_orderkey", cursor_col="o_orderdate")
    path = str(tmp_path / "merged_orc")
    write_lake(merged, path, mode="overwrite", sink=SinkSpec(format="orc"))
    back = read_source(spark, SinkSpec(format="orc"), path=path)
    assert _rows(back) == _rows(merged)


def test_append_disposition_through_seam(spark, tmp_path):
    """K1 append through the seam: two appends accumulate (the
    WRITE_APPEND disposition through a non-parquet format)."""
    src = load(spark, SF_DIR, "region")
    path = str(tmp_path / "append_orc")
    write_lake(src, path, mode="append", sink=SinkSpec(format="orc"))
    write_lake(src, path, mode="append", sink=SinkSpec(format="orc"))
    assert read_source(spark, SinkSpec(format="orc"), path=path).count() == 2 * src.count()


def test_catalog_table_with_config_format(spark):
    """A catalog entry declaring ``sink-format: orc`` creates an ORC
    provider table through ensure_table — config, not code."""
    spec = TableSpec(
        dataset="seamtest",
        name="orc_table",
        schema=T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("name", T.StringType()),
            ]
        ),
        config={"sink_format": "orc"},
    )
    spark.sql("DROP TABLE IF EXISTS seamtest.orc_table")
    ensure_table(spark, spec)
    desc = {
        r.col_name: r.data_type
        for r in spark.sql("DESCRIBE TABLE EXTENDED seamtest.orc_table").collect()
    }
    assert desc.get("Provider", "").lower() == "orc"
    spark.createDataFrame([Row(id=1, name="a")], spec.schema).write.insertInto(
        "seamtest.orc_table"
    )
    assert spark.table("seamtest.orc_table").count() == 1
    spark.sql("DROP TABLE seamtest.orc_table")


def test_spec_from_table_config_defaults():
    assert spec_from_table_config({}) == SinkSpec()
    s = spec_from_table_config(
        {"sink_format": "bigquery", "sink_options": {"table": "p.d.t"}}
    )
    assert s.format == "bigquery"
    assert s.options == {"table": "p.d.t"}
