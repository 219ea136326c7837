"""Config-file catalog (SURVEY §1.3 mechanism 2) and runtime schema
discovery (mechanism 3): schema + table-config resolution from the
shipped config file, the saveAsTable DDL round-trip, and the
discovered-property allow-list projection."""

from __future__ import annotations

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog_config import (
    ensure_table,
    get_table_config,
    get_table_schema,
    load_catalog_file,
    write_table,
)
from data_pipeline_bigquery_spark.sources.rest import (
    FakeTransport,
    RestSource,
    project_discovered,
)

CONFIG = "config/catalog.yaml"


@pytest.fixture(scope="module")
def specs():
    return load_catalog_file(CONFIG)


def test_schema_resolution(specs):
    schema = get_table_schema(specs, "crm", "cursor")
    assert schema == T.StructType(
        [
            T.StructField("emitted_id", T.StringType()),
            T.StructField("emitted_at", T.TimestampType()),
            T.StructField("cursor_date", T.TimestampType()),
            T.StructField("object", T.StringType()),
        ]
    )
    entity = get_table_schema(specs, "crm", "entity")
    assert [f.name for f in entity.fields][:4] == [
        "emitted_id",
        "emitted_at",
        "createdAt",
        "id",
    ]
    assert dict(zip([f.name for f in entity.fields], [f.dataType for f in entity.fields]))[
        "archived"
    ] == T.BooleanType()


def test_config_resolution_dash_to_underscore(specs):
    cfg = get_table_config(specs, "crm", "entity")
    assert cfg["partition_field"] == "emitted_at"
    assert cfg["write_disposition"] == "merge"
    assert cfg["cluster_fields"] == ["id"]
    with pytest.raises(KeyError):
        get_table_config(specs, "crm", "nope")


def test_ddl_round_trip(spark, specs):
    spec = specs["crm.cursor"]
    spark.sql("DROP TABLE IF EXISTS crm.cursor")
    ensure_table(spark, spec)
    # table is addressable by SQL and carries the config schema
    assert spark.catalog.tableExists("crm.cursor")
    assert spark.table("crm.cursor").schema == spec.schema
    write_table(
        spark,
        spec,
        spark.createDataFrame(
            [("r1", None, None, "companies")], spec.schema
        ),
    )
    got = spark.sql("SELECT emitted_id, object FROM crm.cursor").collect()
    assert [(r.emitted_id, r.object) for r in got] == [("r1", "companies")]
    spark.sql("DROP TABLE crm.cursor")


def test_partitioned_ddl(spark, specs):
    spec = specs["crm.email_read_log"]
    spark.sql("DROP TABLE IF EXISTS crm.email_read_log")
    ensure_table(spark, spec)
    ddl = spark.sql("DESCRIBE TABLE crm.email_read_log").collect()
    lines = [r.col_name for r in ddl]
    assert "# Partition Information" in lines  # date_read partitioning applied
    spark.sql("DROP TABLE crm.email_read_log")


def test_write_table_partitioned_spec(spark, specs):
    """saveAsTable(partitionBy) moves the partition column to the END of
    the live layout; write_table must insert by the live order, not the
    YAML spec order, or values land in the wrong columns (or fail the
    positional cast outright — CANNOT_SAFELY_CAST on this spec)."""
    import datetime as dt

    spec = specs["crm.email_read_log"]
    spark.sql("DROP TABLE IF EXISTS crm.email_read_log")
    ensure_table(spark, spec)
    row = (
        "c1",
        "e1",
        3,
        True,
        dt.datetime(2024, 5, 1, 12),
        "c1-e1",
        dt.datetime(2024, 5, 2, 8),
        "run-1",
    )
    write_table(spark, spec, spark.createDataFrame([row], spec.schema))
    got = spark.sql(
        "SELECT contact_id, hits, is_read, date_read, emitted_at, emitted_id"
        " FROM crm.email_read_log"
    ).collect()
    assert [tuple(r) for r in got] == [
        (
            "c1",
            3,
            True,
            dt.datetime(2024, 5, 1, 12),
            dt.datetime(2024, 5, 2, 8),
            "run-1",
        )
    ]
    spark.sql("DROP TABLE crm.email_read_log")


def test_discovered_projection_drops_and_nulls(spark):
    records = [
        {"id": "1", "keep": "a", "stale": "x"},
        {"id": "2", "keep": "b", "stale": "y"},
    ]
    src = RestSource(
        FakeTransport(records, properties=["id", "keep", "brand_new"]),
        "https://fake/api/things",
    )
    props = src.discover_properties()
    assert props == ["id", "keep", "brand_new"]  # from the source, not code
    df = spark.createDataFrame(records)
    out = project_discovered(df, props)
    assert out.columns == ["id", "keep", "brand_new"]  # 'stale' dropped
    rows = {r.id: r for r in out.collect()}
    assert rows["1"].brand_new is None
    assert rows["2"].keep == "b"
