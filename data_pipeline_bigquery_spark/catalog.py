"""Schema registry + table loaders.

The reference declares schemas three ways (SURVEY §1.3): hard-coded
``{column: bigquery_type}`` dicts (``/root/reference/constants.py:19-59``),
a YAML catalog (``config/bigquery/bigquery.py:41-90``), and runtime
property discovery.  Here a single registry maps logical table names to
Spark ``StructType``; the Spark session catalog (temp views) plays the
role of the YAML metastore.

Loaders read the driver's parquet fixtures with explicit schemas OFF
(parquet is self-describing; Catalyst prunes columns and pushes filters
into the scan), so the same code path works against a 100 TB partitioned
lake directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# BigQuery-type dicts from the reference, mapped to Spark types
# (reference: constants.py:19-25 cursor, constants.py:27-38 companies,
#  constants.py:40-59 email_read_log).
_BQ_TO_SPARK: dict[str, T.DataType] = {
    "STRING": T.StringType(),
    "TIMESTAMP": T.TimestampType(),
    "BOOLEAN": T.BooleanType(),
    "BOOL": T.BooleanType(),
    "INT64": T.LongType(),
    "FLOAT64": T.DoubleType(),
    "JSON": T.StringType(),  # JSON kept as string at the edge; structs internally
}


def schema_from_bq_dict(columns: dict[str, str]) -> T.StructType:
    """Translate a reference-style ``{name: BQ type}`` dict to StructType."""
    return T.StructType(
        [T.StructField(name, _BQ_TO_SPARK[bq.upper()], True) for name, bq in columns.items()]
    )


# The reference's cursor table (constants.py:19-25).
CURSOR_SCHEMA = schema_from_bq_dict(
    {
        "emitted_id": "STRING",
        "emitted_at": "TIMESTAMP",
        "cursor_date": "TIMESTAMP",
        "object": "STRING",
    }
)

# Entity tables like hubspot_companies (constants.py:27-38).
ENTITY_SCHEMA = schema_from_bq_dict(
    {
        "emitted_id": "STRING",
        "emitted_at": "TIMESTAMP",
        "createdAt": "TIMESTAMP",
        "id": "STRING",
        "updatedAt": "TIMESTAMP",
        "associations": "JSON",
        "properties": "JSON",
        "archived": "BOOLEAN",
        "archivedAt": "TIMESTAMP",
    }
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# tables whose parquet files carry TIMESTAMP(NANOS) — Spark has no nanos
# type, so they are read as long (legacy conf) and converted losslessly
# (fixture data is µs-aligned; TESTDATA.md).
_NANOS_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Plain ``spark.read.parquet`` so pushdown,
    pruning, and partition discovery all apply."""
    nanos_cols = _NANOS_TS_COLUMNS.get(name, ())
    if nanos_cols:
        # settable at runtime; also pre-set in session.get_spark
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    from pyspark.sql import functions as F

    dtypes = dict(df.dtypes)
    for c in nanos_cols:
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=FIXTURE_TABLES) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name in tables:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
