"""Local replica of the driver's Spark-vs-DuckDB comparison: row count,
column names, and order-insensitive exact value equality (columns sorted
by name, rows sorted, values normalized)."""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb

from data_pipeline_bigquery_spark.catalog import FIXTURE_TABLES, table_path


def duckdb_result(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    cur = con.sql(sql)
    return [d[0] for d in cur.description], cur.fetchall()


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def normalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def compare(spark_df, sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    problems: list[str] = []
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = duckdb_result(sql, sf_dir)
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}")
    sn, dn = normalize(s_cols, s_rows), normalize(d_cols, d_rows)
    if sn != dn:
        diff_count = 0
        for a, b in zip(sn, dn):
            if a != b:
                diff_count += 1
                if diff_count <= 3:
                    problems.append(f"row differs:\n  spark : {a}\n  duckdb: {b}")
        if diff_count > 3:
            problems.append(f"... {diff_count} differing rows total")
        if not problems:
            problems.append("value mismatch (row sets differ)")
    return problems
