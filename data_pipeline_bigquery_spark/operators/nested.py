"""Nested-data / JSON operators (SURVEY §2.9 N1-N5).

Reference: pandas ``df.explode`` over property-version arrays
(``/root/reference/pipeline/hubspot_deal_logs/hubspot_deal_log_pipeline.py:53-54``),
per-row dict ``.get`` chains for struct extraction (``:57-87``),
``json.dumps`` row serialization for the ``raw`` audit column
(``:93-96``), and the recursive ``traverse_dict`` flattener
(``transformation/transformation.py:5-15``).

All become single Catalyst expressions over columnar data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_array_field(
    df: DataFrame,
    array_col: str,
    out_col: str = "item",
    outer: bool = True,
    with_pos: bool = False,
) -> DataFrame:
    """N1 explode_array: one row per array element.

    ``outer=True`` matches pandas ``explode`` (keeps rows whose array is
    empty/NULL as a NULL element).  ``with_pos`` adds the 0-based element
    index (``posexplode``).  Narrow op — no shuffle.
    """
    if with_pos:
        fn = F.posexplode_outer if outer else F.posexplode
        return df.select("*", fn(array_col).alias("pos", out_col)).drop(array_col)
    fn = F.explode_outer if outer else F.explode
    return df.select("*", fn(array_col).alias(out_col)).drop(array_col)


def json_field(col: Column | str, path: str) -> Column:
    """N2 nested_field_extract on JSON-string columns:
    ``x.get('value')`` ≙ ``get_json_object(c, '$.value')``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, path)


def flatten_struct(df: DataFrame, struct_col: str, prefix: str = "") -> DataFrame:
    """N4/N5 flatten: promote every field of a struct column to top level."""
    fields = df.schema[struct_col].dataType.fieldNames()
    cols = [c for c in df.columns if c != struct_col]
    return df.select(
        *cols, *[F.col(f"{struct_col}.{f}").alias(f"{prefix}{f}") for f in fields]
    )


def serialize_row_json(df: DataFrame, columns: list[str], out_col: str = "raw") -> DataFrame:
    """N3 to_json_serialize: whole-row audit JSON
    (``create_dict`` + ``json.dumps``, deal_log_pipeline.py:22-34,93-96)
    ≙ ``to_json(struct(...))`` — no UDF, no python dict materialization.

    ``ignoreNullFields=false``: the reference's ``json.dumps`` (and the
    DuckDB oracle's struct_pack→to_json) serialize a NULL field as
    ``"field":null``, but Spark's default silently DROPS the key —
    an audit log that omits the very fields that were null
    (degenerate-corpus sweep catch).
    """
    return df.withColumn(
        out_col,
        F.to_json(F.struct(*columns), {"ignoreNullFields": "false"}),
    )
