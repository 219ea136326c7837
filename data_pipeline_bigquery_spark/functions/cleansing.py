"""Cleansing / decode expressions.

Reference: bool decode ``{"0": False, "1": True}``
(``/root/reference/pipeline/email_read_log/email_read_log.py:34-35``),
``'null'`` sentinel normalization
(``pipeline/mautic_hubspot_email_log/mautic_hubspot_email_read_activities.py:54``),
bulk ``contact_`` column prefixing
(``pipeline/email_read_log/email_read_log.py:36-38``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bool_decode(col: Column | str, true_value: str = "1") -> Column:
    """C12 bool_decode: ``"1"`` → true, ``"0"`` → false, NULL stays NULL."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull(), F.lit(None).cast("boolean")).otherwise(c == true_value)


def null_literal_normalize(col: Column | str, sentinel: str = "null") -> Column:
    """F6 null_literal_normalize: map sentinel string → real NULL."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == sentinel, F.lit(None)).otherwise(c)


def prefix_rename(df: DataFrame, prefix: str, columns: list[str]) -> DataFrame:
    """C15/P3 bulk prefix rename — one projection, not N withColumnRenamed
    calls (each withColumnRenamed adds an analysis pass)."""
    renamed = [
        F.col(c).alias(f"{prefix}{c}") if c in set(columns) else F.col(c) for c in df.columns
    ]
    return df.select(*renamed)
