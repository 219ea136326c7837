"""Query registry — the driver-facing catalog.

Every implemented operator from SURVEY §2 (plus the scale-out
extensions) registers a :class:`QuerySpec` here: a Spark callable
``(spark, sf_dir) -> DataFrame`` and, where SQL-expressible, the
equivalent ANSI SQL the DuckDB oracle runs on the same parquet tables.

Column names are aliased identically on both sides — the driver's
compare sorts columns by name before hashing values.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → driver runs rows-only check


def registry() -> dict[str, QuerySpec]:
    from data_pipeline_bigquery_spark.queries import (
        analytics5,
        core,
        coverage,
        coverage2,
        coverage3,
        coverage4,
        corpus_ops,
        curation,
        curation2,
        formats,
        extensions,
        pipelines,
        sketches,
        training,
    )

    merged: dict[str, QuerySpec] = {}
    for mod in (
        core, pipelines, coverage, coverage2, coverage3, coverage4,
        corpus_ops, formats, extensions, training, curation, curation2, sketches,
        analytics5,
    ):
        merged.update(mod.QUERIES)
    return merged
