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


# the ONE list of registry modules — registry() and the collision
# guard in tests/test_oracle_parity.py both iterate this, so adding a
# module here automatically puts it under the shadowing check
MODULE_NAMES = (
    "core", "pipelines", "coverage", "coverage2", "coverage3",
    "coverage4", "corpus_ops", "formats", "extensions", "training",
    "curation", "curation2", "sketches", "analytics5", "analytics6",
    "analytics7", "training3", "analytics8", "analytics9", "evalops",
    "analytics10", "analytics11", "analytics12", "analytics13",
    "analytics14", "analytics15", "analytics16", "analytics17",
    "analytics18", "analytics19", "analytics20", "analytics21", "analytics22",
    "analytics23", "analytics24",
)


def registry_modules():
    import importlib

    return [
        importlib.import_module(f"data_pipeline_bigquery_spark.queries.{n}")
        for n in MODULE_NAMES
    ]


def registry() -> dict[str, QuerySpec]:
    merged: dict[str, QuerySpec] = {}
    for mod in registry_modules():
        merged.update(mod.QUERIES)
    return merged
