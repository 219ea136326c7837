"""The pre-flight for the driver's t2 gate: every registered query with
an oracle must match DuckDB exactly at sf0.001 (fast) — same check the
driver runs at sf0.01."""

from __future__ import annotations

import pytest

from data_pipeline_bigquery_spark.queries import registry
from tests.conftest import SF_DIR
from tests.oracle_compare import compare

REG = registry()
ORACLE_QUERIES = sorted(name for name, spec in REG.items() if spec.oracle)
ROWS_ONLY_QUERIES = sorted(name for name, spec in REG.items() if not spec.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    spec = REG[name]
    df = spec.fn(spark, SF_DIR)
    problems = compare(df, spec.oracle, SF_DIR)
    assert not problems, f"{name}:\n" + "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, name):
    df = REG[name].fn(spark, SF_DIR)
    assert df.count() > 0
    assert len(df.columns) > 0
