"""Fixture-drift canary — the failure class behind the round-3 red
release: the driver regenerates parquet fixtures between rounds and has
already changed timestamp encoding twice (nanos-as-bigint → TIMESTAMP →
TIMESTAMP_NTZ).  These tests pin the LOAD-BOUNDARY CONTRACT, not the
file encoding: whatever the files contain, ``catalog.load`` must hand
every downstream operator plain ``TIMESTAMP`` columns and epoch math
must keep working.  If the fixtures drift to a new encoding, this file
fails loudly at unit-test time instead of crashing ``entry()`` at
driver time.
"""

from __future__ import annotations

import glob
import os

import pytest

from data_pipeline_bigquery_spark.catalog import FIXTURE_TABLES, load

SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))

# columns that carry instants and feed epoch math somewhere in the engine
INSTANT_COLUMNS = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_no_ntz_or_bigint_timestamps_after_load(spark, sf_dir):
    for table in FIXTURE_TABLES:
        if not os.path.exists(os.path.join(sf_dir, f"{table}.parquet")):
            continue
        dtypes = dict(load(spark, sf_dir, table).dtypes)
        for col, dt in dtypes.items():
            assert dt != "timestamp_ntz", (
                f"{sf_dir}/{table}.{col} left load() as TIMESTAMP_NTZ — "
                "extend catalog.load's normalization projection"
            )
        for col in INSTANT_COLUMNS.get(table, []):
            assert dtypes.get(col) == "timestamp", (
                f"{sf_dir}/{table}.{col} is {dtypes.get(col)!r}, expected "
                "'timestamp' — fixture encoding drifted; see catalog.load"
            )


def test_epoch_math_runs_on_loaded_ts(spark):
    """The exact op that crashed round 3 (unix_millis on the loaded ts)
    must analyze and execute on every SF dir present."""
    from data_pipeline_bigquery_spark.functions.timestamps import to_epoch_millis

    for sf_dir in SF_DIRS:
        ev = load(spark, sf_dir, "events")
        row = ev.select(to_epoch_millis("ts").alias("ms")).first()
        assert row is not None and row["ms"] > 0
