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


# ---------------------------------------------------------------------------
# Full-schema canary (round-4 VERDICT #4): every fixture column's arrow
# type is pinned in tests/fixture_schema_snapshot.json.  Instant columns
# may move between KNOWN-NORMALIZED encodings (catalog.load handles all
# of them); ANY other change — new encoding, new/dropped column, dtype
# swap — fails loudly here instead of crashing entry() at driver time.
# To refresh after an intentional drift: rerun the snippet in the
# snapshot file's git log AND verify catalog.load still normalizes.
# ---------------------------------------------------------------------------

_SNAPSHOT_PATH = os.path.join(os.path.dirname(__file__), "fixture_schema_snapshot.json")

# every instant encoding the load() projection provably normalizes
_INSTANT_OK = {
    "int64",  # nanos-as-bigint (driver rounds 1-2, _NANOS_TS_COLUMNS)
    "timestamp[us]",  # no-zone ⇒ Spark TIMESTAMP_NTZ (round 3+)
    "timestamp[us, tz=UTC]",
    "timestamp[ns]",
    "timestamp[ns, tz=UTC]",
    "timestamp[ms]",
    "timestamp[ms, tz=UTC]",
}
_INSTANT_COLS = {("events", "ts"), ("orders", "o_orderdate"), ("lineitem", "l_shipdate")}


def _schema_problems(table: str, path: str, expected: dict[str, str]) -> list[str]:
    """Compare one parquet file's arrow schema to its snapshot; returns
    human-readable problems (empty = no drift)."""
    import pyarrow.parquet as pq

    actual = {f.name: str(f.type) for f in pq.read_schema(path)}
    problems = []
    for col in expected.keys() - actual.keys():
        problems.append(f"{table}.{col}: column dropped from fixture")
    for col in actual.keys() - expected.keys():
        problems.append(f"{table}.{col}: NEW column {actual[col]!r} not in snapshot")
    for col in expected.keys() & actual.keys():
        if (table, col) in _INSTANT_COLS:
            if actual[col] not in _INSTANT_OK:
                problems.append(
                    f"{table}.{col}: instant encoding drifted to {actual[col]!r} "
                    "— NOT in catalog.load's normalized set; extend the load projection"
                )
        elif actual[col] != expected[col]:
            problems.append(
                f"{table}.{col}: dtype drifted {expected[col]!r} -> {actual[col]!r}"
            )
    return problems


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_full_schema_snapshot(sf_dir):
    import json

    with open(_SNAPSHOT_PATH) as fh:
        snapshot = json.load(fh)
    problems = []
    for table, expected in snapshot.items():
        path = os.path.join(sf_dir, f"{table}.parquet")
        if os.path.exists(path):
            problems += [f"[{sf_dir}] {p}" for p in _schema_problems(table, path, expected)]
    assert not problems, "fixture schema drift:\n" + "\n".join(problems)


def test_perturbed_fixture_trips_canary(tmp_path):
    """The canary must actually fire: a deliberately perturbed copy of a
    fixture (dtype swap, dropped column, new column, bad instant
    encoding) produces non-empty problems."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    with open(_SNAPSHOT_PATH) as fh:
        snapshot = json.load(fh)

    # dtype swap: customer.c_acctbal double -> string
    t = pa.table(
        {
            "c_custkey": pa.array([1], pa.int64()),
            "c_name": pa.array(["a"]),
            "c_nationkey": pa.array([1], pa.int32()),
            "c_acctbal": pa.array(["oops"]),
            "c_mktsegment": pa.array(["x"]),
        }
    )
    p = str(tmp_path / "customer.parquet")
    pq.write_table(t, p)
    probs = _schema_problems("customer", p, snapshot["customer"])
    assert any("c_acctbal" in s and "drifted" in s for s in probs)

    # dropped + new column
    t2 = pa.table({"r_regionkey": pa.array([1], pa.int32()), "extra": pa.array([1])})
    p2 = str(tmp_path / "region.parquet")
    pq.write_table(t2, p2)
    probs2 = _schema_problems("region", p2, snapshot["region"])
    assert any("dropped" in s for s in probs2) and any("NEW column" in s for s in probs2)

    # instant encoding outside the normalized set: ts as plain string
    t3 = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array(["2024-01-01"]),
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["x"]),
            "value": pa.array([1.0]),
            "props": pa.array(["{}"]),
        }
    )
    p3 = str(tmp_path / "events.parquet")
    pq.write_table(t3, p3)
    probs3 = _schema_problems("events", p3, snapshot["events"])
    assert any("instant encoding drifted" in s for s in probs3)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_documents_text_is_ascii(sf_dir):
    """The multimodal oracles' byte math assumes documents.text is pure
    ASCII (payload geometry is derived from character counts) — if the
    driver ever ships non-ASCII text, fail here with a pointer instead
    of desyncing oracle from kernel silently."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(path):
        pytest.skip("no documents fixture")
    col = pq.read_table(path, columns=["text"]).column("text")
    for chunk in col.chunks:
        for v in chunk.to_pylist():
            assert v is None or v.isascii(), (
                f"{sf_dir}/documents.text contains non-ASCII — update the "
                "multimodal oracle byte math (queries/extensions.py _MM_*_SQL)"
            )


def test_utc_guard_refuses_ntz_under_non_utc_session(spark, tmp_path):
    """catalog.load's NTZ cast is value-preserving only under UTC; a
    non-UTC session must get a loud error, not shifted instants."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = tmp_path / "sfx"
    sf.mkdir()
    t = pa.table({"ts": pa.array([1_700_000_000_000_000], pa.timestamp("us"))})
    pq.write_table(t, str(sf / "events.parquet"))

    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        with pytest.raises(ValueError, match="value-preserving only"):
            load(spark, str(sf), "events")
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
    # and under UTC the same file loads fine
    assert load(spark, str(sf), "events").dtypes == [("ts", "timestamp")]


def test_epoch_math_runs_on_loaded_ts(spark):
    """The exact op that crashed round 3 (unix_millis on the loaded ts)
    must analyze and execute on every SF dir present."""
    from data_pipeline_bigquery_spark.functions.timestamps import to_epoch_millis

    for sf_dir in SF_DIRS:
        ev = load(spark, sf_dir, "events")
        row = ev.select(to_epoch_millis("ts").alias("ms")).first()
        assert row is not None and row["ms"] > 0
