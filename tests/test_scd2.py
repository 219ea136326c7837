"""SCD2 collapse operator (operators/scd2.py)."""

import datetime as dt

import pytest

from data_pipeline_bigquery_spark.operators.scd2 import scd2_collapse


@pytest.fixture(scope="module")
def spark():
    from data_pipeline_bigquery_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


def _d(day):
    return dt.date(2024, 1, day)


def test_collapse_and_intervals(spark):
    rows = [
        (1, _d(1), "O", 100),
        (1, _d(2), "O", 101),  # unchanged -> collapsed away
        (1, _d(3), "F", 102),  # change -> new interval
        (2, _d(1), "F", 200),
    ]
    df = spark.createDataFrame(rows, "k long, ts date, status string, seq long")
    got = {
        (r.k, r.valid_from): (r.status, r.valid_to, r.is_current)
        for r in scd2_collapse(df, "k", "ts", ["status"], "seq").collect()
    }
    assert got == {
        (1, _d(1)): ("O", _d(3), False),
        (1, _d(3)): ("F", None, True),
        (2, _d(1)): ("F", None, True),
    }


def test_null_attr_is_a_change(spark):
    rows = [(1, _d(1), None, 0), (1, _d(2), "A", 1), (1, _d(3), None, 2)]
    df = spark.createDataFrame(rows, "k long, ts date, status string, seq long")
    out = scd2_collapse(df, "k", "ts", ["status"], "seq").collect()
    assert len(out) == 3  # NULL -> A -> NULL are three states


def test_tiebreak_orders_same_day(spark):
    # same ts: seq decides which state wins the day and which closes it
    rows = [(1, _d(1), "A", 2), (1, _d(1), "B", 1)]
    df = spark.createDataFrame(rows, "k long, ts date, status string, seq long")
    out = sorted(
        scd2_collapse(df, "k", "ts", ["status"], "seq").collect(),
        key=lambda r: (r.status,),
    )
    assert [(r.status, r.is_current) for r in out] == [("A", True), ("B", False)]
