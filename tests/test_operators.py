"""Unit tests for operator semantics — especially the MERGE edge cases
from SURVEY §7.4 (null-hostile cursor comparison, archived-branch reuse,
dup-pk guard)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.functions.cleansing import bool_decode, null_literal_normalize
from data_pipeline_bigquery_spark.functions.keys import csv_append_dedup, csv_contains
from data_pipeline_bigquery_spark.operators.dedup import dedup_keep_latest, dup_pk_check, null_pk_check
from data_pipeline_bigquery_spark.operators.merge import merge_upsert

TS = dt.datetime


def _entities(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, cursor=c, payload=p) for i, c, p in rows],
        "id long, cursor timestamp, payload string",
    )


class TestMergeUpsert:
    def test_matched_cursor_differs_updates(self, spark):
        target = _entities(spark, [(1, TS(2024, 1, 1), "old")])
        source = _entities(spark, [(1, TS(2024, 2, 1), "new")])
        out = merge_upsert(target, source, "id", "cursor").collect()
        assert out == [Row(id=1, cursor=TS(2024, 2, 1), payload="new")]

    def test_matched_cursor_equal_is_noop(self, spark):
        """Re-delivered unchanged rows must not overwrite (ST3)."""
        target = _entities(spark, [(1, TS(2024, 1, 1), "old")])
        source = _entities(spark, [(1, TS(2024, 1, 1), "redelivered")])
        out = merge_upsert(target, source, "id", "cursor").collect()
        assert out[0].payload == "old"

    def test_unmatched_inserts_and_target_only_kept(self, spark):
        target = _entities(spark, [(1, TS(2024, 1, 1), "t1")])
        source = _entities(spark, [(2, TS(2024, 1, 2), "s2")])
        out = {r.id: r.payload for r in merge_upsert(target, source, "id", "cursor").collect()}
        assert out == {1: "t1", 2: "s2"}

    def test_null_cursor_never_updates_by_default(self, spark):
        """bigquery.py:249 `!=` is null-hostile: NULL cursor ⇒ no update."""
        target = _entities(spark, [(1, None, "old")])
        source = _entities(spark, [(1, TS(2024, 1, 1), "new")])
        out = merge_upsert(target, source, "id", "cursor").collect()
        assert out[0].payload == "old"

    def test_null_safe_mode_updates_on_null_difference(self, spark):
        target = _entities(spark, [(1, None, "old")])
        source = _entities(spark, [(1, TS(2024, 1, 1), "new")])
        out = merge_upsert(target, source, "id", "cursor", null_safe=True).collect()
        assert out[0].payload == "new"

    def test_validate_rejects_duplicate_pk(self, spark):
        target = _entities(spark, [(1, TS(2024, 1, 1), "t")])
        source = _entities(spark, [(2, TS(2024, 1, 1), "a"), (2, TS(2024, 1, 2), "b")])
        with pytest.raises(ValueError, match="duplicate primary key"):
            merge_upsert(target, source, "id", "cursor", validate=True)


class TestDedup:
    def test_latest_wins(self, spark):
        df = _entities(
            spark,
            [(1, TS(2024, 1, 1), "old"), (1, TS(2024, 3, 1), "new"), (2, TS(2024, 1, 5), "x")],
        )
        out = {r.id: r.payload for r in dedup_keep_latest(df, ["id"], ["cursor"]).collect()}
        assert out == {1: "new", 2: "x"}

    def test_guards(self, spark):
        df = _entities(spark, [(1, TS(2024, 1, 1), "a"), (1, TS(2024, 1, 2), "b"), (None, None, "c")])
        assert null_pk_check(df, "id") == 1
        assert dup_pk_check(df, "id").collect()[0]["cnt"] == 2


class TestScalarFunctions:
    def test_bool_decode_null_passthrough(self, spark):
        df = spark.createDataFrame([("1",), ("0",), (None,)], "f: string")
        out = [r[0] for r in df.select(bool_decode("f")).collect()]
        assert out == [True, False, None]

    def test_null_literal_normalize(self, spark):
        df = spark.createDataFrame([("null",), ("x",)], "f: string")
        out = [r[0] for r in df.select(null_literal_normalize("f")).collect()]
        assert out == [None, "x"]

    def test_csv_ops_preserve_first_seen_order(self, spark):
        df = spark.createDataFrame([("b,a,b", "a"), ("b,a", "c")], "csv string, new string")
        out = df.select(
            csv_contains("csv", "new").alias("has"),
            csv_append_dedup("csv", "new").alias("appended"),
        ).collect()
        assert out[0].has is True and out[0].appended == "a,b"
        assert out[1].has is False and out[1].appended == "c,b,a"
