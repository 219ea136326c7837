"""delete_by_keys_rewrite: targeted GDPR-style deletes rewrite ONLY the
files containing matching rows; untouched files stay byte-identical."""

from __future__ import annotations

import glob
import hashlib

from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.sources.lake import delete_by_keys_rewrite


def _digests(path):
    return {
        p.split("/")[-1]: hashlib.md5(open(p, "rb").read()).hexdigest()
        for p in glob.glob(f"{path}/*.parquet")
    }


def test_delete_rewrites_only_affected_files(spark, tmp_path):
    base = str(tmp_path / "lake")
    # 4 files, keys clustered so only file of ids 0-24 is affected
    spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v")) \
        .repartitionByRange(4, "k").write.parquet(base)
    before = _digests(base)
    assert len(before) == 4

    victims = spark.createDataFrame([(3,), (7,)], "k long")
    out = delete_by_keys_rewrite(spark, base, "k", victims)
    assert out == {"files_rewritten": 1, "rows_deleted": 2}

    after = _digests(base)
    assert len(after) == 4
    changed = {n for n in before if before[n] != after.get(n, "gone")}
    unchanged = {n for n in before if before[n] == after.get(n)}
    assert len(unchanged) == 3  # three files byte-identical
    # exactly one file rewritten IN PLACE (same name, new bytes)
    assert len(changed) == 1 and changed <= set(before)
    df = spark.read.parquet(base)
    assert df.count() == 98
    assert df.filter(F.col("k").isin(3, 7)).count() == 0
    # non-victim rows in the rewritten file survived
    assert df.filter(F.col("k").isin(0, 1, 2, 4)).count() == 4


def test_delete_no_match_is_noop(spark, tmp_path):
    base = str(tmp_path / "lake2")
    spark.range(10).select(F.col("id").alias("k")).write.parquet(base)
    before = _digests(base)
    out = delete_by_keys_rewrite(
        spark, base, "k", spark.createDataFrame([(999,)], "k long")
    )
    assert out == {"files_rewritten": 0, "rows_deleted": 0}
    assert _digests(base) == before


def test_delete_on_hive_partitioned_lake_by_partition_key(spark, tmp_path):
    """GDPR deletes usually target the per-subject PARTITION column;
    the per-file rewrite must reconstruct partition columns (basePath)
    and not write them into the leaf files."""
    from pyspark.sql import functions as F

    base = str(tmp_path / "plake")
    spark.range(40).select(
        (F.col("id") % 4).alias("user_id"), F.col("id").alias("v")
    ).write.partitionBy("user_id").parquet(base)
    victims = spark.createDataFrame([(2,)], "user_id long")
    out = delete_by_keys_rewrite(spark, base, "user_id", victims)
    assert out["rows_deleted"] == 10
    df = spark.read.parquet(base)
    assert df.count() == 30
    assert df.filter(F.col("user_id") == 2).count() == 0
    # other partitions intact
    assert df.filter(F.col("user_id") == 1).count() == 10


def test_swap_staging_files_are_hidden_and_swept(spark, tmp_path):
    """Crash-recovery contract (r5 ADVICE): staging names are
    dot-prefixed so a concurrent/post-crash reader never sees both
    copies, and a rerun reconciles leftovers instead of double-reading.

    Simulates the two crash states directly:
      * stale ``.old`` + live present (crash after swap, before
        cleanup) -> reader sees exactly the live rows; sweep drops it;
      * ``.old`` present + live missing (crash between the two
        renames) -> reader still works (backup hidden) and the next
        delete run RESTORES the file first, so its rows survive.
    """
    import os

    base = str(tmp_path / "crashlake")
    spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v")) \
        .repartitionByRange(4, "k").write.parquet(base)
    files = sorted(glob.glob(f"{base}/part-*.parquet"))
    assert len(files) == 4

    # state 1: stale backup next to an intact live file
    f0 = files[0]
    stale_old = os.path.join(base, "." + os.path.basename(f0) + ".old")
    with open(f0, "rb") as src, open(stale_old, "wb") as dst:
        dst.write(src.read())
    # a dot-prefixed duplicate is invisible: no duplicated rows
    assert spark.read.parquet(base).count() == 100

    # state 2: live file missing, only the (hidden) backup remains
    f1 = files[1]
    hidden_old = os.path.join(base, "." + os.path.basename(f1) + ".old")
    os.rename(f1, hidden_old)
    n_f1 = 100 - spark.read.parquet(base).count()  # rows temporarily dark
    assert n_f1 > 0

    out = delete_by_keys_rewrite(
        spark, base, "k", spark.createDataFrame([(3,)], "k long")
    )
    assert out["rows_deleted"] == 1
    # sweep restored the dark file and dropped the stale backup
    assert not glob.glob(f"{base}/.*.old") and not glob.glob(f"{base}/.*.new")
    df = spark.read.parquet(base)
    assert df.count() == 99
    assert df.filter(F.col("k") == 3).count() == 0
