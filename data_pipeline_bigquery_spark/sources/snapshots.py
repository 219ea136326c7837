"""Versioned snapshot store — plain-parquet time travel.

The reference's warehouse keeps exactly one mutable table per entity
(MERGE in place, `bigquery.py:206-271`): yesterday's state is gone the
moment today's load lands.  This module keeps EVERY load as an
immutable snapshot version under one prefix —

    base/v=1/...parquet   base/v=2/...parquet   ...

with a per-version ``_COMMITTED`` marker as the commit protocol: data
files land first, the marker last, so readers (which only ever look at
marked versions) can never observe a half-written snapshot — a crash
mid-write leaves an invisible orphan directory, not corruption.  That
is the same reader-visibility idea a real table format (Iceberg/Delta)
gets from its metadata log, reduced to what plain parquet + a
filesystem rename can guarantee.

On top of the versions:
- ``read_snapshot(..., version=None)`` → any historical state, or the
  latest committed one (time travel);
- ``snapshot_cdc(old, new)`` → the ROW-LEVEL insert/delete/update feed
  between any two versions (one co-partitioned full-outer join on the
  pk — the change feed `snapshot_diff_cdc` derives for one fixed pair,
  generalized to arbitrary version pairs and returned at row grain).

Scale: a snapshot is an ordinary parquet dir (partition/bucket options
pass through); version listing is O(versions); the CDC join shuffles
on the pk with AQE sizing.  Retention is the `compact_lake` staged
pattern: drop old version dirs, markers last.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.sources.lake import fs_and_path as _fs_and_path

_MARKER = "_COMMITTED"


def list_versions(spark: SparkSession, base: str) -> list[int]:
    """Committed versions, ascending.  Uncommitted (crashed) version
    dirs are invisible by construction."""
    fs, jpath = _fs_and_path(spark, base)
    if not fs.exists(jpath):
        return []
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        m = re.fullmatch(r"v=(\d+)", name)
        if not m:
            continue
        marker = spark._jvm.org.apache.hadoop.fs.Path(
            st.getPath(), _MARKER
        )
        if fs.exists(marker):
            out.append(int(m.group(1)))
    return sorted(out)


def write_snapshot(df: DataFrame, base: str) -> int:
    """Write the next snapshot version; returns its number.  Data
    first, marker last — the commit point is the marker creation.

    An UNCOMMITTED orphan dir at the target version (a writer that
    crashed between data and marker) is deleted and overwritten: it is
    invisible to every reader by definition, and refusing it would
    wedge the store permanently on the first crash."""
    spark = df.sparkSession
    versions = list_versions(spark, base)
    v = (versions[-1] if versions else 0) + 1
    vdir = f"{base}/v={v}"
    fs0, jdir = _fs_and_path(spark, vdir)
    if fs0.exists(jdir):
        fs0.delete(jdir, True)  # crashed, marker-less — reclaim
    df.write.mode("errorifexists").parquet(vdir)
    fs, _ = _fs_and_path(spark, base)
    fs.create(
        spark._jvm.org.apache.hadoop.fs.Path(f"{vdir}/{_MARKER}")
    ).close()
    return v


def read_snapshot(
    spark: SparkSession, base: str, version: int | None = None
) -> DataFrame:
    """Time travel: the given committed version, or the latest."""
    versions = list_versions(spark, base)
    if not versions:
        raise FileNotFoundError(f"no committed snapshots under {base}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise FileNotFoundError(f"version {version} not committed in {base}")
    return spark.read.parquet(f"{base}/v={version}")


def expire_snapshots(
    spark: SparkSession, base: str, keep_last: int
) -> list[int]:
    """Retention: drop all but the newest ``keep_last`` committed
    versions.  Per version the MARKER goes first, then the data dir —
    so a crash mid-expiry leaves an invisible orphan (reclaimable),
    never a readable-but-half-deleted version.  Returns the expired
    version numbers."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = list_versions(spark, base)
    doomed = versions[:-keep_last] if len(versions) > keep_last else []
    jvm = spark._jvm
    for v in doomed:
        fs, vdir = _fs_and_path(spark, f"{base}/v={v}")
        fs.delete(jvm.org.apache.hadoop.fs.Path(vdir, _MARKER), False)
        fs.delete(vdir, True)
    return doomed


def snapshot_cdc(
    old: DataFrame,
    new: DataFrame,
    pk_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level change feed between two snapshots: one full-outer join
    on the pk; rows classified insert / delete / update (unchanged rows
    are dropped — the feed carries only changes).  Output: pk columns,
    ``change_type``, and old_/new_ pairs of the compared columns.
    Null-safe comparison: NULL→value and value→NULL count as updates."""
    o = old.select(pk_cols + compare_cols).alias("o")
    n = new.select(pk_cols + compare_cols).alias("n")
    cond = None
    for k in pk_cols:
        c = F.col(f"o.{k}") == F.col(f"n.{k}")
        cond = c if cond is None else (cond & c)
    joined = o.join(n, cond, "full_outer")
    o_pk, n_pk = F.col(f"o.{pk_cols[0]}"), F.col(f"n.{pk_cols[0]}")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    change = (
        F.when(o_pk.isNull(), "insert")
        .when(n_pk.isNull(), "delete")
        .when(changed, "update")
    )
    out_cols = [
        F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in pk_cols
    ]
    out_cols.append(change.alias("change_type"))
    for c in compare_cols:
        out_cols.append(F.col(f"o.{c}").alias(f"old_{c}"))
        out_cols.append(F.col(f"n.{c}").alias(f"new_{c}"))
    return joined.select(*out_cols).filter(F.col("change_type").isNotNull())


def commit_epoch_snapshot(batch_df: DataFrame, base: str, epoch_id: int) -> int | None:
    """foreachBatch body: commit this micro-batch as the next snapshot
    version, IDEMPOTENTLY — an at-least-once replay of an epoch whose
    version is already committed is a no-op (the same guard pattern as
    `streaming/freq_stream.py`).  The epoch travels as a marker
    FILENAME (``_EPOCH_<id>``) so the guard is pure existence checks —
    two traps measured and rejected here: reading file contents
    through py4j copies the buffer and the mutation never comes back,
    and a ``name=value`` marker filename makes Spark's file index
    treat it as partition metadata and the parquet reader chokes on
    the empty file.  Returns the version written, or None when the
    epoch was already committed."""
    spark = batch_df.sparkSession
    jvm = spark._jvm
    fs, jbase = _fs_and_path(spark, base)
    if fs.exists(jbase):
        for st in fs.listStatus(jbase):
            if not st.getPath().getName().startswith("v="):
                continue
            epoch_marker = jvm.org.apache.hadoop.fs.Path(
                st.getPath(), f"_EPOCH_{epoch_id}"
            )
            committed = jvm.org.apache.hadoop.fs.Path(st.getPath(), _MARKER)
            if fs.exists(epoch_marker) and fs.exists(committed):
                return None  # replayed epoch — already committed
    versions = list_versions(spark, base)
    v = (versions[-1] if versions else 0) + 1
    vdir = f"{base}/v={v}"
    fs0, jdir = _fs_and_path(spark, vdir)
    if fs0.exists(jdir):
        fs0.delete(jdir, True)
    batch_df.write.mode("errorifexists").parquet(vdir)
    fs.create(
        jvm.org.apache.hadoop.fs.Path(f"{vdir}/_EPOCH_{epoch_id}")
    ).close()
    fs.create(jvm.org.apache.hadoop.fs.Path(f"{vdir}/{_MARKER}")).close()
    return v


def streaming_snapshot_sink(stream_df: DataFrame, base: str, checkpoint: str):
    """Every micro-batch becomes one committed snapshot version —
    a streaming source materialized as a TIME-TRAVELABLE history
    instead of a single mutable table; `snapshot_cdc` then serves the
    change feed between any two epochs.  Exactly-once at the version
    level: the engine's checkpoint dedupes epochs and the marker's
    epoch id makes replays no-ops."""
    return (
        stream_df.writeStream.foreachBatch(
            lambda batch, epoch: commit_epoch_snapshot(batch, base, epoch)
        )
        .option("checkpointLocation", checkpoint)
        .start()
    )
