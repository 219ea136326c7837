"""Streaming data-contract monitor (streaming/expectations_stream.py):
the ledger counts match the rule semantics (NULL = violation),
blocking rules route rows while warn rules only count, replayed
epochs are idempotent, and the cumulative rollup sums epochs."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier (r13 VERDICT #1): streaming convergence/replay/restart
# integration proof — multi-trigger micro-batch runs costing 10-90 s
# each.  These re-prove invariants that only change when the streaming
# machinery changes; run with --full (or SPARK_GRAFT_FULL_TESTS=1)
# before committing changes to streaming/ paths.
pytestmark = _pytest_tier.mark.slow

from pyspark.sql import Row

from data_pipeline_bigquery_spark.streaming.expectations_stream import (
    Expectation,
    expectations_stream,
    ledger_rollup,
    process_expectations_batch,
)

RULES = (
    Expectation("price_positive", "price > 0", blocking=True),
    Expectation("qty_not_null", "qty IS NOT NULL", blocking=True),
    Expectation("price_soft_cap", "price <= 100", blocking=False),
)

ROWS = [
    Row(id=1, price=10.0, qty=1),     # clean
    Row(id=2, price=-5.0, qty=2),     # blocks: price_positive
    Row(id=3, price=50.0, qty=None),  # blocks: qty_not_null
    Row(id=4, price=500.0, qty=4),    # warn only: soft cap
    Row(id=5, price=None, qty=5),     # blocks: NULL price = violation
]
SCHEMA = "id long, price double, qty int"


def test_batch_counts_routing_and_null_hostility(spark, tmp_path):
    batch = spark.createDataFrame(ROWS, SCHEMA)
    ledger_p = str(tmp_path / "ledger")
    good_p = str(tmp_path / "good")
    rej_p = str(tmp_path / "reject")
    process_expectations_batch(batch, 0, RULES, ledger_p, good_p, rej_p)

    ledger = {r.rule: r for r in spark.read.parquet(ledger_p).collect()}
    assert all(r.n_checked == 5 for r in ledger.values())
    assert ledger["price_positive"].n_violations == 2  # -5 and NULL
    assert ledger["qty_not_null"].n_violations == 1
    # null-hostile: the NULL price (id=5) violates the cap rule too
    assert ledger["price_soft_cap"].n_violations == 2
    assert ledger["price_soft_cap"].blocking == 0

    good_ids = {r.id for r in spark.read.parquet(good_p).collect()}
    # id=4 violates only the WARN rule → stays in the good sink
    assert good_ids == {1, 4}
    rejects = {r.id: r.failed_rules for r in spark.read.parquet(rej_p).collect()}
    assert set(rejects) == {2, 3, 5}
    assert rejects[2] == "price_positive"
    assert rejects[3] == "qty_not_null"
    assert rejects[5] == "price_positive"
    # routed frames carry no flag scaffolding
    assert all(
        not c.startswith("__ok_")
        for c in spark.read.parquet(good_p).columns
    )


def test_replayed_epoch_is_idempotent(spark, tmp_path):
    batch = spark.createDataFrame(ROWS, SCHEMA)
    ledger_p = str(tmp_path / "ledger")
    good_p = str(tmp_path / "good")
    rej_p = str(tmp_path / "reject")
    for _ in range(2):  # crash replay of epoch 0
        process_expectations_batch(batch, 0, RULES, ledger_p, good_p, rej_p)
    assert spark.read.parquet(ledger_p).count() == len(RULES)
    assert spark.read.parquet(good_p).count() == 2
    assert spark.read.parquet(rej_p).count() == 3


def test_e2e_stream_and_rollup_across_epochs(spark, tmp_path):
    src = str(tmp_path / "in")
    ledger_p = str(tmp_path / "ledger")
    spark.createDataFrame(ROWS, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = expectations_stream(
        stream, RULES, ledger_p,
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # second epoch arrives: restart picks up only the new file
    spark.createDataFrame(
        [Row(id=6, price=-1.0, qty=6)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = expectations_stream(
        stream, RULES, ledger_p,
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    roll = {r.rule: r for r in ledger_rollup(spark, ledger_p).collect()}
    assert roll["price_positive"].n_checked == 6
    assert roll["price_positive"].n_violations == 3
    assert roll["price_positive"].n_epochs == 2
    assert roll["price_soft_cap"].n_violations == 2  # id=4 cap, id=5 NULL


def test_monitor_only_mode_and_empty_batch(spark, tmp_path):
    ledger_p = str(tmp_path / "ledger")
    batch = spark.createDataFrame(ROWS, SCHEMA)
    process_expectations_batch(batch, 0, RULES, ledger_p)  # no sinks
    assert spark.read.parquet(ledger_p).count() == len(RULES)
    empty = spark.createDataFrame([], SCHEMA)
    process_expectations_batch(empty, 1, RULES, ledger_p)  # no-op
    assert {r.epoch for r in spark.read.parquet(ledger_p).collect()} == {0}


# --- write-audit-publish on the snapshot store ----------------------------


def test_wap_publishes_clean_data_and_aborts_dirty(spark, tmp_path):
    from data_pipeline_bigquery_spark.sources.snapshots import (
        SnapshotAuditError,
        list_versions,
        read_snapshot,
        write_snapshot_audited,
    )

    base = str(tmp_path / "store")
    rules = (
        Expectation("price_positive", "price > 0", blocking=True),
        Expectation("price_soft_cap", "price <= 100", blocking=False),
    )
    clean = spark.createDataFrame(
        [(1, 10.0), (2, 500.0)], "id long, price double"
    )  # 500 trips only the WARN rule → must still publish
    v = write_snapshot_audited(clean, base, rules)
    assert v == 1
    assert read_snapshot(spark, base).count() == 2

    dirty = spark.createDataFrame(
        [(3, -1.0), (4, 20.0)], "id long, price double"
    )
    import pytest

    with pytest.raises(SnapshotAuditError) as exc:
        write_snapshot_audited(dirty, base, rules)
    assert exc.value.failures[0].rule == "price_positive"
    assert exc.value.failures[0].n_violations == 1
    # the store is EXACTLY as before: no new version, no staging orphan
    assert list_versions(spark, base) == [1]
    import os

    assert not any(
        d.startswith(".tmp-") for d in os.listdir(base)
    ), "failed audit must delete its staging dir"
    assert {r.id for r in read_snapshot(spark, base).collect()} == {1, 2}

    # the store keeps working after an abort
    v = write_snapshot_audited(
        spark.createDataFrame([(5, 1.0)], "id long, price double"),
        base,
        rules,
    )
    assert v == 2


def test_wap_partitioned_audit_sees_partition_columns(spark, tmp_path):
    from data_pipeline_bigquery_spark.sources.snapshots import (
        SnapshotAuditError,
        write_snapshot_audited,
    )

    base = str(tmp_path / "store")
    # the rule references the PARTITION column — the audit must see it
    # on the staged hive layout
    rules = (Expectation("lang_known", "lang IN ('en', 'de')"),)
    df = spark.createDataFrame(
        [(1, "en"), (2, "xx")], "id long, lang string"
    )
    import pytest

    with pytest.raises(SnapshotAuditError):
        write_snapshot_audited(df, base, rules, partition_by=["lang"])
    ok = spark.createDataFrame([(1, "en")], "id long, lang string")
    assert write_snapshot_audited(ok, base, rules, partition_by=["lang"]) == 1


def test_audited_merge_blocks_poison_source(spark, tmp_path):
    """Contract-gated MERGE: a source batch that would corrupt the
    merged state aborts before any version is committed."""
    from data_pipeline_bigquery_spark.sources.snapshots import (
        SnapshotAuditError,
        list_versions,
        merge_into_snapshot,
        read_snapshot,
        write_snapshot,
    )

    base = str(tmp_path / "store")
    rules = (Expectation("price_positive", "price > 0"),)
    write_snapshot(
        spark.createDataFrame(
            [(1, 10.0, 100), (2, 20.0, 100)], "pk long, price double, cur int"
        ),
        base,
    )
    # clean merge publishes v2
    v = merge_into_snapshot(
        spark,
        base,
        spark.createDataFrame([(3, 30.0, 101)], "pk long, price double, cur int"),
        "pk",
        "cur",
        rules=rules,
    )
    assert v == 2
    # poison source: the UPDATED row would violate the contract
    import pytest

    with pytest.raises(SnapshotAuditError):
        merge_into_snapshot(
            spark,
            base,
            spark.createDataFrame(
                [(1, -99.0, 102)], "pk long, price double, cur int"
            ),
            "pk",
            "cur",
            rules=rules,
        )
    assert list_versions(spark, base) == [1, 2]
    assert {r.price for r in read_snapshot(spark, base).collect()} == {
        10.0, 20.0, 30.0,
    }


def test_single_blocking_rule_routes(spark, tmp_path):
    """Regression: F.least() needs >=2 columns — a one-rule contract
    must still route (pre-fix this crashed every micro-batch)."""
    batch = spark.createDataFrame([(1, 5.0), (2, -1.0)], "id long, price double")
    ledger_p, good_p, rej_p = (
        str(tmp_path / d) for d in ("ledger", "good", "rej")
    )
    one_rule = (Expectation("price_positive", "price > 0"),)
    process_expectations_batch(batch, 0, one_rule, ledger_p, good_p, rej_p)
    assert {r.id for r in spark.read.parquet(good_p).collect()} == {1}
    assert {r.id for r in spark.read.parquet(rej_p).collect()} == {2}


def test_all_warn_rules_never_reject(spark, tmp_path):
    batch = spark.createDataFrame([(1, -1.0)], "id long, price double")
    ledger_p, good_p, rej_p = (
        str(tmp_path / d) for d in ("ledger", "good", "rej")
    )
    warn_only = (Expectation("soft", "price > 0", blocking=False),)
    process_expectations_batch(batch, 0, warn_only, ledger_p, good_p, rej_p)
    assert spark.read.parquet(good_p).count() == 1  # nothing blocks
    import os

    assert not os.path.exists(rej_p)  # no reject sink ever written


def test_rule_name_must_be_identifier():
    import pytest

    with pytest.raises(ValueError, match="identifier"):
        Expectation("price.positive", "price > 0")
    with pytest.raises(ValueError, match="identifier"):
        Expectation("bad`name", "price > 0")


def test_monitor_over_snapshot_change_feed(spark, tmp_path):
    """Composition: the snapshot store's version change feed drives the
    expectations monitor — every committed version is audited exactly
    once, and the ledger rollup accumulates across restarts."""
    from data_pipeline_bigquery_spark.sources.snapshot_datasource import (
        SnapshotDataSource,
    )
    from data_pipeline_bigquery_spark.sources.snapshots import write_snapshot

    spark.dataSource.register(SnapshotDataSource)
    base = str(tmp_path / "store")
    ledger_p = str(tmp_path / "ledger")
    ckpt = str(tmp_path / "ckpt")
    rules = (Expectation("price_positive", "price > 0"),)

    write_snapshot(
        spark.createDataFrame([(1, 5.0), (2, -1.0)], "k long, price double"),
        base,
    )

    def run():
        stream = (
            spark.readStream.format("snapshotstore")
            .schema("k long, price double, _version long")
            .option("path", base)
            .load()
        )
        q = expectations_stream(stream, rules, ledger_p, checkpoint=ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run()
    roll = ledger_rollup(spark, ledger_p).collect()[0]
    assert (roll.n_checked, roll.n_violations) == (2, 1)

    # a second commit arrives; the restarted monitor audits ONLY it
    write_snapshot(
        spark.createDataFrame([(3, 7.0)], "k long, price double"), base
    )
    run()
    roll = ledger_rollup(spark, ledger_p).collect()[0]
    assert (roll.n_checked, roll.n_violations) == (3, 1)


def test_ledger_rollup_before_first_epoch_is_empty_not_error(spark, tmp_path):
    """ADVICE r07: a just-started monitor with no epoch written yet is a
    normal state — the rollup returns an empty ledger-shaped frame, not
    a raw PATH_NOT_FOUND AnalysisException."""
    from data_pipeline_bigquery_spark.streaming.expectations_stream import (
        ledger_rollup,
    )

    out = ledger_rollup(spark, str(tmp_path / "never_written_ledger"))
    assert out.collect() == []
    assert out.columns == ["rule", "n_checked", "n_violations", "blocking", "n_epochs"]
