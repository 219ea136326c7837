"""CLI dispatcher: every reference workflow name runs end-to-end."""

from __future__ import annotations

import pytest

from data_pipeline_bigquery_spark.__main__ import WORKFLOWS, parse_args, run_workflow

SF = "/root/testdata/sf0.001"


def test_all_workflow_names_present():
    # the reference main.py declares exactly these eight; corpus_build
    # is the engine's extension workflow (full curation pipeline)
    assert set(WORKFLOWS) == {
        "hubspot_companies_bigquery",
        "hubspot_contacts_bigquery",
        "hubspot_deals_bigquery",
        "hubspot_deal_logs_bigquery",
        "hubspot_engagement_to_bigquery",
        "mautic_email_log_to_bigquery",
        "mautic_hubspot_email_read_activities",
        "hubspot_association_to_bigquery",
        "corpus_build",
    }


@pytest.mark.parametrize("name", sorted(WORKFLOWS))
def test_workflow_runs(name, spark, tmp_path):
    out = str(tmp_path / "out")
    n, df = run_workflow(
        name,
        sf_dir=SF,
        out=out,
        engagement="emails" if name == "hubspot_engagement_to_bigquery" else None,
    )
    assert n > 0
    assert spark.read.parquet(out).count() == n


def test_engagement_requires_type():
    with pytest.raises(SystemExit):
        parse_args(["hubspot_engagement_to_bigquery"])
    args = parse_args(["hubspot_engagement_to_bigquery", "--engagement", "calls"])
    assert args.engagement == "calls"


def test_cli_lake_maintenance_delete_and_compact(spark, tmp_path):
    from pyspark.sql import functions as F

    from data_pipeline_bigquery_spark.__main__ import main

    lake = str(tmp_path / "lake")
    spark.range(200).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v")) \
        .repartition(8).write.parquet(lake)
    keys = str(tmp_path / "keys")
    spark.createDataFrame([(5,), (6,)], "k long").write.parquet(keys)
    rc = main([
        "lake_maintenance", "--path", lake, "--target-mb", "64",
        "--delete-keys", keys, "--key-col", "k",
    ])
    assert rc == 0
    out = spark.read.parquet(lake)
    assert out.count() == 198
    assert out.filter(F.col("k").isin(5, 6)).count() == 0


def test_cli_snapshot_maintenance_verbs(spark, tmp_path):
    from data_pipeline_bigquery_spark.__main__ import main
    from data_pipeline_bigquery_spark.sources.snapshots import (
        list_versions,
        read_snapshot,
        write_snapshot,
    )

    base = str(tmp_path / "store")
    write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string"),
        base,
    )
    keys = str(tmp_path / "keys")
    spark.createDataFrame([(2,)], "k long").write.parquet(keys)

    # delete commits v2; rollback to v1 commits v3; compact commits v4
    assert main([
        "snapshot_maintenance", "--base", base,
        "--delete-keys", keys, "--key-col", "k",
    ]) == 0
    assert {r.k for r in read_snapshot(spark, base).collect()} == {1, 3}
    assert main([
        "snapshot_maintenance", "--base", base, "--rollback-to", "1",
    ]) == 0
    assert {r.k for r in read_snapshot(spark, base).collect()} == {1, 2, 3}
    assert main([
        "snapshot_maintenance", "--base", base,
        "--compact-files", "1", "--keep-last", "2", "--vacuum",
    ]) == 0
    assert list_versions(spark, base) == [3, 4]


def test_cli_data_quality_batch_and_ledger(spark, tmp_path, capsys):
    from data_pipeline_bigquery_spark.__main__ import main
    from data_pipeline_bigquery_spark.streaming.expectations_stream import (
        Expectation,
        process_expectations_batch,
    )

    # batch report over the fixtures: soft cap fires (warn rule), all
    # blocking rules pass → exit 0 even in CI-gate mode
    out = str(tmp_path / "report")
    assert main([
        "data_quality", "--sf-dir", "/root/testdata/sf0.001",
        "--out", out, "--fail-on-violations",
    ]) == 0
    rep = {r.rule: r for r in spark.read.parquet(out).collect()}
    assert rep["totalprice_below_soft_cap"].n_violations > 0
    assert rep["orderkey_unique"].passed == 1

    # ledger rollup mode: a blocking violation in the ledger trips the
    # CI gate
    ledger = str(tmp_path / "ledger")
    batch = spark.createDataFrame([(1, -5.0)], "id long, price double")
    process_expectations_batch(
        batch, 0, (Expectation("price_positive", "price > 0"),), ledger
    )
    assert main(["data_quality", "--ledger", ledger]) == 0
    assert main([
        "data_quality", "--ledger", ledger, "--fail-on-violations",
    ]) == 1


def test_cli_data_quality_rules_file_over_path(spark, tmp_path):
    import json

    from data_pipeline_bigquery_spark.__main__ import main

    data = str(tmp_path / "data")
    spark.createDataFrame(
        [(1, 5.0), (2, -1.0)], "id long, price double"
    ).write.parquet(data)
    rules = tmp_path / "rules.json"
    rules.write_text(json.dumps([
        {"name": "price_positive", "expr": "price > 0"},
        {"name": "id_small", "expr": "id < 100", "blocking": False},
    ]))
    # a blocking violation exists → gate mode exits 1, plain mode 0
    assert main([
        "data_quality", "--path", data, "--rules", str(rules),
    ]) == 0
    assert main([
        "data_quality", "--path", data, "--rules", str(rules),
        "--fail-on-violations",
    ]) == 1


def test_cli_plan_audit_reports_and_gates(spark, capsys):
    from data_pipeline_bigquery_spark.__main__ import main

    assert main([
        "plan_audit",
        "--keys", "join_agg_revenue_by_nation,mann_kendall_trend",
        "--sf-dir", "/root/testdata/sf0.001",
        "--fail-on-cartesian",
    ]) == 0
    out = capsys.readouterr().out
    assert "join_agg_revenue_by_nation" in out
    assert "BroadcastHashJoin" in out
    assert "lineage-cut" in out  # the checkpointed key reports its cut
    import pytest

    with pytest.raises(SystemExit):
        main(["plan_audit", "--keys", "no_such_key"])
    # neither --keys nor --all is a usage error, not a silent no-op
    with pytest.raises(SystemExit):
        main(["plan_audit", "--sf-dir", "/root/testdata/sf0.001"])
