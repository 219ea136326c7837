"""CLI dispatcher — the reference's ``main.py`` front door
(``/root/reference/main.py:13-54``) over the Spark registry.

Same workflow names, same subcommand UX (including the engagement
pipeline's ``--engagement`` selector); each maps to the registry
pipeline that re-expresses that workflow, runs it end-to-end on a
fixture/lake directory, and either writes parquet (``--out``) or
reports the row count.  ``python -m data_pipeline_bigquery_spark
<workflow> [--sf-dir DIR] [--out DIR]``.
"""

from __future__ import annotations

import argparse
import os
import sys

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

# reference workflow name -> registry query key
WORKFLOWS: dict[str, str] = {
    "hubspot_companies_bigquery": "pipeline_entity_sync",
    "hubspot_contacts_bigquery": "pipeline_entity_sync",
    "hubspot_deals_bigquery": "pipeline_entity_sync",
    "hubspot_deal_logs_bigquery": "pipeline_change_log",
    "hubspot_engagement_to_bigquery": "pipeline_engagement",
    "mautic_email_log_to_bigquery": "pipeline_email_read_log",
    "mautic_hubspot_email_read_activities": "pipeline_reverse_etl",
    "hubspot_association_to_bigquery": "pipeline_association_edges",
    # extension workflow (no reference counterpart): the full training-
    # corpus curation pipeline — quality filter → exact dedup →
    # decontamination → split → sequence packing — as one Catalyst plan
    "corpus_build": "pipeline_corpus_curation",
}


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        prog="data_pipeline_bigquery_spark",
        description="Run a workflow (same names as the reference main.py).",
    )
    sub = parser.add_subparsers(dest="workflow", required=True)
    for name in WORKFLOWS:
        p = sub.add_parser(name, help=f"Run the {name} workflow")
        p.add_argument("--sf-dir", default=DEFAULT_SF_DIR, help="input table dir")
        p.add_argument("--out", default=None, help="write result parquet here")
        if name == "hubspot_engagement_to_bigquery":
            p.add_argument(
                "--engagement",
                required=True,
                help="engagement type (emails/calls/notes/...)",
            )
    # operational subcommand (no reference counterpart): the lake
    # maintenance pass — compaction, optional range clustering, and
    # the targeted GDPR delete — over an existing parquet prefix
    m = sub.add_parser(
        "lake_maintenance",
        help="compact a parquet lake path; optionally sort-cluster and "
        "hard-delete keys (file-pruned rewrite)",
    )
    m.add_argument("--path", required=True, help="parquet lake directory")
    m.add_argument("--target-mb", type=float, default=512)
    m.add_argument("--sort-col", default=None, help="range-cluster on this column")
    m.add_argument(
        "--delete-keys",
        default=None,
        help="parquet file/dir of keys to hard-delete before compaction",
    )
    m.add_argument("--key-col", default=None, help="key column for --delete-keys")
    # snapshot-store lifecycle verbs (sources/snapshots.py): every
    # mutation commits a NEW version, so the CLI is safe to interrupt
    s = sub.add_parser(
        "snapshot_maintenance",
        help="snapshot store verbs: expire/vacuum/compact/rollback/"
        "delete-keys over a versioned base dir",
    )
    s.add_argument("--base", required=True, help="snapshot store base dir")
    s.add_argument("--keep-last", type=int, default=None, help="expire all but N versions")
    s.add_argument("--vacuum", action="store_true", help="sweep crashed .tmp-* staging dirs (needs a no-writer window)")
    s.add_argument("--compact-files", type=int, default=None, help="rewrite latest into N files as a new version")
    s.add_argument("--rollback-to", type=int, default=None, help="commit version N's state as the new latest")
    s.add_argument("--delete-keys", default=None, help="parquet file/dir of keys to drop in a new version")
    s.add_argument("--key-col", default=None, help="key column for --delete-keys")
    # data-contract verbs (queries/evalops.py + streaming/
    # expectations_stream.py): the batch expectation report over the
    # fixture tables, or the cumulative streaming-ledger rollup
    q = sub.add_parser(
        "data_quality",
        help="run the declarative expectation report (batch) or roll "
        "up a streaming expectations ledger",
    )
    q.add_argument("--sf-dir", default=DEFAULT_SF_DIR, help="input table dir")
    q.add_argument(
        "--ledger",
        default=None,
        help="streaming expectations ledger dir: print the cumulative "
        "per-rule rollup instead of the batch report",
    )
    q.add_argument(
        "--path",
        default=None,
        help="audit an arbitrary parquet path against --rules instead "
        "of running the built-in orders report",
    )
    q.add_argument(
        "--rules",
        default=None,
        help='JSON file: [{"name": ..., "expr": SQL bool, "blocking": '
        "true}, ...] — required with --path",
    )
    q.add_argument("--out", default=None, help="write result parquet here")
    q.add_argument(
        "--fail-on-violations",
        action="store_true",
        help="exit 1 if any blocking rule has violations (CI gate mode)",
    )
    # plan-shape report (plans/audit.py as a CLI): the "would this
    # survive a 100× scale-up" readout for any registry query —
    # scans per table, exchange count, join strategies, cartesians
    a = sub.add_parser(
        "plan_audit",
        help="print the physical plan-shape summary (scans, exchanges, "
        "join strategies, cartesians) for registry queries",
    )
    a.add_argument(
        "--keys",
        default=None,
        help="comma-separated registry keys (see queries.registry()); "
        "mutually exclusive with --all",
    )
    a.add_argument(
        "--all",
        action="store_true",
        help="audit EVERY registry key (the re-scan sweep); prints only "
        "keys at/above --min-scans unless --verbose",
    )
    a.add_argument(
        "--min-scans",
        type=int,
        default=3,
        help="with --all, report keys whose plan scans some table at "
        "least this many times (default 3)",
    )
    a.add_argument("--sf-dir", default=DEFAULT_SF_DIR, help="input table dir")
    a.add_argument(
        "--fail-on-cartesian",
        action="store_true",
        help="exit 1 if any audited plan contains a CartesianProduct "
        "(CI gate mode)",
    )
    return parser.parse_args(argv)


def run_workflow(
    workflow: str,
    sf_dir: str = DEFAULT_SF_DIR,
    out: str | None = None,
    engagement: str | None = None,
):
    """Dispatch one workflow; returns (rows, DataFrame)."""
    from data_pipeline_bigquery_spark.queries import registry
    from data_pipeline_bigquery_spark.session import get_spark

    spark = get_spark()
    df = registry()[WORKFLOWS[workflow]].fn(spark, sf_dir)
    if engagement is not None:
        # the reference runs one engagement object type per invocation;
        # the fixture events table encodes the type in event_type-like
        # ids, so scope the run the same way when the column exists
        from pyspark.sql import functions as F

        if "properties" in df.columns:
            df = df.withColumn("engagement_type", F.lit(engagement))
    n = df.count()
    if out:
        df.write.mode("overwrite").parquet(out)
    return n, df


def run_maintenance(args) -> str:
    from data_pipeline_bigquery_spark.session import get_spark
    from data_pipeline_bigquery_spark.sources.lake import (
        compact_lake,
        delete_by_keys_rewrite,
    )

    spark = get_spark()
    parts = []
    if args.delete_keys:
        if not args.key_col:
            raise SystemExit("--delete-keys requires --key-col")
        keys = spark.read.parquet(args.delete_keys)
        res = delete_by_keys_rewrite(spark, args.path, args.key_col, keys)
        parts.append(
            f"deleted {res['rows_deleted']} rows "
            f"({res['files_rewritten']} files rewritten)"
        )
    n_files = compact_lake(
        spark, args.path, target_file_mb=args.target_mb, sort_col=args.sort_col
    )
    parts.append(f"compacted to {n_files} files")
    return "; ".join(parts)


def run_snapshot_maintenance(args) -> str:
    from data_pipeline_bigquery_spark.session import get_spark
    from data_pipeline_bigquery_spark.sources.snapshots import (
        compact_snapshot,
        delete_keys_snapshot,
        expire_snapshots,
        rollback_snapshot,
        vacuum_snapshots,
    )

    spark = get_spark()
    parts = []
    if args.delete_keys:
        if not args.key_col:
            raise SystemExit("--delete-keys requires --key-col")
        keys = spark.read.parquet(args.delete_keys)
        v = delete_keys_snapshot(spark, args.base, keys, args.key_col)
        parts.append(f"delete committed as v{v}")
    if args.rollback_to is not None:
        v = rollback_snapshot(spark, args.base, args.rollback_to)
        parts.append(f"rolled back to v{args.rollback_to} as v{v}")
    if args.compact_files is not None:
        v = compact_snapshot(spark, args.base, n_files=args.compact_files)
        parts.append(f"compacted as v{v}")
    if args.keep_last is not None:
        gone = expire_snapshots(spark, args.base, keep_last=args.keep_last)
        parts.append(f"expired versions {gone}")
    if args.vacuum:
        n = vacuum_snapshots(spark, args.base)
        parts.append(f"vacuumed {n} staging dirs")
    return "; ".join(parts) if parts else "nothing to do"


def run_data_quality(args) -> tuple[str, int]:
    """Batch expectation report (or streaming-ledger rollup) to
    console/parquet; returns (summary, exit_code)."""
    from data_pipeline_bigquery_spark.session import get_spark

    spark = get_spark()
    if args.ledger:
        from data_pipeline_bigquery_spark.streaming.expectations_stream import (
            ledger_rollup,
        )

        df = ledger_rollup(spark, args.ledger)
    elif args.path:
        import json

        from data_pipeline_bigquery_spark.streaming.expectations_stream import (
            Expectation,
            evaluate_expectations,
        )

        if not args.rules:
            raise SystemExit("--path requires --rules")
        with open(args.rules) as fh:
            spec = json.load(fh)
        rules = [
            Expectation(
                r["name"], r["expr"], bool(r.get("blocking", True))
            )
            for r in spec
        ]
        df = evaluate_expectations(spark.read.parquet(args.path), rules)
    else:
        from data_pipeline_bigquery_spark.queries import registry

        df = registry()["data_expectations_report"].fn(spark, args.sf_dir)
    # ONE evaluation: every mode's report carries a `blocking` column,
    # so the CI gate is computed in Python from the collected rows
    # (no second Spark job, no re-encoding of the warn/blocking split)
    rows = df.collect()
    blocking_bad = sum(
        1 for r in rows if r.blocking == 1 and r.n_violations > 0
    )
    if args.out:
        # the expectation scan already ran for the gate above — write
        # the COLLECTED report rows (rules-grain, tiny) instead of
        # re-executing the full joined aggregate via df.write
        spark.createDataFrame(rows, df.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(args.out)
    lines = "; ".join(
        f"{r.rule}={r.n_violations}/{r.n_checked}" for r in rows
    )
    code = 1 if (args.fail_on_violations and blocking_bad) else 0
    return lines, code


def run_plan_audit(args) -> tuple[str, int]:
    """Plan-shape summary per key; returns (report, exit_code)."""
    from data_pipeline_bigquery_spark.plans.audit import (
        formatted_plan,
        plan_nodes,
    )
    from data_pipeline_bigquery_spark.queries import registry
    from data_pipeline_bigquery_spark.session import get_spark

    spark = get_spark()
    reg = registry()
    if getattr(args, "all", False) and args.keys:
        raise SystemExit("plan_audit: --all and --keys are mutually exclusive")
    if getattr(args, "all", False):
        keys = list(reg)
    elif args.keys:
        keys = [k.strip() for k in args.keys.split(",") if k.strip()]
    else:
        raise SystemExit("plan_audit needs --keys or --all")
    min_scans = getattr(args, "min_scans", 0) if getattr(
        args, "all", False
    ) else 0
    lines, any_cartesian = [], False
    for key in keys:
        if key not in reg:
            raise SystemExit(f"unknown registry key: {key}")
        df = reg[key].fn(spark, args.sf_dir)
        nodes = plan_nodes(df)
        plan = formatted_plan(df)
        scans = {}
        for line in plan.splitlines():
            if "Location:" in line and ".parquet" in line:
                table = line.rstrip("]").rsplit("/", 1)[-1]
                scans[table] = scans.get(table, 0) + 1
        counts = {
            n: nodes.count(n)
            for n in (
                "Exchange",
                "BroadcastHashJoin",
                "SortMergeJoin",
                "CartesianProduct",
                "BroadcastNestedLoopJoin",
                "Window",
                "WindowGroupLimit",
            )
            if nodes.count(n)
        }
        cut = "ExistingRDD" in plan
        has_cartesian = counts.get("CartesianProduct", 0) > 0
        any_cartesian |= has_cartesian
        if (
            min_scans
            and max(scans.values(), default=0) < min_scans
            and not has_cartesian
        ):
            continue
        scan_s = ", ".join(f"{t}×{c}" for t, c in sorted(scans.items()))
        node_s = ", ".join(f"{k}={v}" for k, v in sorted(counts.items()))
        lines.append(
            f"{key}: scans[{scan_s or 'checkpointed only'}]"
            f" {node_s or 'no joins/exchanges'}"
            f"{'; lineage-cut' if cut else ''}"
        )
    code = 1 if (args.fail_on_cartesian and any_cartesian) else 0
    return "\n".join(lines), code


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)
    if args.workflow == "plan_audit":
        report, code = run_plan_audit(args)
        print(report)
        return code
    if args.workflow == "data_quality":
        summary, code = run_data_quality(args)
        print(f"data_quality: {summary}")
        return code
    if args.workflow == "snapshot_maintenance":
        print(f"snapshot_maintenance: {run_snapshot_maintenance(args)}")
        return 0
    if args.workflow == "lake_maintenance":
        print(f"lake_maintenance: {run_maintenance(args)}")
        return 0
    n, _ = run_workflow(
        args.workflow,
        sf_dir=args.sf_dir,
        out=args.out,
        engagement=getattr(args, "engagement", None),
    )
    dest = args.out or "(not written)"
    print(f"{args.workflow}: {n} rows -> {dest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
