"""Physical-plan audit helpers — make plan shape a testable contract.

At 100 TB the difference between a keyed join and a cartesian product,
or between one exchange and three, is the whole ballgame; these helpers
let tests pin the plan properties that matter (pushdown reached the
scan, no unkeyed join of two large sides, bounded exchange count) so a
refactor that silently regresses the plan fails CI instead of the
cluster.

Counts are taken from the FORMATTED explain's numbered node list
(``(12) SortMergeJoin``), not raw substring hits — the details section
repeats node names and would double-count.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_NODE_RE = re.compile(r"^\s*[*+:\- ]*\((\d+)\)\s+([A-Za-z][A-Za-z0-9]*)")


def formatted_plan(df: DataFrame) -> str:
    """The ``explain('formatted')`` text without printing it."""
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def plan_nodes(df: DataFrame) -> list[str]:
    """Physical operator names in plan order (one per numbered node)."""
    nodes: dict[int, str] = {}
    for line in formatted_plan(df).splitlines():
        m = _NODE_RE.match(line)
        if m:
            nodes.setdefault(int(m.group(1)), m.group(2))
    return [nodes[k] for k in sorted(nodes)]


def count_nodes(df: DataFrame, name: str) -> int:
    return sum(1 for n in plan_nodes(df) if n == name)


def assert_no_cartesian(df: DataFrame, allow_broadcast_nl: int = 0) -> None:
    """No CartesianProduct; at most ``allow_broadcast_nl`` broadcast
    nested-loop joins (the legitimate tiny-side cross joins, e.g. a
    corpus × broadcast(seed-centroids) assignment)."""
    nodes = plan_nodes(df)
    cart = sum(1 for n in nodes if n == "CartesianProduct")
    bnl = sum(1 for n in nodes if n == "BroadcastNestedLoopJoin")
    assert cart == 0, f"CartesianProduct in plan ({cart})"
    assert bnl <= allow_broadcast_nl, (
        f"{bnl} BroadcastNestedLoopJoin nodes (allowed {allow_broadcast_nl}) — "
        "an unkeyed join of two non-broadcast sides would be O(n*m) at scale"
    )


def assert_max_exchanges(df: DataFrame, n: int) -> None:
    """Shuffle budget: at most ``n`` Exchange nodes (ReusedExchange and
    broadcast exchanges excluded — reuse is the goal, broadcasts don't
    move the big side)."""
    ex = sum(
        1
        for node in plan_nodes(df)
        if node == "Exchange"
    )
    assert ex <= n, f"{ex} shuffle exchanges in plan (budget {n})"


def assert_single_scan(df: DataFrame, path_fragment: str) -> None:
    """The table matching ``path_fragment`` is scanned exactly once —
    catches self-join shapes that re-read the same parquet twice.  Each
    scan node carries exactly one ``Location:`` line in the details
    section, so those are the reliable count."""
    hits = [
        line
        for line in formatted_plan(df).splitlines()
        if "Location:" in line and path_fragment in line
    ]
    assert len(hits) <= 1, (
        f"{len(hits)} scans of '{path_fragment}' — duplicate subtree "
        "re-reads the source instead of reusing one scan"
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """A data filter reached the parquet reader (PushedFilters)."""
    plan = formatted_plan(df)
    pushed = [
        line for line in plan.splitlines() if "PushedFilters" in line
    ]
    assert any(fragment in line for line in pushed), (
        f"no PushedFilters line containing '{fragment}' — the predicate "
        f"is evaluated post-scan.  Lines: {pushed!r}"
    )


def assert_partition_pruned(df: DataFrame, col_fragment: str) -> None:
    """A partition filter reached the scan (PartitionFilters)."""
    plan = formatted_plan(df)
    idx = plan.find("PartitionFilters")
    assert idx >= 0 and col_fragment in plan[idx : idx + 300], (
        f"no PartitionFilters on '{col_fragment}' — the scan reads every "
        "partition"
    )


def assert_wholestage_codegen(df: DataFrame) -> None:
    """At least one whole-stage-codegen span: expressions run compiled
    JVM-side, not interpreted.  Executes the plan — under AQE the
    codegen stage markers (``*(n)``) only exist in the finalized
    physical plan, which materializes in-place on first run."""
    df.collect()
    simple = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "*(" in simple, "no WholeStageCodegen stage in executed plan"


def assert_dynamic_partition_pruning(df: DataFrame) -> None:
    """Runtime partition pruning is active: a ``dynamicpruning``
    subquery sits inside the fact scan's PartitionFilters, so the
    partitions a selective dim filter eliminates are never listed —
    the join-time analog of static pruning, and the difference between
    scanning 1 and 1000 date partitions of a 100 TB fact when the dim
    side filters to one day."""
    plan = formatted_plan(df)
    assert "dynamicpruning" in plan.lower(), (
        "no dynamic-pruning subquery in the plan — the fact scan lists "
        "every partition regardless of the dim filter"
    )


def assert_lineage_cut(df: DataFrame) -> None:
    """The plan reads at least one checkpointed RDD (``Scan
    ExistingRDD``) — i.e. a ``localCheckpoint`` lineage cut is still in
    place.  Pairs with :func:`assert_single_scan`: the checkpoint
    truncates the upstream scan out of the audited plan, so
    ``assert_single_scan`` alone would pass vacuously; asserting the
    cut keeps the contract honest (removing the checkpoint re-exposes
    the duplicate scans AND fails this assertion's partner counts)."""
    plan = formatted_plan(df)
    assert "ExistingRDD" in plan, (
        "no checkpointed RDD in plan — the localCheckpoint lineage cut "
        "this query relies on (to scan the fact table once) is gone"
    )
