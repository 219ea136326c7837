"""Dedup cluster formation: connected components over candidate pairs.

Near-dup detectors (MinHash/LSH, SimHash bands, embedding cosine — see
:mod:`.dedup_text`, :mod:`.similarity`) emit candidate PAIRS; an actual
dedup pass needs CLUSTERS — one canonical document per connected
component of the pair graph, everything else dropped.  The reference has
no analog (it dedups on primary key only,
``/root/reference/pipeline/functions/functions.py:91-106``); this is the
cluster step of a corpus-level pipeline.

Scale design: min-label propagation with pointer jumping (path
halving) — the standard MapReduce-style CC algorithm family (cf.
small-star/large-star).  Each round does

* a neighbor-min hash aggregation (one shuffle on the edge key), and
* one label-of-label self-join (pointer jump), which collapses chains
  geometrically: rounds needed are O(log diameter), not O(diameter).

Labels only ever decrease, so ``sum(label)`` is strictly monotone until
the fixpoint — an O(1)-row aggregate per round is the convergence test.
Lineage is cut every round (``localCheckpoint``) so the plan stays
constant-size instead of doubling per iteration; on a real cluster point
``spark.sparkContext.setCheckpointDir`` at durable storage and swap in
``checkpoint()`` for executor-loss resilience.

At the fixpoint every edge (u, v) has ``label[u] == label[v]`` (the
neighbor-min step can no longer improve either side), so labels are
constant per component; the component's minimum id labels itself and
never increases, hence every node carries exactly the component-min id —
the same value a transitive-closure oracle computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

# CC checkpoints cache SERIALIZED (PySpark's MEMORY_AND_DISK is the
# serialized level): the edge list is the iteration's whale — cached
# deserialized, a 10x-scale pair graph (205M symmetrized edges, r13
# probe) pinned enough of the unified pool behind storageFraction to
# starve the aggregates (AGGREGATE_OUT_OF_MEMORY with plenty of disk
# idle).  Serialized rows are several x smaller and evict to disk
# cleanly; the decode cost is paid ~log(diameter) times.
_CC_LEVEL = StorageLevel.MEMORY_AND_DISK


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve an undirected pair list into ``(doc_id, component)`` rows,
    ``component`` = minimum doc id reachable (a deterministic canonical
    representative).  Only nodes that appear in ``pairs`` are returned —
    singleton docs never entered the candidate graph.
    """
    e = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(storageLevel=_CC_LEVEL)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(storageLevel=_CC_LEVEL)
    )

    converged = False
    prev_sum = None
    for _ in range(max_iter):
        # min label over incoming neighbors (least() skips the null from
        # the left join, so isolated directions keep their own label)
        nbr = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("nbr_node"))
            .agg(F.min("label").alias("nbr_min"))
        )
        stepped = labels.join(nbr, labels.node == nbr.nbr_node, "left").select(
            "node", F.least("label", "nbr_min").alias("label")
        )
        # pointer jump: label <- label(label) (path halving)
        l2 = stepped.select(F.col("node").alias("pnode"), F.col("label").alias("plabel"))
        labels = (
            stepped.join(l2, stepped.label == l2.pnode, "left")
            .select("node", F.coalesce("plabel", "label").alias("label"))
            .localCheckpoint(storageLevel=_CC_LEVEL)
        )
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum

    if not converged:
        # labels would be an over-segmentation, not merely imprecise
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "pointer-jumping needs O(log diameter) rounds — raise max_iter"
        )

    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("component"))


def cluster_summary(components: DataFrame) -> DataFrame:
    """Per-cluster rollup: size and canonical (min) member."""
    return components.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("canonical_id"),
    )
