"""Plan-shape contracts for the most expensive queries, via
``plans/audit.py``: a refactor that introduces a cartesian product, an
extra shuffle, or a duplicate scan of the fact table fails here instead
of on the cluster.  Budgets are pinned to the current (audited) plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.plans.audit import (
    assert_lineage_cut,
    assert_max_exchanges,
    assert_no_cartesian,
    assert_partition_pruned,
    assert_pushed_filter,
    assert_single_scan,
    assert_wholestage_codegen,
    count_nodes,
)
from data_pipeline_bigquery_spark.queries import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return registry()


def _q(reg, spark, name):
    return reg[name].fn(spark, SF)


def test_association_single_scan_single_exchange(spark, reg):
    df = _q(reg, spark, "pipeline_association_edges")
    assert_single_scan(df, "lineitem")
    assert_no_cartesian(df)
    assert_max_exchanges(df, 1)


def test_association_aggregates_post_shuffle(spark, reg):
    """r14: (l_orderkey, l_partkey) pairs are ~unique, so a map-side
    partial agg never reduces the exchange; the explicit repartition on
    the grouping keys must plan BOTH HashAggregates above the shuffle
    (the scan task only scans + writes) and keep the exchange
    AQE-coalescable (REPARTITION_BY_COL, not a pinned partition count)."""
    import re

    from data_pipeline_bigquery_spark.plans.audit import formatted_plan

    plan = formatted_plan(_q(reg, spark, "pipeline_association_edges"))
    # the formatted detail section numbers operators leaf-first, so
    # "above the shuffle" = a HIGHER operator number than the Exchange
    nums = {}
    for m in re.finditer(r"^\((\d+)\) (Exchange|HashAggregate)", plan, re.M):
        nums.setdefault(m.group(2), []).append(int(m.group(1)))
    assert len(nums.get("Exchange", [])) == 1, plan[:800]
    assert len(nums.get("HashAggregate", [])) == 2, plan[:800]
    assert all(a > nums["Exchange"][0] for a in nums["HashAggregate"]), plan[:800]
    assert "REPARTITION_BY_COL" in plan, plan[:800]


def test_star_join_all_broadcast(spark, reg):
    df = _q(reg, spark, "join_agg_revenue_by_nation")
    assert_no_cartesian(df)
    # every dim side broadcast; since r9 the fact side PRE-AGGREGATES
    # to orderkey grain before the star join (one extra deliberate
    # exchange that removes ~4x the row volume from the join chain and
    # killed the r8 broadcast/shuffle plan oscillation), so the budget
    # is 2: the orderkey partial-agg shuffle + the final nation agg
    assert count_nodes(df, "SortMergeJoin") == 0
    assert count_nodes(df, "BroadcastHashJoin") >= 3
    assert_max_exchanges(df, 2)
    assert_wholestage_codegen(df)


def test_entity_sync_single_exchange(spark, reg):
    df = _q(reg, spark, "pipeline_entity_sync")
    assert_no_cartesian(df)
    assert_max_exchanges(df, 1)


def test_minhash_no_join_bounded_shuffles(spark, reg):
    df = _q(reg, spark, "dedup_minhash_lsh")
    # bucketed pair generation: no self-join of the signature subtree
    assert_no_cartesian(df)
    assert count_nodes(df, "SortMergeJoin") == 0
    assert_max_exchanges(df, 4)


def test_embedding_neardup_bucketed(spark, reg):
    df = _q(reg, spark, "dedup_embedding_cosine")
    # the only nested-loop join is corpus x broadcast(16 seeds); pair
    # generation itself is groupBy(cell) + in-bucket transform
    assert_no_cartesian(df, allow_broadcast_nl=1)
    assert count_nodes(df, "CartesianProduct") == 0
    assert_max_exchanges(df, 5)


def test_ann_topk_broadcast_query_side(spark, reg):
    df = _q(reg, spark, "ann_cosine_topk")
    # brute-force baseline: the tiny query side is broadcast; the corpus
    # is scanned once, never shuffled pre-ranking
    assert_no_cartesian(df, allow_broadcast_nl=1)
    assert_max_exchanges(df, 3)


def test_merge_upsert_one_join_exchange_pair(spark, reg):
    df = _q(reg, spark, "merge_upsert")
    assert_no_cartesian(df)
    assert count_nodes(df, "SortMergeJoin") <= 1
    assert_max_exchanges(df, 2)


def test_pushdown_reaches_scan(spark, reg):
    df = _q(reg, spark, "pushdown_search_scan")
    assert_pushed_filter(df, "IsNotNull")
    assert_wholestage_codegen(df)


def test_partition_pruning(spark, tmp_path):
    from data_pipeline_bigquery_spark.sources.lake import (
        read_year_partitions,
        write_lake,
    )
    from data_pipeline_bigquery_spark.catalog import load

    orders = load(spark, SF, "orders").withColumn("year", F.year("o_orderdate"))
    path = str(tmp_path / "lake")
    write_lake(orders, path, partition_by=("year",))
    pruned = read_year_partitions(spark, path, 1995, 1996)
    assert_partition_pruned(pruned, "year")


def test_q7_single_shuffle_all_dims_broadcast(spark, reg):
    # supplier/customer/nation broadcast; the one Exchange is the final
    # aggregate (at fixture scale AQE broadcasts orders too — at 100 TB
    # that join degrades gracefully to a co-partitioned SMJ, which the
    # cartesian/exchange budgets still admit)
    df = _q(reg, spark, "q7_volume_shipping")
    assert_no_cartesian(df)
    assert count_nodes(df, "BroadcastHashJoin") >= 4
    assert_max_exchanges(df, 3)


def test_q10_limit_is_take_ordered(spark, reg):
    # ranked LIMIT compiles to TakeOrderedAndProject (per-partition
    # top-k + driver merge), never a global sort of the aggregate
    df = _q(reg, spark, "q10_returned_items")
    assert_no_cartesian(df)
    assert count_nodes(df, "TakeOrderedAndProject") == 1
    assert count_nodes(df, "Sort") == 0
    assert_max_exchanges(df, 2)


def test_q19_disjunction_stays_post_join(spark, reg):
    # one broadcast join + one scalar agg: the OR-of-bundles predicate
    # must not multiply the plan into a union of three scans
    df = _q(reg, spark, "q19_disjunctive_predicates")
    assert_no_cartesian(df)
    assert_single_scan(df, "lineitem")
    assert_max_exchanges(df, 1)


def test_q20_nested_semijoin_single_fact_scan(spark, reg):
    df = _q(reg, spark, "q20_part_promotion")
    assert_no_cartesian(df)
    assert_single_scan(df, "lineitem")
    assert_max_exchanges(df, 2)


def test_sketch_percentile_audit_broadcasts_sketch(spark, reg):
    # the rank audit joins the 3-row sketch result back onto the fact as
    # a broadcast — the fact must never shuffle for the join itself
    df = _q(reg, spark, "approx_price_percentiles")
    assert_no_cartesian(df)
    assert count_nodes(df, "SortMergeJoin") == 0
    assert count_nodes(df, "BroadcastHashJoin") == 1


def test_sketch_distinct_single_exchange(spark, reg):
    # HLL++ sketch and exact count(distinct) share one grouping: the
    # distinct expand adds its exchange, but nothing data-sized beyond
    df = _q(reg, spark, "approx_distinct_daily")
    assert_no_cartesian(df)
    assert_max_exchanges(df, 3)


@pytest.mark.slow  # registry-WIDE sweep (~60 s): builds all 363 plans
def test_whole_registry_no_cartesian_products(spark, reg):
    """Every registry plan, scanned automatically: a new query that
    sneaks in a CartesianProduct fails here the day it lands (this
    replaces the one-off r4 bulk scan).  BroadcastNestedLoopJoin is
    allowed — the ANN corpus x broadcast(queries/seeds) assignments and
    the 1-row scalar-subquery gates are intentional; a true unkeyed
    cartesian of two data-sized sides is not."""
    offenders = []
    for name in sorted(reg):
        try:
            df = reg[name].fn(spark, SF)
        except Exception as exc:  # plan construction itself must not die
            offenders.append(f"{name}: failed to build plan: {exc}")
            continue
        if count_nodes(df, "CartesianProduct"):
            offenders.append(f"{name}: CartesianProduct in plan")
    assert not offenders, "\n".join(offenders)


def test_inverted_index_postings_cut_below_exchange(spark, reg):
    # Partial (map-side) + Final WindowGroupLimit: the top-5 postings
    # cut runs BEFORE the term exchange, so a hot term's corpus-sized
    # posting list never concentrates on one executor
    df = _q(reg, spark, "inverted_index_build")
    assert_no_cartesian(df)
    assert count_nodes(df, "WindowGroupLimit") == 2


def test_hybrid_arms_take_ordered_before_rank(spark, reg):
    # each retrieval arm reduces via TakeOrderedAndProject before any
    # rank window exists — the rank windows run on <=20-row inputs
    df = _q(reg, spark, "hybrid_search_rrf")
    assert_no_cartesian(df, allow_broadcast_nl=2)
    assert count_nodes(df, "TakeOrderedAndProject") >= 2


def test_skyline_prefix_scan_stays_bucket_partitioned(spark, reg):
    # the distributed prefix max: level windows partition by bucket;
    # the only single-partition exchange carries the ~256 bucket maxima
    df = _q(reg, spark, "pareto_skyline_customers")
    assert_no_cartesian(df, allow_broadcast_nl=2)
    from data_pipeline_bigquery_spark.plans.audit import plan_nodes

    singles = [n for n in plan_nodes(df) if "Exchange SinglePartition" in n]
    assert len(singles) <= 1


def test_basket_pairs_no_cartesian_bounded_joins(spark, reg):
    # the within-order self-join must stay an equi-join on l_orderkey
    df = _q(reg, spark, "basket_part_pairs")
    assert_no_cartesian(df, allow_broadcast_nl=1)  # 1-row totals
    assert count_nodes(df, "TakeOrderedAndProject") == 1


def test_rfm_windows_stay_domain_grain(spark, reg):
    # boundary windows run on rec/freq/mon-band domains; the scoring
    # pass must not introduce a data-sized cartesian
    # 7 one-row broadcasts: the max-day join replays in each of the 4
    # branches that re-derive rfm (scoring + 3 boundary aggregates),
    # plus the 3 boundary-row joins — all 1-row sides, zero cartesians
    df = _q(reg, spark, "customer_rfm_segments")
    assert_no_cartesian(df, allow_broadcast_nl=7)


def test_kmeans_assignment_broadcasts_centroids(spark):
    # one Lloyd step audited un-checkpointed (the registry query
    # materializes between steps, which truncates the visible plan):
    # corpus x broadcast(k centroid rows) is the ONLY non-equi join,
    # and the assignment side adds no corpus-sized exchange — the
    # exchanges carry exploded components and k centroid rows only
    from data_pipeline_bigquery_spark.extensions.kmeans import (
        _centroids,
        assign_step,
        quantize,
    )
    from data_pipeline_bigquery_spark.catalog import load

    emb = load(spark, SF, "embeddings").select(
        "vec_id", quantize(F.col("embedding")).alias("q"),
        F.col("label").alias("cluster"),
    )
    df = assign_step(emb.select("vec_id", "q"), _centroids(emb))
    assert_no_cartesian(df, allow_broadcast_nl=1)


def test_session_window_single_user_exchange(spark, reg):
    # native session_window agg: one hash exchange on user_id, no
    # window functions, no joins
    df = _q(reg, spark, "session_window_agg")
    assert_no_cartesian(df)
    assert_max_exchanges(df, 1)
    assert count_nodes(df, "Window") == 0


def test_pit_lookup_stays_equi_join(spark, reg):
    # the interval containment must ride an EQUI join on the dim key
    # (residual range filter), never a cartesian/range-only join
    df = _q(reg, spark, "pit_dim_lookup")
    assert_no_cartesian(df)


def test_multi_touch_user_keyed_equi_join(spark, reg):
    df = _q(reg, spark, "multi_touch_attribution")
    assert_no_cartesian(df)


def test_apriori_prunes_below_the_triple_join(spark, reg):
    # the frequent-pair semi-join must execute BETWEEN the basket
    # joins (visible as LeftSemi joins in the plan), and no cartesian
    # may appear anywhere
    df = _q(reg, spark, "basket_triples_apriori")
    assert_no_cartesian(df)
    # join TYPE lives in node args, not node names — read the full plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


def test_vocab_curve_no_global_window(spark, reg):
    # totals come from an aggregate, ranks from bucketed windows —
    # the only single-partition exchange may carry the 256-row bucket
    # histogram, never the vocabulary
    df = _q(reg, spark, "vocab_coverage_curve")
    # the 1-row count-range broadcast replays in both two-phase
    # branches (local ranks + bucket offsets) → 2 broadcast NL joins
    assert_no_cartesian(df, allow_broadcast_nl=2)
    assert count_nodes(df, "CartesianProduct") == 0


def test_hierarchy_share_windows_post_aggregate(spark, reg):
    # both share windows must sit above the 25-row nation aggregate;
    # dims broadcast so the fact never shuffles pre-agg
    df = _q(reg, spark, "hierarchical_revenue_share")
    assert_no_cartesian(df)
    assert count_nodes(df, "BroadcastHashJoin") >= 3
    assert count_nodes(df, "SortMergeJoin") == 0


def test_knn_probe_broadcast_pairs_only(spark, reg):
    """1-NN label probe (r10 form): the BLAS kernel emits a provably
    sufficient shortlist, so the only join left is the keyed broadcast
    of the b-side onto ~1-2 candidates per row — no nested loop, no
    CartesianProduct, and the |corpus|² pair stream is gone."""
    df = _q(reg, spark, "knn_label_accuracy")
    assert_no_cartesian(df)
    assert count_nodes(df, "CartesianProduct") == 0


def test_basket_lift_keyed_joins_only(spark, reg):
    """Association rules: every join keys on the order or the part —
    no unkeyed pair blowup beyond the per-basket pair explode."""
    df = _q(reg, spark, "basket_lift_confidence")
    assert_no_cartesian(df)


def test_bfs_frontier_joins_keyed(spark, reg):
    """BFS rounds are equi-joins on the frontier node; the visited-set
    anti-joins stay keyed too."""
    df = _q(reg, spark, "bfs_hops_copurchase")
    assert_no_cartesian(df)


def test_target_encoding_broadcasts_segment_stats(spark, reg):
    """LOO target encoding must NOT window over the 5-value segment —
    the per-segment stats come back as a broadcast join."""
    df = _q(reg, spark, "target_encoding_loo")
    assert_no_cartesian(df)
    from data_pipeline_bigquery_spark.plans.audit import plan_nodes

    assert not any("Window" in n for n in plan_nodes(df)), (
        "segment stats should be an aggregate + broadcast join, not a "
        "low-cardinality window"
    )


def test_bootstrap_single_scan_no_cartesian(spark, reg):
    df = _q(reg, spark, "bootstrap_ci_revenue")
    # ONE orders scan: the full-sample mean rides in the per-replicate
    # aggregate instead of a second pass
    assert_single_scan(df, "orders")
    assert_no_cartesian(df)


def test_autocorr_single_scan(spark, reg):
    df = _q(reg, spark, "autocorr_daily_revenue")
    # both lags from one window pass; a second events scan means the
    # per-lag branches stopped sharing the day-grain aggregate
    assert_single_scan(df, "events")
    assert_no_cartesian(df)


def test_theil_sen_checkpoint_cuts_fact_scans(spark, reg):
    df = _q(reg, spark, "theil_sen_trend")
    # the day-grain series is localCheckpoint'd BEFORE the O(days^2)
    # self-join: zero parquet scans in the final plan (the one events
    # scan happened at checkpoint time; 8 scans in the naive plan)
    assert_single_scan(df, "events")
    assert_no_cartesian(df)


def test_cuped_single_scan_single_row_out(spark, reg):
    df = _q(reg, spark, "cuped_adjusted_lift")
    assert_single_scan(df, "events")
    assert_no_cartesian(df)


def test_forecast_backtest_single_scan(spark, reg):
    df = _q(reg, spark, "forecast_backtest_mae")
    assert_single_scan(df, "events")
    assert_no_cartesian(df)


def test_funnel_lag_checkpoint_single_fact_scan(spark, reg):
    df = _q(reg, spark, "funnel_conversion_lag_percentiles")
    assert_single_scan(df, "events")
    assert_no_cartesian(df, allow_broadcast_nl=1)  # 1-row stats broadcast


def test_iqr_audit_checkpoint_single_fact_scan(spark, reg):
    df = _q(reg, spark, "iqr_outlier_audit")
    assert_single_scan(df, "events")
    assert_no_cartesian(df)


def test_mann_kendall_checkpoint_single_fact_scan(spark, reg):
    df = _q(reg, spark, "mann_kendall_trend")
    assert_lineage_cut(df)
    # day grain is localCheckpoint'd before its four DAG references
    # (pair join a/b, tie groups, base counts): 4 events scans naive
    assert_single_scan(df, "events")
    assert_no_cartesian(df)


def test_seasonal_skill_checkpoint_single_fact_scan(spark, reg):
    df = _q(reg, spark, "seasonal_naive_skill")
    assert_lineage_cut(df)
    assert_single_scan(df, "events")
    assert_no_cartesian(df)


def test_bigram_coverage_checkpoint_single_corpus_scan(spark, reg):
    df = _q(reg, spark, "bigram_coverage_quality")
    assert_lineage_cut(df)
    # tokenized doc grain checkpointed before vocabulary / coverage /
    # denominator branches (3 corpus scans naive)
    assert_single_scan(df, "documents")
    assert_no_cartesian(df)


def test_covisitation_checkpoint_single_fact_scan(spark, reg):
    df = _q(reg, spark, "item_item_covisitation")
    assert_lineage_cut(df)
    # (order, part) grain checkpointed before the pair self-join and
    # both degree joins (6 lineitem scans naive)
    assert_single_scan(df, "lineitem")
    assert_no_cartesian(df)


def test_covisitation_recs_checkpoint_bounded_scans(spark, reg):
    df = _q(reg, spark, "covisitation_recs")
    assert_lineage_cut(df)
    # op and hist grains are both checkpointed (8 lineitem + 2 orders
    # scans naive); orders is read once into the hist checkpoint
    assert_single_scan(df, "lineitem")
    assert_single_scan(df, "orders")
    assert_no_cartesian(df)


def test_t_closeness_single_scan_broadcast_global(spark, reg):
    df = _q(reg, spark, "t_closeness_audit")
    assert_lineage_cut(df)
    # group table checkpointed; the 1-row global rollup broadcasts back
    assert_single_scan(df, "customer")
    assert_no_cartesian(df, allow_broadcast_nl=1)


def test_auc_ranksum_single_scan(spark, reg):
    df = _q(reg, spark, "model_auc_ranksum")
    # fact → user grain → score-domain histogram → global agg: one scan
    assert_single_scan(df, "events")
    assert_no_cartesian(df)


def test_pinball_checkpoint_single_fact_scan(spark, reg):
    df = _q(reg, spark, "quantile_pinball_eval")
    assert_lineage_cut(df)
    assert_single_scan(df, "events")
    assert_no_cartesian(df)


def test_rag_chunks_single_scan_no_shuffle_agg(spark, reg):
    df = _q(reg, spark, "rag_chunk_windows")
    # map-side explode: one corpus scan, no join, no aggregation
    assert_single_scan(df, "documents")
    assert_no_cartesian(df)


def test_croston_single_fact_scan(spark, reg):
    df = _q(reg, spark, "croston_intermittent_forecast")
    assert_single_scan(df, "events")
    assert_no_cartesian(df)


def test_diversity_sample_broadcast_assignment(spark, reg):
    df = _q(reg, spark, "semantic_diversity_sample")
    # the 10-row (centroid, count) side broadcasts; the corpus never
    # shuffles for assignment (same plan family as the confusion key)
    assert_no_cartesian(df, allow_broadcast_nl=1)


def test_signature_manifest_single_corpus_scan(spark, reg):
    df = _q(reg, spark, "dedup_signature_manifest")
    assert_single_scan(df, "documents")
    assert_no_cartesian(df)


def test_source_overlap_checkpoint_single_scan(spark, reg):
    df = _q(reg, spark, "source_overlap_matrix")
    assert_lineage_cut(df)
    # (source, digest) grain checkpointed before totals + pair join
    assert_single_scan(df, "documents")
    assert_no_cartesian(df)


def test_incremental_dedup_band_keyed_join(spark, reg):
    df = _q(reg, spark, "incremental_dedup_against_manifest")
    # candidate generation is keyed on (band_idx, band_hash) — never a
    # cartesian pairing of new docs × corpus
    assert_no_cartesian(df)


def test_embedding_outlier_broadcast_centroids(spark, reg):
    df = _q(reg, spark, "embedding_outlier_audit")
    # the centroid side is checkpointed (its scan happens in the
    # checkpoint job), so pair the single-scan pin with the cut...
    assert_single_scan(df, "embeddings")
    assert_lineage_cut(df)
    assert_no_cartesian(df)
    # ...and hold the name to its promise: the tiny centroid table
    # joins as a broadcast, never a shuffle
    assert count_nodes(df, "BroadcastHashJoin") >= 1


def test_lang_confusion_single_scan(spark, reg):
    df = _q(reg, spark, "lang_id_confusion")
    assert_single_scan(df, "documents")
    assert_no_cartesian(df)


def test_threshold_sweep_no_cartesian(spark, reg):
    df = _q(reg, spark, "dedup_threshold_sweep")
    # the 5-threshold explode is a Generate node, not a join — no
    # nested-loop slack needed
    assert_no_cartesian(df)


def test_learning_curve_single_scan(spark, reg):
    df = _q(reg, spark, "learning_curve_quality")
    assert_single_scan(df, "documents")
    assert_no_cartesian(df)


def test_rare_collapse_single_scan(spark, reg):
    df = _q(reg, spark, "rare_category_collapse")
    assert_single_scan(df, "part")
    assert_no_cartesian(df)


def test_heaps_single_corpus_scan(spark, reg):
    df = _q(reg, spark, "heaps_law_vocab_growth")
    # the token stream is checkpointed before its two aggregates
    assert_single_scan(df, "documents")
    assert_lineage_cut(df)
    assert_no_cartesian(df)


def test_minhash_calibration_checkpointed_signatures(spark, reg):
    df = _q(reg, spark, "minhash_estimate_calibration")
    # signatures checkpointed before the 3 references (pairs, a, b)
    assert_lineage_cut(df)
    assert_no_cartesian(df)


def test_cycle_percentiles_value_domain_windows(spark, reg):
    df = _q(reg, spark, "order_cycle_time_percentiles")
    assert_single_scan(df, "lineitem")
    assert_single_scan(df, "orders")
    assert_no_cartesian(df)


def test_vocab_overlap_checkpointed_top_sets(spark, reg):
    df = _q(reg, spark, "vocabulary_overlap_between_langs")
    assert_single_scan(df, "documents")
    assert_lineage_cut(df)
    # the all-pairs scaffold is langs×langs over the language-count
    # rows — a legitimate tiny-side nested loop
    assert_no_cartesian(df, allow_broadcast_nl=1)


def test_merge_upsert_join_strategy_guard(spark, reg):
    """r14 guard: the default MERGE keeps the delta-built
    ShuffledHashJoin (both Sorts deleted); a caller whose delta rivals
    the target opts back into the spill-safe SortMergeJoin with
    build_source=False."""
    from data_pipeline_bigquery_spark.catalog import load
    from data_pipeline_bigquery_spark.operators.merge import merge_upsert

    df = _q(reg, spark, "merge_upsert")
    assert count_nodes(df, "ShuffledHashJoin") == 1
    assert count_nodes(df, "SortMergeJoin") == 0

    orders = load(spark, SF, "orders")
    big_delta = merge_upsert(
        orders, orders, pk="o_orderkey", cursor_col="o_orderdate",
        build_source=False,
    )
    assert count_nodes(big_delta, "SortMergeJoin") == 1
    assert count_nodes(big_delta, "ShuffledHashJoin") == 0
