"""Plan-shape regression tests — the scale-safety contract.

Correctness tests prove the queries right at small SF; these prove the
PLANS stay right for 100 TB: predicates reach the parquet scan, projection
is pruned, dimension joins broadcast, aggregation is partial (map-side),
and nothing degenerates into a cartesian product.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from datalakeingestion_spark.plans.registry import REGISTRY, _ensure_loaded

from .conftest import SF_SMALL

_ensure_loaded()


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def run(spark, name):
    return REGISTRY[name].fn(spark, SF_SMALL)


@pytest.mark.smoke
def test_q6_filters_pushed_and_columns_pruned(spark):
    plan = formatted_plan(run(spark, "q6_revenue_forecast"))
    assert "PushedFilters" in plan
    # all four predicates reach the scan
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert any(
            frag in line for line in plan.splitlines() if "PushedFilters" in line
        ), f"{frag} not pushed: {plan}"
    # projection pruned to the 4 referenced columns
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_extendedprice" in read_schema
    assert "l_returnflag" not in read_schema and "l_orderkey" not in read_schema


def test_f1_range_scan_pushdown(spark):
    plan = formatted_plan(run(spark, "f1_watermark_range_scan"))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    # the superset ns-range prefilter must reach the scan (row-group
    # skipping) — IsNotNull alone means the whole table is read
    assert pushed, plan
    assert "GreaterThanOrEqual(ts" in pushed[0], pushed[0]
    assert "LessThanOrEqual(ts" in pushed[0], pushed[0]


def test_q5_dimensions_broadcast(spark):
    plan = formatted_plan(run(spark, "q5_local_supplier_volume"))
    # all four dims broadcast; the one big join (orders⋈lineitem) may be
    # SMJ/shuffled-hash — but never cartesian
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_q1_partial_aggregation(spark):
    plan = formatted_plan(run(spark, "q1_pricing_summary"))
    # partial (map-side) + final HashAggregate pair around one exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_w1_single_shuffle(spark):
    import re

    plan = formatted_plan(run(spark, "w1_latest_event_per_user"))
    # latest-row dedup = exactly one exchange (hash on user_id) + window;
    # Spark 3.5+ also applies WindowGroupLimit: partial top-1 BEFORE the
    # shuffle, so only per-partition winners move — keep that property.
    # Count operator detail sections "(n) Exchange" = unique plan nodes.
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1, plan
    assert "hashpartitioning(user_id" in plan
    assert len(re.findall(r"\(\d+\) WindowGroupLimit\b", plan)) == 2, plan


def test_w3_single_shuffle_no_distinct_expand(spark):
    import re

    plan = formatted_plan(run(spark, "w3_sessionize"))
    # sessionize = ONE exchange (hash on user_id); both windows and the
    # per-user aggregate reuse that partitioning. The session count is
    # max(session_id)+1, so no distinct aggregate (no Expand, no second
    # shuffle) may ever appear — the r5→r7 creep watch item.
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1, plan
    assert "hashpartitioning(user_id" in plan
    assert "Expand" not in plan, plan
    assert len(re.findall(r"\(\d+\) Sort\b", plan)) == 1, plan


def test_dedup_queries_avoid_cartesian(spark):
    for name in ("dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash"):
        plan = formatted_plan(run(spark, name))
        assert "CartesianProduct" not in plan, f"{name} went cartesian"


def test_ann_single_corpus_pass(spark):
    plan = formatted_plan(run(spark, "ann_cosine_topk"))
    # r12 shape: the query set is closed over by ONE mapInPandas kernel,
    # so the corpus crosses the Python boundary once — no per-query
    # replication join, no separate norm/dot ArrowEvalPython nodes
    assert plan.count("MapInPandas (") == 1  # one tree node (+ detail block)
    assert "ArrowEvalPython" not in plan
    assert "Join" not in plan  # covers BroadcastNestedLoop/SortMerge/Hash
    # exactly one Exchange: the k·n_batches-row survivor shuffle for the
    # global per-query window
    assert plan.count("+- Exchange") == 1


@pytest.mark.parametrize(
    "name", ["u2_anti_join_new_tables", "v1_count_reconciliation"]
)
def test_joins_have_no_cartesian(spark, name):
    assert "CartesianProduct" not in formatted_plan(run(spark, name))


def test_q1_long_sums_in_partials(spark):
    import re

    plan = formatted_plan(run(spark, "q1_pricing_summary"))
    # fixed-point rewrite: two exchanges, BOTH carrying only aggregate
    # cells (~|groups|·|partitions| rows) — the (key,pid) partial collapses
    # fully map-side, so no exchange ever moves fact rows. The hot partial
    # sums are LONG sums; decimal appears only in the final merge.
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 2, plan
    assert "partial_sum(_q" in plan  # long partials over the fact rows
    assert "decimal(38,0)" in plan  # exact merge of partials only


def test_q17_decorrelated_joins_broadcast(spark):
    plan = formatted_plan(run(spark, "q17_small_quantity_revenue"))
    # part filter and the per-part aggregate both broadcast onto the fact
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_q21_agg_single_fact_shuffle(spark):
    import re

    plan = formatted_plan(run(spark, "q21_sole_late_supplier_agg"))
    # the Spark-first rewrite: the fact table is shuffled ONCE (repartition
    # on l_orderkey; both groupBys reuse that partitioning) and there is no
    # countDistinct Expand; orders and supplier broadcast
    assert plan.count("hashpartitioning(l_orderkey") == 1, plan
    assert "Expand" not in plan
    assert "CartesianProduct" not in plan


def test_q21_semi_anti_hashed_on_equi_key(spark):
    plan = formatted_plan(run(spark, "q21_sole_late_supplier"))
    # the non-equi suppkey condition must ride a HASHED join on the equi
    # key, never a nested-loop over the fact table
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cluster_assign_no_cartesian(spark):
    plan = formatted_plan(run(spark, "dedup_cluster_assign"))
    assert "CartesianProduct" not in plan


def test_repetition_filter_no_shuffle(spark):
    import re

    plan = formatted_plan(run(spark, "text_repetition_filter"))
    # per-doc arithmetic only: no Exchange anywhere in the plan
    assert not re.findall(r"\(\d+\) Exchange\b", plan), plan


def test_q9_three_dims_broadcast_no_expand(spark):
    plan = formatted_plan(run(spark, "q9_profit_by_nation_year"))
    # part (name-filtered), supplier, and nation all broadcast; the only
    # legitimate big joins are lineitem⋈orders + the final group-by.
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert "Expand" not in plan


def test_q16_distinct_count_stays_two_phase(spark):
    plan = formatted_plan(run(spark, "q16_supplier_part_variety"))
    # single countDistinct must plan as the two-phase partial aggregate on
    # (group, suppkey) — an Expand here would triple the fact pre-shuffle
    assert "Expand" not in plan, plan
    # the supplier blacklist rides a broadcast anti join, never a shuffle
    assert "BroadcastHashJoin LeftAnti" in plan or (
        "LeftAnti" in plan and "BroadcastHashJoin" in plan
    ), plan


def test_q20_fact_pruned_before_aggregate(spark):
    plan = formatted_plan(run(spark, "q20_half_volume_suppliers"))
    # the part-name semi-join must broadcast and sit BELOW the aggregate,
    # so only small-part lineitems reach the groupBy shuffle
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    semi_pos = plan.find("LeftSemi")
    agg_pos = plan.find("HashAggregate")
    assert semi_pos != -1 and agg_pos != -1


def test_chunking_no_shuffle(spark):
    import re

    plan = formatted_plan(run(spark, "chunk_documents_128"))
    # per-doc generate/slice only — no Exchange anywhere
    assert not re.findall(r"\(\d+\) Exchange\b", plan), plan


def test_shuffle_rank_avoids_global_window(spark):
    plan = formatted_plan(run(spark, "shuffle_rank_deterministic"))
    # the distributed prefix sum plans a WINDOW, but only ever the
    # fine-grained per-(range-bucket, key) one inside keyed_prefix_sum —
    # every window spec must carry the _pid bucket column, and nothing
    # may collapse to a single partition (the global row_number shape)
    specs = [
        ln for ln in plan.splitlines() if "windowspecdefinition" in ln
    ]
    assert specs, plan
    assert all("_pid" in ln for ln in specs), plan
    assert "SinglePartition" not in plan, plan


def test_quantize_stays_jvm_side(spark):
    plan = formatted_plan(run(spark, "embedding_quantize_int8"))
    # pure column expressions: no python/pandas evaluation, no shuffle
    import re

    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert not re.findall(r"\(\d+\) Exchange\b", plan), plan


def test_bm25_no_fact_shuffle_topk_not_global_sort(spark):
    import re

    plan = formatted_plan(run(spark, "bm25_rank"))
    # corpus stats are ONE scalar aggregate: the only plain Exchange is
    # its SinglePartition merge (metadata-sized); the doc-scale side
    # never hash-shuffles, the 1-row stats broadcast back, and the top-k
    # is TakeOrdered, never a global Sort
    assert "TakeOrderedAndProject" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    exchanges = re.findall(r"\(\d+\) Exchange\b", plan)
    assert len(exchanges) <= 1, plan
    assert "BroadcastExchange" in plan, plan


def test_w6_range_frame_single_shuffle(spark):
    import re

    plan = formatted_plan(run(spark, "w6_rolling_1h_range"))
    # one hash Exchange on user_id feeding Sort + Window — a rolling
    # interval aggregate must not plan a self-join
    assert "Join" not in plan, plan
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1, plan
    assert "Window" in plan, plan


def test_range_join_is_equi_not_nested_loop(spark):
    # The whole point of operators/rangejoin.py: a key-less point-in-
    # interval join must NOT plan as BroadcastNestedLoopJoin/cartesian —
    # the bucket column gives Catalyst an equi key to hash/sort on.
    for name in ("range_join_error_context_5min", "range_join_signup_followups_1h"):
        plan = formatted_plan(run(spark, name))
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_cms_sketch_aggregates_fixed_grid(spark):
    # The big-side shuffle must be the (d, bucket) cell aggregate with a
    # map-side partial — never a per-term exact count; the probe join
    # broadcasts the sketch.
    plan = formatted_plan(run(spark, "cms_term_frequency"))
    assert "partial_count" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_grouped_kmv_rank_pushed_into_sort(spark):
    # per-group bottom-k must run as WindowGroupLimit (partial top-k in
    # the sort) — never a full per-group sort + filter.
    plan = formatted_plan(run(spark, "sketch_kmv_by_returnflag"))
    assert "WindowGroupLimit" in plan


def test_dynamic_partition_pruning_fires_on_partitioned_lake(spark, tmp_path):
    # The lake writes Hive-partitioned parquet (ingest/pipeline.py
    # partitionBy) — at 100 TB a dim-filtered join must prune fact
    # PARTITIONS at runtime, not scan-and-discard. Pin that the session
    # keeps DPP enabled and the scan carries a dynamicpruning expression.
    from pyspark.sql import functions as F

    fact = spark.range(10_000).select(
        "id", (F.col("id") % 10).alias("p"), (F.col("id") * 2).alias("v")
    )
    fact.write.partitionBy("p").mode("overwrite").parquet(str(tmp_path / "fact"))
    dim = spark.range(10).select(
        F.col("id").alias("p"),
        F.concat(F.lit("g"), (F.col("id") % 3).cast("string")).alias("grp"),
    )
    dim.write.mode("overwrite").parquet(str(tmp_path / "dim"))
    f = spark.read.parquet(str(tmp_path / "fact"))
    d = spark.read.parquet(str(tmp_path / "dim")).filter(F.col("grp") == "g0")
    j = f.join(d, "p").groupBy("grp").agg(F.sum("v").alias("s"))
    assert "dynamicpruning" in formatted_plan(j).lower()


def test_round3_queries_are_single_shuffle(spark):
    # window + aggregate on the same key must REUSE one hash exchange
    # (w7, budget_cap); moment sums are one partial-aggregated exchange
    # (d4); the weighted sample is a pure row filter — zero exchanges.
    import re

    expected = {
        "w7_event_gap_stats": 1,
        "d4_price_quantity_correlation": 1,
        "budget_cap_per_source": 1,
        "sample_quality_weighted": 0,
    }
    for name, n_exchanges in expected.items():
        plan = formatted_plan(run(spark, name))
        got = len(re.findall(r"\(\d+\) Exchange", plan))
        assert got == n_exchanges, (name, got, n_exchanges)


def test_scd2_single_window_shuffle(spark):
    # SCD2 history = one hash exchange on the key + per-partition sort,
    # exactly the latest-view cost (no self-join, no extra exchange)
    import re

    plan = formatted_plan(run(spark, "scd2_user_history"))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "Window" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_boilerplate_df_table_broadcasts(spark):
    # the boilerplate-span table is filtered to >df_threshold BEFORE the
    # join back, so the probe is a broadcast semi-join — the per-doc side
    # never shuffles on span
    plan = formatted_plan(run(spark, "boilerplate_span_flag"))
    assert "BroadcastHashJoin" in plan, plan
    assert "LeftSemi" in plan, plan


def test_t9_dedup_is_partial_aggregate(spark):
    # keyed first-event dedup must be a two-phase hash aggregate
    # (map-side partial min), one exchange, no window
    import re

    plan = formatted_plan(run(spark, "t9_stream_dedup"))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "HashAggregate" in plan
    assert "Window" not in plan


def test_fuzzy_join_candidates_are_equi_join(spark):
    # segment blocking must plan as a shuffled/broadcast EQUI join on
    # (segment, length) — a nested-loop or cartesian plan would mean the
    # pigeonhole blocking degenerated into all-pairs
    plan = formatted_plan(run(spark, "fuzzy_match_customer_names"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_prefix_join_is_equi_not_nested_loop(spark):
    """The prefix-filter candidate join must be a hash/sort-merge equi
    join on the shingle — a BroadcastNestedLoopJoin or CartesianProduct
    would mean the length-filter conjuncts demoted the equi key."""
    plan = formatted_plan(run(spark, "dedup_jaccard_prefix_join"))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_pmi_unigram_frames_broadcast(spark):
    """Both unigram joins into the pair frame must broadcast (vocab-sized
    build sides); the bigram stream must never be the build side."""
    plan = formatted_plan(run(spark, "pmi_collocations_top50"))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan, plan


def test_incremental_dedup_band_probe_is_equi_join(spark):
    plan = formatted_plan(run(spark, "dedup_incremental_vs_lake"))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_source_overlap_is_equi_join(spark):
    plan = formatted_plan(run(spark, "source_ngram_overlap_matrix"))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_winnowing_join_is_equi(spark):
    plan = formatted_plan(run(spark, "winnowing_fingerprint_pairs"))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_negatives_truth_and_queries_broadcast(spark):
    """The corpus×queries cross join must broadcast the QUERY side (the
    corpus never broadcasts), and the exclusion join must broadcast the
    truth set."""
    plan = formatted_plan(run(spark, "sample_negatives_contrastive"))
    assert plan.count("BroadcastExchange") >= 2, plan


def test_quality_rollup_is_partial_aggregate(spark):
    """The ROLLUP aggregate must partial-aggregate map-side (Expand feeds
    partial_count/sum before the exchange) — the monitoring view costs
    one grouping-sets shuffle, never a second scan."""
    plan = formatted_plan(run(spark, "quality_by_source_rollup"))
    assert "Expand" in plan, plan
    assert "partial_count" in plan or "partial_sum" in plan, plan


def test_label_centroid_pairwise_stays_tiny(spark):
    """The pairwise stage must join the labels×dims centroid frame, not
    the corpus — no nested loop, norms broadcast."""
    plan = formatted_plan(run(spark, "label_centroid_similarity"))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastExchange" in plan, plan


def test_mv_states_partial_aggregated(spark):
    # each state is a partial-aggregated (map-side-combined) hash
    # aggregate; the merge re-aggregates the union — no join anywhere
    plan = formatted_plan(run(spark, "mv_incremental_revenue"))
    assert "partial_sum" in plan, plan
    assert "Join" not in plan, plan


def test_pagerank_no_cartesian_and_rank_frame_joins_hashed(spark):
    plan = formatted_plan(run(spark, "pagerank_trade_graph_3iter"))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_transition_matrix_single_shuffle(spark):
    # one hash exchange on user_id feeds the window; the final aggregate
    # adds its own exchange on the (from, to) pair — exactly two
    import re

    plan = formatted_plan(run(spark, "event_transition_matrix"))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2, plan
    assert "CartesianProduct" not in plan


def test_temperature_mix_rates_broadcast_back(spark):
    # the |S|-row rate frame joins back via broadcast; the corpus side
    # never shuffles for the join
    plan = formatted_plan(run(spark, "mix_corpora_temperature_half"))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_decay_score_reference_is_broadcast_not_shuffle(spark):
    plan = formatted_plan(run(spark, "decayed_event_score"))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, (
        plan
    )
    assert "CartesianProduct" not in plan, plan


def test_ols_single_combinable_pass(spark):
    # five sufficient statistics in ONE partial-aggregated exchange
    import re

    plan = formatted_plan(run(spark, "ols_price_quantity_by_flag"))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "partial_sum" in plan, plan


def test_zorder_report_has_no_global_window(spark):
    # the y/z ranks come from the distributed prefix sum: windows appear
    # only as keyed_prefix_sum's per-(range-bucket, key) form (the _pid
    # column in every spec), never a data-sized single-partition window;
    # the only SinglePartition exchanges feed the block-sized report
    # rollup, not row-scale data
    plan = formatted_plan(run(spark, "zorder_skipping_report"))
    specs = [
        ln for ln in plan.splitlines() if "windowspecdefinition" in ln
    ]
    assert specs, plan
    assert all("_pid" in ln for ln in specs), plan


def test_aes_sample_is_takeordered_not_global_sort(spark):
    # global top-k compiles to TakeOrderedAndProject (per-partition
    # partial top-k + tiny merge), not a full Sort + Exchange
    plan = formatted_plan(run(spark, "sample_weighted_aes_top50"))
    assert "TakeOrderedAndProject" in plan, plan


def test_mad_windows_share_one_key_exchange(spark):
    # both ranking windows partition on the same key; the group-sized
    # median/MAD frames come back as broadcasts — no SortMergeJoin
    plan = formatted_plan(run(spark, "mad_outliers_by_flag"))
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_checksum_diff_joins_block_frames_only(spark):
    # the full-outer join is between two B-row checksum frames, never
    # the row-level tables
    import re

    plan = formatted_plan(run(spark, "table_checksum_diff_blocks"))
    assert "FullOuter" in plan, plan
    # two scans -> two partial-aggregated block frames -> join
    assert len(re.findall(r"partial_(sum|count)", plan)) >= 2, plan


def test_blocklist_zero_preaggregate_shuffle(spark):
    # array-membership flags are row expressions; the only exchange is
    # the per-source aggregate's own
    import re

    plan = formatted_plan(run(spark, "blocklist_filter_stats"))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_pair_mining_takeordered_not_global_sort(spark):
    plan = formatted_plan(run(spark, "frequent_part_pairs_top50"))
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_rfm_windows_run_on_customer_frame(spark):
    # the ntile windows sit ABOVE the per-customer aggregate: the order
    # rows are reduced first, then windowed
    plan = formatted_plan(run(spark, "rfm_segments"))
    agg_pos = plan.find("HashAggregate")
    win_pos = plan.find("Window")
    assert agg_pos != -1 and win_pos != -1
    assert "CartesianProduct" not in plan


def test_exact_quantiles_histogram_shape(spark):
    # value histogram is a partial-aggregated exchange; the ranking
    # window runs over histogram rows (same key partitioning reused)
    import re

    plan = formatted_plan(run(spark, "exact_quantiles_price_by_flag"))
    assert "partial_count" in plan, plan
    assert "Window" in plan, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 3, plan


def test_runtime_bloom_filter_fires_on_fact_dim_shape(spark):
    """At cluster scale, Spark's runtime bloom-filter join pruning
    (spark.sql.optimizer.runtime.bloomFilter.*) injects a bloom built
    from the SELECTIVE dim side into the fact scan before the shuffle —
    the engine-native replacement for hand-built semi-join prefilters.
    The local fixture sits below the 10 GiB application-side default,
    so this pin lowers the thresholds to simulate scale and asserts the
    optimizer still recognizes our canonical fact⋈selective-dim shape
    (a wrapped/non-deterministic join key would silently defeat it)."""
    from pyspark.sql import functions as F

    from datalakeingestion_spark.sources.fixtures import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
        orders = load_table(spark, "/root/testdata/sf0.001", "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# Queries whose plans legitimately contain BroadcastNestedLoopJoin: the
# build side is a 1-row scalar frame (corpus totals, thresholds, decile
# boundaries) or the deliberately-broadcast query set joined on a
# non-equi condition (ANN's query_id != neighbor_id). Audited round 4.
_BNLJ_WHITELIST = {
    # psi_drift_windowed / ks_drift_windowed_grid / ks_drift_sampled:
    # the 1-row reference frame (histogram or bottom-k sample —
    # metadata-sized, audited) broadcast onto the window rows
    "psi_drift_windowed",
    "ks_drift_windowed_grid",
    "ks_drift_sampled",
    # 9-row decile grid broadcast onto per-key counts/samples (audited)
    "price_quantiles_sketched",
    "ann_lsh_bucketed",
    "bm25_rank",
    "source_js_divergence",
    "dedup_embedding_cosine",
    "ann_cosine_topk",
    "dedup_embedding_cosine_blocked",
    "ann_pca_rerank_topk",
    "embedding_centroid_outliers",
    "psi_price_drift",
    "mix_corpora_temperature_half",
    "sketch_kmv_union_intersect",
    "decayed_event_score",
    "label_prop_knn_majority",
    "sample_balanced_length_deciles",
    "quantile_map_nchars_by_source",
    "heatmap_price_qty_deciles",
    "matryoshka_rerank_topk",
    "ks_drift_by_source",
    "lsh_candidate_precision",
    "q11_important_stock",
    # 1-row grand-total broadcast onto the manifest-scale resume table
    "delivery_resume_table",
    # block-pair / probe-set broadcasts on non-equi conditions
    "ann_ivf_topk",
    "knn_graph_topk",
    "sample_negatives_contrastive",
    # 1-row query-vector broadcast on the != self condition (cosine_topk,
    # same shape as ann_cosine_topk) feeding the RRF fusion — audited r9
    "hybrid_rrf_topk",
    # four 1-row (orphans x total) scalar joins, one per audited FK
    "referential_integrity_audit",
    # 1-row (stats x counts) scalar join
    "embedding_drift_halves",
    # 1-row total-revenue scalar join
    "revenue_pareto_deciles",
    # 1-row feasibility-scalar (min n_g/target_g) broadcast onto the
    # group-count table (operators/sampling.py::match_target_rates)
    "mix_match_target_lang",
    "curation_pipeline_v3",
    # 1-row (tp, tq) model-totals scalar broadcast onto the 4096-row
    # bucket-count table (operators/dsir.py — audited round 9; the
    # corpus-sized streams only ever meet equi broadcast-hash joins)
    "dsir_weights_en_target",
    "dsir_select_en_top100",
    "dsir_resample_gumbel_top100",
    # the same (tp, tq) 1-row model-totals broadcast, two-corpus form
    # (audited round 10)
    "dsir_weights_vs_tables",
    "dsir_select_vs_top100",
    # 1-row corpus-total broadcast onto the domain rollup (audited r10)
    "domain_quality_rollup",
    # ONE 1-row max-entity-id scalar broadcast in the mint step; it
    # appears 3x in the plan text because golden_records' survivorship
    # fold scans the members union twice and the subtree is not reused
    # (audited round 10 — every copy's build side is the same 1-row
    # aggregate; the corpus-sized streams only meet equi joins)
    "entity_resolution_merge",
}


def test_registry_wide_no_cartesian_products(registry_frames):
    """Global plan-shape net: NO registered query may compile to a
    CartesianProduct, and BroadcastNestedLoopJoin only where audited
    (1-row scalar builds / broadcast query sets on non-equi conditions).
    A refactor that drops a join key or wraps it in a non-pushable
    expression degrades to one of these silently — this catches it
    across every registered query at plan-build cost, no execution
    (the build itself is shared session-wide via registry_frames)."""
    offenders = {}
    for name, df in registry_frames.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        cart = plan.count("CartesianProduct")
        bnlj = plan.count("BroadcastNestedLoopJoin")
        if cart:
            offenders[name] = f"cartesian x{cart}"
        elif bnlj and name not in _BNLJ_WHITELIST:
            offenders[name] = f"unexpected BNLJ x{bnlj}"
    assert not offenders, offenders


def test_url_canonicalize_zero_shuffle(spark):
    # parsing + registrable domain + canonical form are pure regex/array
    # row expressions — the per-doc projection must compile to a scan
    # with NO Exchange at all
    import re

    plan = formatted_plan(run(spark, "url_canonical_parts"))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan


def test_bloom_probe_broadcasts_the_bitmap(spark):
    # the door-check filter is <= m/63 rows and must BROADCAST onto the
    # batch's positions; the corpus-sized stream never shuffles for the
    # join (only the per-probe bool_and aggregate exchanges)
    plan = formatted_plan(run(spark, "bloom_dedup_at_door"))
    assert "BroadcastHashJoin" in plan, plan


def test_dsir_vs_select_is_takeordered(spark):
    plan = formatted_plan(run(spark, "dsir_select_vs_top100"))
    assert "TakeOrderedAndProject" in plan, plan


def test_maxmatch_single_word_shuffle(spark):
    # corpus work is ONE distinct-word aggregate; the greedy regex
    # encode adds no exchange beyond the word groupBy's pair
    import re

    plan = formatted_plan(run(spark, "maxmatch_encode_words"))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 1, plan


def test_quota_selection_single_source_shuffle(spark):
    """select_to_quota = ONE shuffle Exchange (hash on the source key
    for the per-source running-sum window) + a broadcast of the quota
    table — the mixture spec never moves the corpus twice and never
    degenerates into a global window."""
    import re

    from datalakeingestion_spark.functions.text import n_tokens_of
    from datalakeingestion_spark.operators.shards import select_to_quota
    from datalakeingestion_spark.sources.fixtures import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    sized = docs.select(
        "doc_id", n_tokens_of("text").alias("n_tokens"), "source"
    )
    plan = formatted_plan(select_to_quota(sized, {"src0": 800, "src1": 600}))
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1, plan
    assert "hashpartitioning(source" in plan
    assert "BroadcastExchange" in plan  # len(quotas)-row table broadcasts


def test_curriculum_pack_window_stays_bucketed(spark):
    """Length-curriculum packing keeps the prefix sum's scale shape:
    the window runs PER (bucket, key) ordered by the curriculum key
    (n_tokens, doc_id) — never a single-partition global window. (The
    range shuffle itself sits behind keyed_prefix_sum's eager
    checkpoint, so the visible plan starts at the bucketed frame.)"""
    from datalakeingestion_spark.functions.text import n_tokens_of
    from datalakeingestion_spark.operators.packing import pack_sequences
    from datalakeingestion_spark.sources.fixtures import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    sized = docs.select("doc_id", n_tokens_of("text").alias("n_tokens"))
    plan = formatted_plan(
        pack_sequences(
            sized, token_budget=512, order_cols=["n_tokens", "doc_id"]
        )
    )
    assert "hashpartitioning(_pid" in plan, plan  # per-bucket window
    assert "n_tokens" in plan and "ASC NULLS FIRST" in plan
    assert "SinglePartition" not in plan, plan


def test_sequence_boundaries_window_partitions_by_seq(spark):
    """The boundary offsets window partitions by seq_id (budget-bounded
    partitions) — never a single-partition global window; the groupBy
    that builds the boundary string reuses the same hash partitioning."""
    from datalakeingestion_spark.functions.text import n_tokens_of
    from datalakeingestion_spark.operators.packing import (
        sequence_boundaries,
    )
    from datalakeingestion_spark.sources.fixtures import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    sized = docs.select("doc_id", n_tokens_of("text").alias("n_tokens"))
    plan = formatted_plan(sequence_boundaries(sized, token_budget=512))
    assert "hashpartitioning(seq_id" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_tokenizer_true_quota_respects_piece_budget(spark):
    """Quota enforcement in tokenizer tokens: every row's piece total
    stays within its quota, pieces dominate whitespace counts (each
    word is >= 1 piece), the zero quota contributes zero tokens (a
    zero-token doc may still ride it: running 0 <= quota 0 on both
    engines), and the slack quota keeps every doc of its source."""
    from datalakeingestion_spark.plans.round12 import (
        _QUOTAS,
        tokenizer_true_quota_selection,
    )
    from datalakeingestion_spark.sources.fixtures import load_table

    rows = {
        r["source"]: r
        for r in tokenizer_true_quota_selection(spark, SF_SMALL).collect()
    }
    assert set(rows) == set(_QUOTAS)
    for r in rows.values():
        assert r["piece_tokens"] <= r["quota"]
        assert r["piece_tokens"] >= r["ws_tokens"]
    # a zero quota contributes zero TOKENS; n_docs == 0 would be
    # fixture luck (an empty-text src3 doc passes running 0 <= 0)
    assert rows["src3"]["piece_tokens"] == 0
    n_src2 = (
        load_table(spark, SF_SMALL, "documents")
        .filter("source = 'src2'")
        .count()
    )
    assert rows["src2"]["n_docs"] == n_src2  # slack quota keeps all


def test_delivery_resume_table_accounting_is_exact(spark):
    """Resume-table invariants engine-side: first shard starts at 0,
    every row's before + own + remaining == grand total, progress is
    non-decreasing in shard order."""
    from datalakeingestion_spark.plans.round12 import delivery_resume_table

    rows = sorted(
        delivery_resume_table(spark, SF_SMALL).collect(),
        key=lambda r: r["shard_id"],
    )
    assert rows and rows[0]["tokens_before"] == 0
    total = rows[0]["tokens_before"] + rows[0]["n_tokens"] + rows[0][
        "tokens_remaining"
    ]
    for r in rows:
        assert (
            r["tokens_before"] + r["n_tokens"] + r["tokens_remaining"]
            == total
        )
    ppm = [r["progress_ppm"] for r in rows]
    assert ppm == sorted(ppm) and rows[-1]["tokens_remaining"] == 0


def test_holdout_delivery_excludes_and_delivers_completely(spark):
    """The holdout contract's two invariants, engine-side: the holdout
    split reaches ZERO shards (leakage) and the train split delivers
    every doc (completeness — a NULL-token silent drop would show
    here); the split is non-degenerate on the fixtures."""
    from datalakeingestion_spark.plans.round12 import (
        holdout_excluded_delivery_contract,
    )

    rows = {
        r["split"]: r
        for r in holdout_excluded_delivery_contract(spark, SF_SMALL).collect()
    }
    assert set(rows) == {"train", "holdout"}  # non-degenerate split
    assert rows["holdout"]["n_shards"] == 0
    assert rows["holdout"]["docs_in_delivery"] == 0
    assert rows["train"]["docs_in_delivery"] == rows["train"]["n_docs"]
    assert rows["train"]["n_shards"] > 0


def test_tokenizer_true_sizing_has_no_token_scale_shuffle(spark):
    """tokenizer_true's sizing never shuffles token-scale rows: the
    piece table broadcasts onto the occurrence explode (partial sums go
    straight to a doc_id exchange), and the distinct-word branch prunes
    its scan to the text column alone — the two shuffles are
    word-cardinality and doc-cardinality, never token-cardinality."""
    import re

    from pyspark.sql import functions as F

    from datalakeingestion_spark.functions.text import tokens
    from datalakeingestion_spark.operators.packing import (
        maxmatch_piece_counts,
    )
    from datalakeingestion_spark.plans.round10 import _MAXMATCH_VOCAB
    from datalakeingestion_spark.sources.fixtures import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    words = docs.select("doc_id", F.explode(tokens("text")).alias("word"))
    n_pieces = maxmatch_piece_counts(words, _MAXMATCH_VOCAB)
    per_doc = (
        words.join(n_pieces, "word")
        .groupBy("doc_id")
        .agg(F.sum("n_pieces").cast("long").alias("n_tokens"))
    )
    plan = formatted_plan(per_doc)
    assert "BroadcastHashJoin" in plan, plan
    # the only hash exchanges are by doc_id and by word — a combined
    # (doc_id, word) exchange would be a token-scale shuffle
    assert not re.search(r"hashpartitioning\(doc_id#\d+L, word", plan), plan
    # distinct-word branch scans text ONLY (column pruning reached it)
    assert "ReadSchema: struct<text:string>" in plan, plan


def test_shuffled_pack_order_stays_bucketed(spark):
    """Seeded-shuffle packing is just another total order: the prefix
    sum's window stays per-(bucket, key), ordered by the hash key —
    no global window sneaks in because the key is a string."""
    from pyspark.sql import functions as F

    from datalakeingestion_spark.functions.text import n_tokens_of
    from datalakeingestion_spark.operators.packing import pack_sequences
    from datalakeingestion_spark.sources.fixtures import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    sized = docs.select(
        "doc_id",
        n_tokens_of("text").alias("n_tokens"),
        F.md5(F.concat(F.lit("shuf12|"), F.col("doc_id").cast("string")))
        .alias("shuffle_key"),
    )
    plan = formatted_plan(
        pack_sequences(
            sized, token_budget=512, order_cols=["shuffle_key", "doc_id"]
        )
    )
    assert "hashpartitioning(_pid" in plan, plan
    assert "shuffle_key" in plan
    assert "SinglePartition" not in plan, plan


def test_curate_tokenize_chain_pinned_once(spark):
    """r13 pin for the curate anti-re-inline (_pin_once, VERDICT r12
    item 8 / ADVICE): the quality+language tail must evaluate the
    tokenize chain ONCE, behind the nondeterministic CASE WHEN
    (SPARK_PARTITION_ID() >= 0) pin. The pin leans on Catalyst
    internals (PushPredicateThroughNonJoin / CollapseProject skip
    nondeterministic aliases), so a Spark upgrade could silently
    re-inline the chain ~40x per row into the filter predicates —
    value-preserving but a large perf regression. This asserts the
    executable facts: exactly one pinned chain in the optimized plan,
    and no tokenize chain inside any Filter condition."""
    df = run(spark, "curation_pipeline")
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("SPARK_PARTITION_ID") == 1, (
        "the _pin_once projection must appear exactly once "
        f"(found {opt.count('SPARK_PARTITION_ID')})"
    )
    filter_lines = [
        ln for ln in opt.splitlines() if ln.lstrip("+- ").startswith("Filter")
    ]
    assert filter_lines, "expected at least one Filter in the curate plan"
    offenders = [ln[:160] for ln in filter_lines if "regexp_replace" in ln]
    assert not offenders, (
        "tokenize chain re-inlined into a filter predicate: "
        f"{offenders}"
    )
