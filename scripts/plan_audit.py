"""Physical-plan audit: capture `.explain('formatted')` for the
flagship queries and check the plan properties that matter at 100 TB
(filter/projection pushdown into the parquet scan, broadcast joins on
dimensions, whole-stage codegen coverage, no accidental global
windows). Writes PLANS.md.

Run: python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

from finanalyzer_spark.plans import REGISTRY  # noqa: E402
from finanalyzer_spark.plans.lint import (  # noqa: E402
    global_sort_ids,
    global_window_ids,
)
from finanalyzer_spark.session import get_spark  # noqa: E402

#: query → properties we insist on. "must"/"must_not" are plan
#: substrings; "no_global_window"/"no_global_sort" (optional bools)
#: run the STRUCTURAL detectors from plans/lint.py — a flat substring
#: can't express "SinglePartition exchange feeding a Window" because
#: formatted mode puts exchange arguments on their own line (the r5
#: 'Sort [' assertion was vacuous for exactly that reason; ADVICE r5).
EXPECTATIONS: dict[str, dict] = {
    "select_project_filter": {
        "must": ["EqualTo(o_orderstatus,O)", "GreaterThan(o_totalprice",
                 "[codegen id :"],
        "must_not": ["Exchange"],  # pure scan+filter+project: no shuffle at all
    },
    "pricing_summary": {
        # AQE wraps exchange-bearing plans (AdaptiveSparkPlan) and hides
        # codegen ids until runtime re-planning; assert the agg + pushdown
        "must": ["PushedFilters: [IsNotNull(l_shipdate)", "HashAggregate"],
        "must_not": [],
    },
    "revenue_by_nation": {
        "must": ["BroadcastHashJoin", "HashAggregate"],
        "must_not": [],
    },
    "fk_broadcast_lookup": {
        "must": ["BroadcastHashJoin"],
        "must_not": ["SortMergeJoin"],
    },
    "rolling_avg_price": {
        "must": ["Window"],
        "must_not": [],
    },
    "latest_price_per_key": {
        "must": ["BroadcastHashJoin"],
        "must_not": [],
    },
    "minhash_lsh_candidates": {
        "must": ["HashAggregate", "Window"],
        "must_not": ["SortMergeJoin", "BroadcastNestedLoopJoin"],
    },
    "cosine_topk": {
        "must": ["BroadcastNestedLoopJoin"],  # deliberate: k queries × corpus scan
        "must_not": ["SortMergeJoin"],
    },
    "ann_lsh_topk": {
        # the scale path's candidate join is the bucket-keyed
        # BroadcastHashJoin; the BNLJ-Cross nodes are the r12 adaptive-
        # geometry 1-row plane-count scalar attaches (benign — build
        # side is a single-row aggregate), so the old blanket BNLJ ban
        # is replaced by the real invariant: the bucket hash join must
        # exist, and no shuffle-partitioned sort-merge join sneaks in
        "must": ["BroadcastHashJoin"],
        "must_not": ["SortMergeJoin"],
    },
    "ann_sq8_topk": {
        # quantizer stats = one HashAggregate broadcast; scoring is the
        # deliberate k-queries × corpus broadcast NL scan (the IVF probe
        # composes on top to bound candidates); never a repartition join
        "must": ["BroadcastNestedLoopJoin", "HashAggregate"],
        "must_not": ["SortMergeJoin", "CartesianProduct"],
    },
    "embedding_near_dup": {
        # near-dup candidates come from an equality join on the LSH
        # bucket (hash-partitionable), never all-pairs / driver collect
        "must": ["Join", "lsh_bucket"],
        "must_not": ["BroadcastNestedLoopJoin", "CartesianProduct"],
    },
    "tumbling_hourly": {
        "must": ["HashAggregate"],
        "must_not": ["SortMergeJoin"],
    },
    "tpch_q9_profit_by_nation": {
        # deep star join over part-filtered lineitem: dims broadcast,
        # filters pushed; never a cartesian/NL expansion
        "must": ["BroadcastHashJoin", "HashAggregate", "PushedFilters"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    },
    "exact_dedup_groups": {
        # content digests computed in codegen (JVM md5/sha, never a
        # Python worker); the shuffle carries 16-byte digests only
        "must": ["HashAggregate"],
        "must_not": ["BatchEvalPython", "ArrowEvalPython", "SortMergeJoin"],
    },
    "near_dup_jaccard": {
        # shingle explode + banded-bucket candidate join: the pair
        # stream is bucketed (equi-join — SMJ/BHJ both fine), never
        # all-pairs, and shingling stays JVM-side
        "must": ["Generate", "HashAggregate"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
    },
    "pack_token_batches": {
        # greedy sequence packing = running-sum window + bucket agg,
        # all codegen — no Python, no join
        "must": ["Window", "HashAggregate"],
        "must_not": ["BatchEvalPython", "ArrowEvalPython",
                     "SortMergeJoin", "BroadcastHashJoin"],
    },
    "top_unshipped_revenue": {
        # bounded top-k: TakeOrderedAndProject, never a global Sort;
        # the filtered customer dim broadcasts
        "must": ["TakeOrderedAndProject", "BroadcastHashJoin"],
        "must_not": ["BroadcastNestedLoopJoin"],
    },
    "priority_count_late": {
        # EXISTS decorrelated to a semi join (non-equi residual rides
        # the equi-key hash join, not a nested loop)
        "must": ["LeftSemi"],
        "must_not": ["BroadcastNestedLoopJoin"],
    },
    "grouping_sets_qty": {
        "must": ["Expand", "HashAggregate"],  # one scan, Expand per set
        "must_not": ["Union"],                # never one scan per set
    },
    "unpivot_flag_metrics": {
        "must": ["Expand"],                   # unpivot = Expand, not N scans
        "must_not": ["Union"],
    },
    "rank_analytics": {
        # five ranking fns share ONE window spec → one Window operator
        "must": ["Window"],
        "must_not": ["SortMergeJoin"],
    },
    "forward_fill_prices": {
        "must": ["Window"],
        "must_not": ["SortMergeJoin"],
    },
    "train_test_split_counts": {
        # pure per-row hash split + agg: no window, no join anywhere
        "must": ["HashAggregate"],
        "must_not": ["Window", "SortMergeJoin", "BroadcastHashJoin"],
    },
    "jarque_bera_order_value": {
        # one map-side-combined exact-DECIMAL power-sum pass, then
        # scalar arithmetic on a one-row frame — no joins, no windows
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin", "Window",
                     "BroadcastNestedLoopJoin"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "chow_break_daily_revenue": {
        # day collapse first; the index window rides the calendar-
        # bounded daily frame (bounded-window tag); regime OLS moments
        # in one keyed aggregate; the 1-row pooled/split combine is
        # the deliberate scalar crossJoin (linter WARN tier)
        "must": ["HashAggregate", "Window"],
        "must_not": ["CartesianProduct", "SortMergeJoin"],
        "no_global_sort": True,
    },
    "gumbel_weekly_max_revenue": {
        # daily collapse -> weekly max -> one-row moment frame: keyed
        # aggregates only, no windows, no joins beyond the scalar
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin", "Window",
                     "BroadcastNestedLoopJoin"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "var_cvar_daily_revenue": {
        # daily collapse; lag over the calendar-bounded daily frame;
        # the exact quantile is grouped_exact_percentiles' range-
        # partitioned order statistics (no holistic percentile); the
        # VaR scalar broadcasts into the tail mean
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin"],
        "no_global_sort": True,
    },
    "price_percentiles": {
        # distributed order statistics: the range shuffle happens
        # BEFORE a localCheckpoint (pinning the sampled boundaries —
        # operators/percentiles.py round-5 fix), so the visible plan
        # starts at the materialized RDD; downstream is the broadcast
        # boundary filter, never a holistic sort-all-into-one-task
        # (structural guards — the r5 "Sort [" substring could never
        # match formatted output; ADVICE r5)
        "must": ["Scan ExistingRDD", "BroadcastHashJoin"],
        "must_not": [],
        "no_global_sort": True,
        "no_global_window": True,
    },
    "forecast_revenue_change": {
        # Q6: every predicate pushed to the scan, 3-column ReadSchema
        "must": ["PushedFilters: [IsNotNull", "GreaterThanOrEqual(l_shipdate",
                 "HashAggregate"],
        "must_not": ["Window", "SortMergeJoin"],
    },
    "top_returning_customers": {
        "must": ["TakeOrderedAndProject", "BroadcastHashJoin",
                 "EqualTo(l_returnflag,R)"],
        "must_not": ["BroadcastNestedLoopJoin"],
    },
    "trailing_30d_revenue": {
        "must": ["Window"],
        "must_not": ["SortMergeJoin"],
    },
    "clean_corpus_stats": {
        # dedup window + quality filters + agg fuse into one pass
        "must": ["Window", "HashAggregate"],
        "must_not": ["SortMergeJoin", "BroadcastNestedLoopJoin"],
    },
    "revenue_share_by_nation": {
        # the global ratio window sits over the aggregate, and the
        # dimension side broadcasts
        "must": ["Window", "BroadcastHashJoin"],
        "must_not": [],
    },
    "spline_seasonal_features": {
        # pure codegen piecewise polynomials + one aggregation:
        # no window, no join, no Python anywhere
        "must": ["HashAggregate"],
        "must_not": ["Window", "SortMergeJoin", "BroadcastHashJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
    },
    "nystroem_features": {
        # kernel features are a narrow map (landmark literals folded
        # into the plan); one aggregation, JVM-side only
        "must": ["HashAggregate"],
        "must_not": ["Window", "SortMergeJoin", "BroadcastHashJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
    },
    "tpch_q8_market_share": {
        # deepest star join: every dimension side must broadcast; the
        # only shuffle joins are fact⋈fact
        "must": ["BroadcastHashJoin", "PushedFilters"],
        "must_not": ["BroadcastNestedLoopJoin", "CartesianProduct"],
    },
    "tpch_q15_top_supplier": {
        # the max scalar subquery rides a broadcast join over the
        # 100-row revenue view — never a global sort or NL join over
        # the fact table
        "must": ["BroadcastHashJoin"],
        "must_not": ["CartesianProduct", "GlobalLimit"],
    },
    "tpch_q18_large_orders": {
        # HAVING semi-join reuses the aggregate; bounded top-k must be
        # TakeOrderedAndProject, not Sort+Limit over all matches
        "must": ["TakeOrderedAndProject", "HashAggregate"],
        "must_not": ["BroadcastNestedLoopJoin"],
    },
    "tpch_q21_waiting_supplier": {
        # EXISTS/NOT-EXISTS decorrelated into per-order window flags:
        # lineitem scanned once, one orderkey shuffle, no join-back
        # (the aggregate-then-rejoin form scans the fact table twice)
        "must": ["BroadcastHashJoin", "Window", "HashAggregate"],
        "must_not": ["BroadcastNestedLoopJoin", "CartesianProduct",
                     "SortMergeJoin"],
    },
    "benchmark_decontamination": {
        # the benchmark span set is explicitly broadcast; the corpus
        # span stream must never shuffle through a cartesian/NL join
        "must": ["BroadcastHashJoin", "Generate"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
    },
    "vocab_oov_rate": {
        # K-row vocab broadcast onto the token stream; explode +
        # aggregates stay JVM-side
        "must": ["BroadcastHashJoin", "Generate", "HashAggregate"],
        "must_not": ["CartesianProduct", "BatchEvalPython",
                     "ArrowEvalPython"],
    },
    "gopher_repetition_filter": {
        # pure explode + two keyed aggregates: no join at all, no Python
        "must": ["Generate", "HashAggregate"],
        "must_not": ["Join", "BatchEvalPython", "ArrowEvalPython"],
    },
    "bm25_topk": {
        # filtered explode feeds the persisted tf frame (reused by the
        # df aggregation and the scoring join); document frequencies
        # broadcast; ranking is bounded top-k. The one-row corpus-stats
        # cross join is a deliberate 1-row broadcast NL join.
        "must": ["TakeOrderedAndProject", "BroadcastHashJoin", "Generate",
                 "InMemoryTableScan"],
        "must_not": ["SortMergeJoin", "CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
    },
    "kmeans_lloyd_step": {
        # assignment is a narrow map against centroid literals fused
        # into the scan; ONE aggregation, no join/window/Python at all
        "must": ["HashAggregate"],
        "must_not": ["Join", "Window", "Generate",
                     "BatchEvalPython", "ArrowEvalPython"],
    },
    "crossdoc_span_dup_share": {
        # span stream + distinct-doc counts + join-back: keyed hash
        # shuffles only — never cartesian/NL, never Python
        "must": ["Generate", "HashAggregate"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
    },
    "local_clustering_coefficient": {
        # oriented wedge join + per-corner explode + node-keyed count,
        # joined onto the degree frame; one rounded division. (The one
        # nested loop is the 1-row scalar threshold broadcast — the
        # registry-tagged bounded pattern shared by the whole
        # co-supply family.)
        "must": ["HashAggregate", "Generate"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "common_neighbor_link_prediction": {
        # wedge self-join + map-side pair count + anti-join existing
        # edges + broadcast degree joins; top-k via TakeOrdered, never
        # a global sort. (Scalar-threshold broadcast NL as above.)
        "must": ["HashAggregate", "TakeOrderedAndProject"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
    },
    "heaps_law_fit": {
        # the corpus-collapsing explode+aggregations run INSIDE the
        # eager ordered_scan (localCheckpoint), so the pinned plan is
        # the post-scan shape: stride scalar + checkpoint filter +
        # bivariate aggregates
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "dedup_method_agreement": {
        # two registered bounded candidate pipelines + one pair-keyed
        # equi-join intersection + scalar rollups
        "must": ["HashAggregate", "Generate"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "bh_fdr_supplier_rates": {
        # per-supplier integer (n, x), scalar pooled-rate broadcast,
        # shared closed-form normal tail, global p ranking via
        # ordered_scan — no single-partition window over suppliers
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "isotonic_calibration_bins": {
        # one ordered_scan ntile over the fact table, then everything
        # on the 100-row binned frame (sequence-explode grid,
        # equi-joins, j-partitioned + bounded-prefix windows,
        # registry-tagged bounded-window)
        "must": ["HashAggregate", "Generate", "Window"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "unicode_nfc_audit": {
        # one Arrow mapInPandas over (id, source, 8-char prefix) +
        # tiny source rollup
        "must": ["MapInPandas", "HashAggregate"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "Window", "SortMergeJoin", "BatchEvalPython"],
        "no_global_sort": True,
    },
    "item_item_cosine_topk": {
        # basket dedup + co-partitioned self-join + broadcast item
        # counts + TakeOrdered on the integer-exact scaled cosine^2
        "must": ["HashAggregate", "TakeOrderedAndProject",
                 "BroadcastHashJoin"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "Window", "BatchEvalPython", "ArrowEvalPython"],
    },
    "zorder_locality_audit": {
        # all-integer Morton arithmetic in codegen; the two file
        # assignments ride global_ntile's ordered_scan (no
        # single-partition window/sort); envelopes are map-side
        # min/max on the file key
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
    },
    "media_pcx_pixel_stats": {
        # one Arrow kernel over the scan; payload bytes never shuffle
        "must": ["MapInPandas"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BroadcastNestedLoopJoin", "BroadcastHashJoin",
                     "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "media_tga_pixel_stats": {
        # one Arrow kernel over the scan; payload bytes never shuffle
        "must": ["MapInPandas"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BroadcastNestedLoopJoin", "BroadcastHashJoin",
                     "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "ann_radius_search": {
        # multiprobe fan-out explodes the broadcast query side only;
        # candidates equi-join on the bucket key; the tau filter is a
        # plain codegen Filter — no window, no rank, no all-pairs
        "must": ["Generate", "BroadcastHashJoin"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "SortMergeJoin"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "ann_radius_recall_eval": {
        # caught side = the multiprobe bucket equi-join; the truth
        # side's query×corpus scan is the deliberate broadcast NL join
        # (same as cosine_topk / ann_recall_eval)
        "must": ["BroadcastHashJoin", "HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "ann_filtered_topk": {
        # the metadata filter IS the join key (pre-filter strategy):
        # candidates equi-join on label with the query side broadcast;
        # bounded per-query rank window
        "must": ["BroadcastHashJoin"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "SortMergeJoin"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "ann_postfilter_recall_eval": {
        # truth = ann_filtered_topk (label equi-join); prefetch = the
        # multiprobe bucket equi-join; intersections are tiny keyed
        # joins. (The one nested loop is the deliberate 1-row n_post
        # scalar crossJoin — linter WARN tier.)
        "must": ["Generate", "BroadcastHashJoin", "HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "ann_multiprobe_topk": {
        # 9-element probe explode on the tiny query side only; the
        # candidate side joins on the bucket key; bounded per-query
        # rank window
        "must": ["Generate", "BroadcastHashJoin"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "ann_multiprobe_recall_eval": {
        # three candidate pipelines (exact / single / multiprobe) over
        # one persisted bucket frame; integer hit counts, two rounded
        # divisions; the nested loop is the brute-force truth's tiny
        # query broadcast
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "luhn_pii_audit": {
        # generator + detector are single codegen HOF expressions over
        # the digit string — pure per-row arithmetic, no joins, no
        # Python
        "must": ["Project"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "SortMergeJoin", "Window", "HashAggregate",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "holt_winters_weekly_backtest": {
        # same contract as holt_forecast_backtest: daily collapse,
        # then one Arrow grouped-map carrying the (l, b, s[7]) state
        "must": ["HashAggregate", "FlatMapGroupsInPandas"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython"],
        "no_global_sort": True,
    },
    "holt_forecast_backtest": {
        # fact table collapses to the calendar-bounded daily frame,
        # then ONE Arrow grouped-map carries the sequential recurrence
        # (bounded by construction: TPC-H dates span ~2,500 days at
        # every SF); no row-at-a-time Python
        "must": ["HashAggregate", "FlatMapGroupsInPandas"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython"],
        "no_global_sort": True,
    },
    "wilson_lower_bound_ranking": {
        # one map-side groupBy + closed-form bound expression +
        # TakeOrdered top-k
        "must": ["HashAggregate", "TakeOrderedAndProject"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "SortMergeJoin", "Window",
                     "BatchEvalPython", "ArrowEvalPython"],
    },
    "eb_shrunk_return_rates": {
        # per-supplier groupBy + exact decimal prior moments (1-row
        # scalar broadcast) + per-row closed form; the nested loop is
        # the 1-row prior broadcast
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin", "Window",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "ngram_novelty_rate": {
        # gram digest stream + digest-keyed argmin + join-back + tiny
        # source rollup; keyed hash shuffles only
        "must": ["Generate", "HashAggregate"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython", "Window"],
        "no_global_sort": True,
    },
    "substring_dup_spans": {
        # gram digest stream (posexplode) + digest-keyed count +
        # join-back, then a doc-bounded islands window; keyed hash
        # shuffles only
        "must": ["Generate", "HashAggregate", "Window"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "exact_substring_dedup": {
        # gram digest stream + (count, first-occurrence) agg +
        # join-back, doc-bounded coverage-merge windows, doc-keyed
        # anti-join token rebuild; keyed hash shuffles only
        "must": ["Generate", "HashAggregate", "Window"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "source_quota_cap": {
        # one window shuffle keyed by source; the rollup groups on the
        # same key — no join anywhere
        "must": ["Window", "HashAggregate"],
        "must_not": ["Join", "Generate"],
    },
    "source_mixture_sample": {
        # per-source rate table broadcast back onto the stream; the
        # sampling coin is a per-row expression (no shuffle, no window)
        "must": ["BroadcastHashJoin", "HashAggregate"],
        "must_not": ["SortMergeJoin", "Window"],
    },
    "ewma_anomaly_flags": {
        # all lags + the trailing frame share ONE (user, time) window
        # sort; no join in the plan
        "must": ["Window"],
        "must_not": ["Join", "Generate"],
    },
    "table_profile_checks": {
        # six metrics in one conditional aggregate + broadcast anti-join
        # for FK orphans; checks unpivot from the single aggregate row
        "must": ["HashAggregate", "LeftAnti", "Union"],
        "must_not": ["SortMergeJoin"],
    },
    "ohlc_downsample": {
        # one window sort keyed by (user, bucket); the rollup groups on
        # the window's own partition keys — no join anywhere
        "must": ["Window", "HashAggregate"],
        "must_not": ["Join", "Generate"],
    },
    "scd2_order_intervals": {
        # pure lead() over one keyed sort — no join, no self-merge
        "must": ["Window"],
        "must_not": ["Join", "HashAggregate"],
    },
    "rolling_corr_price_qty": {
        # corr as a window aggregate in a single supplier-time sort
        "must": ["Window"],
        "must_not": ["Join"],
    },
    "incremental_ingest_dedup": {
        # fingerprint semi-join + span-overlap join: keyed hash
        # shuffles only, never cartesian/NL, no Python
        "must": ["Generate", "HashAggregate", "LeftSemi"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
    },
    "unigram_logprob_score": {
        # the unigram LM table broadcasts onto the token stream; the
        # 1-row total rides a broadcast NL join (scalar — fine)
        "must": ["BroadcastHashJoin", "Generate", "HashAggregate"],
        "must_not": ["SortMergeJoin", "CartesianProduct"],
    },
    "pagerank_trade_graph": {
        # rank joins are keyed hash joins; the 1-row node count rides a
        # broadcast; no NL join over edges, no Python
        "must": ["HashAggregate", "BroadcastHashJoin"],
        "must_not": ["CartesianProduct", "BatchEvalPython",
                     "ArrowEvalPython"],
    },
    "cohort_retention": {
        # the user-cardinality firsts frame and cohort sizes broadcast
        # back onto the stream; never a shuffled fact⋈fact join
        "must": ["BroadcastHashJoin", "HashAggregate"],
        "must_not": ["SortMergeJoin", "CartesianProduct"],
    },
    "equidepth_histogram": {
        # boundaries via range-partitioned order statistics (no
        # holistic single-task sort; the range exchange sits behind
        # the boundary-pinning localCheckpoint — Scan ExistingRDD),
        # broadcast onto the scan. (The percentile operator's internal
        # rank-offset join may plan as SMJ on tiny frames — not
        # asserted against.)
        "must": ["Scan ExistingRDD", "BroadcastHashJoin", "HashAggregate"],
        "must_not": ["CartesianProduct"],
    },
    "mom_revenue_growth": {
        # the lag window runs over the monthly aggregate (~84 rows),
        # never the fact table
        "must": ["Window", "HashAggregate"],
        "must_not": ["Join"],
    },
    "media_content_dedup": {
        # digest-grouped dedup: binary payload pruned before the
        # exchange, no join anywhere
        "must": ["HashAggregate"],
        "must_not": ["Join", "Generate"],
    },
    "salted_token_vocabulary": {
        # two-stage sharded collect: (key, salt) partial then final
        # merge — aggregates only, no join
        "must": ["Generate", "HashAggregate"],
        "must_not": ["Join"],
    },
    "vocab_coverage_curve": {
        # rank/cumsum/total in ONE ordered_scan pass over the
        # vocabulary aggregate (the explode + groupBy live inside the
        # checkpoint job, so the visible plan starts at the RDD scan)
        "must": ["Scan ExistingRDD", "Window", "BroadcastHashJoin"],
        "must_not": ["SortMergeJoin", "CartesianProduct", "Generate"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "token_pmi_pairs": {
        # vocab membership + denominators broadcast; the within-doc
        # pair join is an equality join on doc_id, never cartesian
        "must": ["BroadcastHashJoin", "HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin"],
    },
    "ann_recall_eval": {
        # both search paths broadcast the query side; the recall
        # intersection is a tiny keyed join — never cartesian. (The
        # exact side's query×corpus scan is a deliberate broadcast NL
        # join, same as cosine_topk.)
        "must": ["BroadcastHashJoin", "HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin"],
    },
    "per_supplier_ols_slopes": {
        # the grouped-map Arrow UDF: one FlatMapGroupsInPandas over the
        # supplier hash partitioning, nothing else
        "must": ["FlatMapGroupsInPandas"],
        "must_not": ["Window", "Join", "BatchEvalPython"],
    },
    "hll_mergeable_rollup": {
        # per-month sketches + union-merged total: aggregates and a
        # 2-branch union; the 1-row merge rides broadcast NL (fine)
        "must": ["HashAggregate", "Union"],
        "must_not": ["Window", "SortMergeJoin"],
    },
    "corr_matrix_lineitem": {
        # six corr accumulators share ONE scan (no Union-of-scans —
        # the unpivot is an explode over the single aggregate row)
        "must": ["HashAggregate", "Generate"],
        "must_not": ["Union", "Join", "Window"],
    },
    "tpch_q2_min_cost_supplier": {
        # decorrelated min-cost subquery + all dims broadcast + bounded
        # top-100 — never a global sort or a shuffled dim join
        "must": ["BroadcastHashJoin", "TakeOrderedAndProject"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    },
    "tpch_q20_excess_shippers": {
        # both nested INs decorrelate to (broadcast) semi joins
        "must": ["BroadcastHashJoin", "HashAggregate"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    },
    "weighted_sample_stats": {
        # per-row hash predicate evaluated at the scan: no join, the
        # only exchange is the final tiny group-by
        "must": ["HashAggregate"],
        "must_not": ["Join", "Window"],
    },
    "fuzzy_code_match_blocked": {
        # the whole point of the blocked variant: candidate generation
        # is a broadcast HASH join on the gram key + count-filter
        # aggregation — no nested-loop / cartesian anywhere in the plan
        "must": ["BroadcastHashJoin", "HashAggregate", "Generate"],
        "must_not": ["BroadcastNestedLoopJoin", "CartesianProduct"],
    },
    "media_ppm_pixel_features": {
        # real-codec decode is one Arrow-batched mapInPandas over the
        # scan; the feature agg is a plain hash aggregate — no join,
        # no row-at-a-time Python
        "must": ["MapInPandas", "HashAggregate"],
        "must_not": ["Join", "BatchEvalPython"],
    },
    "media_y4m_frames": {
        # container assembly is JVM concat; the demux is one Arrow
        # kernel emitting frame rows — no shuffle, no join
        "must": ["MapInPandas"],
        "must_not": ["Join", "Exchange", "BatchEvalPython"],
    },
    "media_wav_audio_stats": {
        # two Arrow kernels (WAV wrap + decode) back-to-back on the
        # same pass — still no shuffle, no join
        "must": ["MapInPandas"],
        "must_not": ["Join", "Exchange", "BatchEvalPython"],
    },
    "media_h264_intra_decode": {
        # the CAVLC codec round-trip is one Arrow kernel over a
        # pushdown-filtered projection (doc_id % 7 sampling reaches
        # the scan); the one Exchange is the deliberate two-int
        # repartition that spreads codec work across cores (payload
        # is synthesized inside the kernel, so nothing heavy
        # shuffles); no join, no row-at-a-time Python
        "must": ["MapInPandas", "Exchange"],
        "must_not": ["Join", "BatchEvalPython"],
    },
    "media_flac_audio_stats": {
        # FLAC encode + decode are two chained Arrow kernels over the
        # repartitioned two-column projection; no join, no
        # row-at-a-time Python
        "must": ["MapInPandas", "Exchange"],
        "must_not": ["Join", "BatchEvalPython"],
    },
    "media_h264_gop_decode": {
        # same shape as the intra twin: one Arrow kernel over the
        # doc_id % 23 sampled two-int projection (repartitioned for
        # codec parallelism), metadata-only output
        "must": ["MapInPandas", "Exchange"],
        "must_not": ["Join", "BatchEvalPython"],
    },
    "media_h264_bframe_decode": {
        # bi-predictive certification: same Arrow-kernel shape over
        # the doc_id % 29 sample; codec cost lives in the kernel,
        # never in a shuffle
        "must": ["MapInPandas", "Exchange"],
        "must_not": ["Join", "BatchEvalPython"],
    },
    "tfidf_top_terms": {
        # codegen'd explode (Generate), bounded top-k; the corpus-size
        # scalar rides a 1-row broadcast NL join (the right plan for a
        # scalar — not asserted against)
        "must": ["Generate", "TakeOrderedAndProject"],
        "must_not": ["SortMergeJoin"],
    },
    "semantic_dedup_clusters": {
        # centroid assignment is a literal-folded narrow map (no
        # broadcast of the codebook); the pairwise compare joins ON
        # CLUSTER (equi-join — never cartesian); the count join-back
        # broadcasts the k-row drops side
        "must": ["BroadcastHashJoin", "HashAggregate"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
    },
    "bpe_top_merges": {
        # corpus → word table (one agg), codegen pair explode, second
        # agg, bounded top-k; no join, no Python
        "must": ["Generate", "HashAggregate", "TakeOrderedAndProject"],
        "must_not": ["Join", "BatchEvalPython", "ArrowEvalPython"],
    },
    "concurrent_events_peak": {
        # sweep-line: union + ONE keyed window sort + one aggregate —
        # asserts the O(n^2) interval self-join never sneaks in
        "must": ["Union", "Window", "HashAggregate"],
        "must_not": ["Join", "Generate"],
    },
    "pca2_price_qty": {
        # pass 1 collapses to one 5-moment aggregate row; the
        # projection pass rides a deliberate 1-row broadcast NL join
        # (the right plan for scalar constants)
        "must": ["HashAggregate", "BroadcastNestedLoopJoin"],
        "must_not": ["SortMergeJoin", "Window",
                     "BatchEvalPython", "ArrowEvalPython"],
    },
    "random_projection_features": {
        # projection matrix folds into literals: narrow map + one
        # aggregate, nothing else in the plan
        "must": ["HashAggregate"],
        "must_not": ["Join", "Window", "Generate",
                     "BatchEvalPython", "ArrowEvalPython"],
    },
    "heavy_hitters_exact": {
        # pass-1 Misra-Gries candidates via MapInPandas (bounded,
        # per-partition); candidates broadcast into a semi-join before
        # the exact recount — the full-cardinality groupBy never runs
        "must": ["MapInPandas", "BroadcastHashJoin", "HashAggregate"],
        "must_not": ["SortMergeJoin"],
    },
    "per_group_hash_sample": {
        # rank-limit pushes into the shuffle (WindowGroupLimit): each
        # group ships only its top-k candidates, not the whole group
        "must": ["WindowGroupLimit", "Window", "HashAggregate"],
        "must_not": ["Join", "Generate"],
    },
    "linear_interpolate_prices": {
        # both anchor directions from ONE window sort: exactly one
        # exchange and one sort in the whole plan
        "must": ["Window"],
        "must_not": ["Join", "Generate", "BatchEvalPython",
                     "ArrowEvalPython"],
    },
    "asof_nearest_order": {
        # nearest = backward + forward frames over a single union sort
        # — same one-shuffle shape as the backward as-of; the oracle's
        # brute candidate join must never appear
        "must": ["Union", "Window"],
        "must_not": ["Join", "Generate", "BatchEvalPython",
                     "ArrowEvalPython"],
    },
    "bigram_logprob_score": {
        # pair stream via codegen transform+explode (Generate), model
        # tables broadcast back; the vocab scalar rides a 1-row
        # broadcast NL join — no SMJ, no Python anywhere
        "must": ["Generate", "BroadcastHashJoin", "HashAggregate"],
        "must_not": ["SortMergeJoin", "Window",
                     "BatchEvalPython", "ArrowEvalPython"],
    },
    "kneser_ney_trigram_score": {
        # trigram stream via codegen transform+explode; every model
        # table (type/context counts) broadcast back; the bigram-type
        # scalar rides a 1-row broadcast NL join — no SMJ, no Python
        "must": ["Generate", "BroadcastHashJoin", "HashAggregate"],
        "must_not": ["SortMergeJoin", "Window",
                     "BatchEvalPython", "ArrowEvalPython"],
    },
    "hybrid_rrf_topk": {
        # both rankings are depth-bounded TakeOrdered + WindowGroupLimit
        # results; the fusion joins k-row frames (its SMJ is over ~100
        # rows — not asserted against), and the corpus-side joins stay
        # broadcast
        "must": ["TakeOrderedAndProject", "WindowGroupLimit",
                 "BroadcastHashJoin"],
        "must_not": ["CartesianProduct", "BatchEvalPython",
                     "ArrowEvalPython"],
    },
    "attribution_last_touch": {
        # as-of composition: union + ONE (user, time) window sort; the
        # oracle's candidate join + row_number never appears
        "must": ["Union", "Window", "HashAggregate"],
        "must_not": ["Join", "Generate", "BatchEvalPython",
                     "ArrowEvalPython"],
    },
    "quality_classifier_filter": {
        # featurize + sigmoid fused into the scan: one aggregate, no
        # join, no window, no Python
        "must": ["HashAggregate"],
        "must_not": ["Join", "Window", "Generate",
                     "BatchEvalPython", "ArrowEvalPython"],
    },
    "k_anonymity_audit": {
        # two chained aggregates (QI groups, then scalar audit row) —
        # nothing else
        "must": ["HashAggregate"],
        "must_not": ["Join", "Window", "Generate"],
    },
    "event_transition_matrix": {
        # one lead() window on the (user, time) sort; the row-normalize
        # join is over the |types|^2 matrix and broadcasts
        "must": ["Window", "BroadcastHashJoin", "HashAggregate"],
        "must_not": ["SortMergeJoin", "Generate",
                     "BatchEvalPython", "ArrowEvalPython"],
    },
    "ann_pq_topk": {
        # corpus codes from literal-folded argmins; the 3-row query LUT
        # broadcasts into the theta join (deliberate broadcast NL — the
        # cosine_topk shape); rank bound pushes into the shuffle
        "must": ["BroadcastExchange", "WindowGroupLimit"],
        "must_not": ["SortMergeJoin", "CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
    },
    "ann_ivfpq_topk": {
        # candidate generation joins the CODE table on the probed list
        # id (BroadcastHashJoin — never the NL corpus scan of plain PQ
        # beyond the tiny query-x-centroid probe); rank bounds push down
        "must": ["BroadcastHashJoin", "WindowGroupLimit"],
        "must_not": ["SortMergeJoin", "CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
    },
    "max_drawdown": {
        # running max + rollup on the window's own key: one sort
        "must": ["Window", "HashAggregate"],
        "must_not": ["Join", "Generate"],
    },
    "sma_crossover_backtest": {
        # five frame functions (2 SMAs, lead, signal lag, via 2 window
        # levels) over ONE (ticker, time) sort; no join anywhere
        "must": ["Window", "HashAggregate"],
        "must_not": ["Join", "Generate"],
    },
    "zipf_slope_fit": {
        # vocab agg → bounded TakeOrdered(200) → rank window + bivariate
        # agg over 200 rows; no join
        "must": ["TakeOrderedAndProject", "HashAggregate"],
        "must_not": ["Join", "BatchEvalPython", "ArrowEvalPython"],
    },
    "doc_top_keyword": {
        # df table broadcast onto the (doc, term) matrix; rank-1 cut
        # pushes into the shuffle (WindowGroupLimit)
        "must": ["BroadcastHashJoin", "WindowGroupLimit"],
        "must_not": ["SortMergeJoin", "CartesianProduct"],
    },
    "rfm_segments": {
        # user aggregate + three chained global_ntile passes (range-
        # partitioned rank + bucket formula — never a single-task
        # ntile); the 1-row 'now' is a deliberate broadcast NL join
        "must": ["Scan ExistingRDD", "Window", "BroadcastHashJoin",
                 "HashAggregate"],
        "must_not": ["SortMergeJoin", "Generate"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "realized_volatility": {
        # one lag window + keyed aggregate: single shuffle + sort
        "must": ["Window", "HashAggregate"],
        "must_not": ["Join", "Generate"],
    },
    "mad_outlier_flags": {
        # both order-statistics tables are checkpointed per-group-row
        # frames broadcast back onto the stream; without the lineage
        # truncation this plan exploded to 64 scans / 185 exchanges
        "must": ["BroadcastHashJoin", "HashAggregate"],
        "must_not": ["SortMergeJoin", "Generate",
                     "BatchEvalPython", "ArrowEvalPython"],
    },
    "bollinger_breakouts": {
        # sma/sd/row_number share ONE (ticker, time) window sort; the
        # breakout flags fold into a single keyed aggregate
        "must": ["Window", "HashAggregate"],
        "must_not": ["Join", "Generate"],
    },
    "atr_14": {
        "must": ["Window", "HashAggregate"],
        "must_not": ["Join", "Generate"],
    },
    "sharpe_sortino": {
        # one lag window + one keyed aggregate; downside branch is a
        # CASE in the same map-side partial, never a second pass
        "must": ["Window", "HashAggregate"],
        "must_not": ["Join", "Generate"],
    },
    "vwap_premium": {
        # pure one-pass keyed aggregate in exact integer cents
        "must": ["HashAggregate"],
        "must_not": ["Window", "Join", "Generate"],
    },
    "time_weighted_avg_price": {
        "must": ["Window", "HashAggregate"],
        "must_not": ["Join", "Generate"],
    },
    "cusum_changepoint": {
        # facts reduce to one row per day INSIDE the ordered_scan
        # checkpoint job (so no HashAggregate is visible here); rank +
        # running sum come from operators/rank.ordered_scan; the
        # argmax is bounded top-1, never a full output sort
        "must": ["Scan ExistingRDD", "Window", "BroadcastHashJoin",
                 "TakeOrderedAndProject"],
        "must_not": ["Generate", "SortMergeJoin", "CartesianProduct"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "dau_stickiness": {
        # each user-day EXPLODES into its 7 covered WAU days
        # (Generate), then a broadcast semi-join against the tiny day
        # spine and keyed count-distincts — the BNLJ range join is
        # gone (was O(|user_days| x |days|) predicate evals)
        "must": ["Generate", "BroadcastHashJoin", "HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BroadcastNestedLoopJoin"],
    },
    "activity_streaks": {
        # gaps-and-islands: one keyed window + two keyed aggregates —
        # no self-join adjacency probe
        "must": ["Window", "HashAggregate"],
        "must_not": ["Join", "Generate"],
    },
    "session_duration_percentiles": {
        "must": ["Window", "HashAggregate"],
        "must_not": ["Join", "Generate"],
    },
    "funnel_conversion_lag": {
        # keyed min-aggregates + keyed joins; the global percentile
        # position comes from operators/rank.ordered_scan — parallel
        # range shuffle, never a single-task window
        "must": ["Scan ExistingRDD", "BroadcastHashJoin", "Window",
                 "HashAggregate"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "event_entropy_per_user": {
        # both groupBys and the join share the user_id key — hash
        # joins/aggregates only, no window, no explode
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "Window", "Generate"],
    },
    "repeat_purchase_interval": {
        # gap percentiles via ordered_scan (checkpointed range shuffle
        # + driver-offset broadcast join)
        "must": ["Scan ExistingRDD", "Window", "BroadcastHashJoin",
                 "HashAggregate"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "basket_pair_lift": {
        # pair expansion is an equi-join on orderkey (hash, bounded by
        # basket size); item counts broadcast; the only NL join is the
        # deliberate 1-row order-total scalar
        "must": ["BroadcastHashJoin", "HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin"],
    },
    "abc_customer_classes": {
        # facts reduce to one integer row per customer BEFORE the
        # cumulative walk, which runs in operators/rank.ordered_scan
        # (range shuffle + _pid-local window + driver-offset broadcast
        # join); final aggregate is 3 rows
        "must": ["Scan ExistingRDD", "Window", "BroadcastHashJoin",
                 "HashAggregate"],
        "must_not": ["Generate", "SortMergeJoin", "CartesianProduct"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "pareto_front_parts": {
        # O(n log n) skyline sweep via ordered_scan running_max_prev
        # (checkpointed range shuffle + offset broadcast join) — never
        # the O(n^2) dominance self-join
        "must": ["Scan ExistingRDD", "Window", "BroadcastHashJoin"],
        "must_not": ["Generate", "SortMergeJoin", "CartesianProduct"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "gini_revenue_concentration": {
        # rank via operators/rank.ordered_scan: checkpointed range
        # shuffle (Scan ExistingRDD), _pid-partitioned local window,
        # driver-offset broadcast join — never a single-task rank
        "must": ["Scan ExistingRDD", "Window", "BroadcastHashJoin",
                 "HashAggregate"],
        "must_not": ["Generate", "SortMergeJoin", "CartesianProduct"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "poisson_bootstrap_ci": {
        # the B-replica expansion is a broadcast of B tiny seed rows
        # (deliberate BNLJ); weights are codegen md5 expressions —
        # never a Python worker
        "must": ["BroadcastNestedLoopJoin", "Window", "HashAggregate"],
        "must_not": ["CartesianProduct", "BatchEvalPython",
                     "ArrowEvalPython", "SortMergeJoin"],
    },
    "cms_frequency_estimates": {
        # counter build = posexplode + ONE groupBy; probes broadcast;
        # exact top-k is bounded TakeOrdered, never a full sort
        "must": ["Generate", "HashAggregate", "BroadcastHashJoin",
                 "TakeOrderedAndProject"],
        "must_not": ["CartesianProduct", "BatchEvalPython",
                     "ArrowEvalPython", "SortMergeJoin"],
    },
    "calendar_spine_fill": {
        # the spine explodes from ONE two-scalar row; the fill join is
        # keyed on day against the pre-aggregated daily frame
        "must": ["Generate", "BroadcastHashJoin", "HashAggregate"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "SortMergeJoin", "Window"],
    },
    "winsorized_price_stats": {
        # 3-row percentile-bound table broadcast back onto the stream
        # (ObjectHashAggregate = the holistic percentile buffers)
        "must": ["BroadcastHashJoin", "ObjectHashAggregate"],
        "must_not": ["SortMergeJoin", "Window", "Generate"],
    },
    "loo_target_encoding": {
        # 6-row (n, S) stats table broadcast; the encoding map never
        # shuffles row data
        "must": ["BroadcastHashJoin", "HashAggregate"],
        "must_not": ["SortMergeJoin", "Window", "Generate"],
    },
    "rolling_median_price": {
        # holistic median as a window aggregate in the ONE keyed sort
        "must": ["Window", "HashAggregate"],
        "must_not": ["Join", "Generate"],
    },
    "revenue_decile_profile": {
        # decile cut via global_ntile (range-partitioned rank); the
        # remaining global cumulative window runs over the 10-row
        # decile rollup — bounded by the ntile arity, tagged
        # bounded-window; the scalar total is the deliberate 1-row
        # broadcast
        "must": ["Scan ExistingRDD", "Window", "HashAggregate",
                 "BroadcastNestedLoopJoin"],
        "must_not": ["CartesianProduct", "SortMergeJoin"],
        "no_global_sort": True,
    },
    "approx_topk_contract": {
        # sketch = one ObjectHashAggregate buffer; exact side bounded
        # TakeOrdered; verdict joins broadcast k-row frames
        "must": ["ObjectHashAggregate", "TakeOrderedAndProject",
                 "BroadcastHashJoin"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
    },
    "sessions_to_convert": {
        "must": ["Window", "HashAggregate"],
        "must_not": ["Join", "Generate"],
    },
    "weighted_median_price": {
        # ties collapse in a keyed aggregate BEFORE the window sort
        "must": ["Window", "HashAggregate"],
        "must_not": ["Join", "Generate"],
    },
    "ks_statistic_returned_vs_kept": {
        # both CDFs from one pass over the distinct-value frame; the
        # cumulative walk runs in operators/rank.ordered_scan, so the
        # visible plan starts at the checkpointed RDD (the returnflag
        # pushdown lives in the checkpoint's own job) and the only
        # join is the driver-offset broadcast
        "must": ["Scan ExistingRDD", "Window", "BroadcastHashJoin",
                 "HashAggregate"],
        "must_not": ["Generate", "SortMergeJoin", "CartesianProduct"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "binned_wasserstein_drift": {
        # same shape as binned_ks_drift: bucket map + bounded agg +
        # window over <=KS_BINS rows (scalars ride broadcast NL joins)
        "must": ["Window", "HashAggregate",
                 "PushedFilters: [In(l_returnflag"],
        "must_not": ["SortMergeJoin", "CartesianProduct", "Generate"],
    },
    "weighted_sample_topk": {
        # A-ES: codegen key map fused into the scan, ONE bounded
        # top-k — never a global Sort or an exchange-heavy join
        "must": ["TakeOrderedAndProject", "Window"],
        "must_not": ["Join", "Generate", "Exchange hashpartitioning"],
    },
    "psi_drift": {
        # binned PSI: narrow bucket map (1-row min/max scalar on a
        # broadcast NL join — fine), PSI_BINS-row agg, one final fold.
        # No window, no generate, no sort-merge join anywhere.
        "must": ["HashAggregate", "PushedFilters: [In(l_returnflag"],
        "must_not": ["SortMergeJoin", "CartesianProduct", "Generate",
                     "Window"],
    },
    "js_divergence_sources": {
        # one tokenize pass (Generate); global token counts derive
        # from the (source,tok) aggregate; per-source totals broadcast
        # (the 1-row corpus total rides a broadcast NL join — fine)
        "must": ["Generate", "BroadcastHashJoin", "HashAggregate"],
        "must_not": ["CartesianProduct"],
    },
    "kcore_cosupply": {
        # peel already ran (driver-controlled iteration); the final
        # frame is the core-membership semi-joins (broadcast — the
        # core is small by construction) over the symmetric edge
        # frame + one keyed degree count
        "must": ["BroadcastHashJoin", "HashAggregate"],
        "must_not": ["CartesianProduct"],
    },
    "ndcg_retrieval_eval": {
        # bm25_topk's filtered explode + broadcast model frames +
        # bounded TakeOrdered; both rank windows run over <= 10 rows
        "must": ["Generate", "BroadcastHashJoin", "TakeOrderedAndProject"],
        "must_not": ["SortMergeJoin", "CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
    },
    "degree_assortativity": {
        # one degree groupBy + two broadcast endpoint-degree joins +
        # exact decimal Pearson moments; no windows, no iteration
        "must": ["HashAggregate", "BroadcastHashJoin"],
        "must_not": ["Window", "CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "simhash_hamming_pairs": {
        # 4x band explode + capped band-bucket equi-join + codegen
        # xor/bit_count verify; fingerprints via explode+agg
        "must": ["HashAggregate", "BroadcastHashJoin"],
        "must_not": ["CartesianProduct", "Window",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "minhash_precision_eval": {
        # exact Jaccard only on the banded-LSH candidates (the
        # near_dup_jaccard explode-join shape) + one count aggregate;
        # the one Window is the bucket-cap row_number
        "must": ["Generate", "HashAggregate"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "lead_lag_xcorr": {
        # calendar-bounded daily frame, 15x broadcast lag fan-out on
        # exact date arithmetic; exact decimal Pearson moments
        "must": ["HashAggregate", "BroadcastHashJoin"],
        "must_not": ["Window", "CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "granger_causality_f": {
        # one lag window over the bounded daily frame, exact decimal
        # moments, one-row two-regression closed form
        "must": ["HashAggregate", "Window"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
    },
    "minhash_recall_eval": {
        # two bounded blocking pipelines (banded LSH + df-capped rare
        # shingles), exact Jaccard only on the blocked universe; the
        # one Window is the LSH BUCKET_CAP row_number, partitioned by
        # bucket (never global)
        "must": ["Generate", "HashAggregate"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "naive_forecast_backtest": {
        # calendar-bounded daily frame, 7x broadcast horizon fan-out
        # joined back on exact date arithmetic; exact decimal error
        # moments — no windows at all
        "must": ["HashAggregate", "BroadcastHashJoin"],
        "must_not": ["Window", "CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "ari_cell_vs_label": {
        # three contingency groupBys + one-row binomial sums; no pair
        # materialization (binomial identity), no windows
        "must": ["HashAggregate"],
        "must_not": ["Window", "SortMergeJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "cdc_chunk_dup_share": {
        # boundary selection + chunk slicing are one HOF codegen
        # expression per doc; only whole chunks explode; dup set is a
        # broadcast join back
        "must": ["Generate", "BroadcastHashJoin", "HashAggregate"],
        "must_not": ["CartesianProduct", "Window",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "mann_kendall_trend": {
        # calendar-bounded pair cross join (BHJ Cross under AQE) with
        # exact integer S; one-row closed-form z
        "must": ["HashAggregate", "Cross BuildRight"],
        "must_not": ["BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
    },
    "winnowing_candidate_pairs": {
        # gram-hash-select is ONE nested-HOF codegen expression per
        # doc (no raw-gram explode); only selected fingerprints join,
        # capped by the stop-gram filter
        "must": ["Generate", "HashAggregate"],
        "must_not": ["CartesianProduct", "Window",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "theil_sen_trend_daily_revenue": {
        # the all-pairs slope join is calendar-bounded (~2.4k days ->
        # ~2.9M pairs REGARDLESS of fact scale) and rides a broadcast
        # cross join by design (BHJ Cross under AQE); the median comes
        # from ordered_scan, so no single-partition window anywhere
        "must": ["HashAggregate", "Cross BuildRight"],
        "must_not": ["BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
    },
    "engle_granger_cointegration": {
        # one fact-dim join + daily rollup, lag over the bounded daily
        # frame, exact decimal moments, one-row closed-form solve
        "must": ["HashAggregate", "Window"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
    },
    "grid_dbscan_embeddings": {
        # 9x cell expansion (Generate) + one equi-join on cell ids;
        # components already ran (localCheckpointed); core/component
        # frames broadcast back onto the persisted pair frame
        "must": ["Generate", "BroadcastHashJoin", "HashAggregate"],
        "must_not": ["CartesianProduct", "Window",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "label_propagation_communities": {
        # propagation already ran (localCheckpointed rounds); the
        # final frame is one keyed community-size count over the
        # checkpointed label frame
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct", "Window",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "binned_ks_drift": {
        # the raw-fact-scale KS: narrow bucket map (the 1-row min/max
        # scalar rides a broadcast NL join — fine), KS_BINS-row agg,
        # window over <=KS_BINS rows; never a sort-merge join or a
        # window over the raw distinct-value domain
        "must": ["Window", "HashAggregate",
                 "PushedFilters: [In(l_returnflag"],
        "must_not": ["SortMergeJoin", "CartesianProduct", "Generate"],
    },
    "chi2_status_priority": {
        # marginals are windows over the 15-row cell frame
        "must": ["Window", "HashAggregate"],
        "must_not": ["Join", "Generate"],
    },
    "weekday_anomaly_days": {
        "must": ["Window", "HashAggregate"],
        "must_not": ["Join", "Generate"],
    },
    "iqr_outlier_fences": {
        # 3-row fence table broadcast (ObjectHashAggregate = the
        # holistic percentile buffers)
        "must": ["BroadcastHashJoin", "ObjectHashAggregate"],
        "must_not": ["SortMergeJoin", "Window", "Generate"],
    },
    "new_vs_returning_users": {
        "must": ["BroadcastHashJoin", "HashAggregate"],
        "must_not": ["SortMergeJoin", "Window", "Generate",
                     "BroadcastNestedLoopJoin"],
    },
    "spatial_neighbor_pairs": {
        # 3x3 cell expansion is Generate; the neighbor probe is an
        # EQUI-join on the cell id — never an all-pairs distance join
        "must": ["Generate", "BroadcastHashJoin", "HashAggregate"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "SortMergeJoin"],
    },
    "kmv_distinct_estimate": {
        # k smallest via bounded TakeOrdered; the exact-distinct side
        # rides the deliberate 1-row scalar broadcast
        "must": ["TakeOrderedAndProject", "HashAggregate",
                 "BroadcastNestedLoopJoin"],
        "must_not": ["CartesianProduct", "SortMergeJoin", "Window"],
    },
    "time_split_folds": {
        # raw-fact-scale ntile via global_ntile: range-partitioned
        # rank + bucket formula, never a single-task sort of orders
        "must": ["Scan ExistingRDD", "Window", "BroadcastHashJoin",
                 "HashAggregate"],
        "must_not": ["SortMergeJoin", "CartesianProduct", "Generate"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "curriculum_quartile_bins": {
        # corpus-scale ntile via global_ntile (token counting lives
        # inside the checkpoint job)
        "must": ["Scan ExistingRDD", "Window", "BroadcastHashJoin",
                 "HashAggregate"],
        "must_not": ["SortMergeJoin", "CartesianProduct"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "registry_bootstrap_ids": {
        # surrogate ids via positional_ids → ordered_scan: the offsets
        # come from the driver pass, so no window anywhere is global
        "must": ["Scan ExistingRDD", "Window", "BroadcastHashJoin"],
        "must_not": ["SortMergeJoin", "CartesianProduct", "Generate"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "mann_whitney_u_returned_vs_kept": {
        # same one-pass distinct-value CDF shape as the KS statistic
        # (ordered_scan: checkpointed range shuffle + offset broadcast)
        "must": ["Scan ExistingRDD", "Window", "BroadcastHashJoin",
                 "HashAggregate"],
        "must_not": ["Generate", "SortMergeJoin", "CartesianProduct"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "quality_roc_auc": {
        # integer-score AUC rides the Mann-Whitney machinery: distinct
        # scores → ordered_scan cumulative counts → scalar aggregate
        "must": ["Scan ExistingRDD", "Window", "BroadcastHashJoin",
                 "HashAggregate"],
        "must_not": ["Generate", "SortMergeJoin", "CartesianProduct"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "quality_calibration_bins": {
        # featurize+score fused into the scan; one hash aggregate onto
        # ≤10 bins — no joins, no windows, no sorts
        "must": ["HashAggregate", "ReadSchema"],
        "must_not": ["Join", "Window", "Generate"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "survival_km_curve": {
        # per-customer lead() windows (key-partitioned), then the KM
        # table rides a calendar-bounded frame: global cumulative
        # window is the acknowledged bounded-window tier; the max-date
        # and grand-total scalars are 1-row broadcasts
        "must": ["Window", "HashAggregate", "BroadcastNestedLoopJoin"],
        "must_not": ["SortMergeJoin", "CartesianProduct"],
    },
    "hits_trade_graph": {
        # per-round equi-joins + map-side-combined groupBys over the
        # persisted edge frame, each round localCheckpoint-ed (the
        # score frames are consumed twice per round — without the
        # truncation the lazy plan recomputes geometrically), so the
        # visible plan is the hubs/auth union over materialized RDDs
        "must": ["Scan ExistingRDD", "Union"],
        "must_not": ["Window", "CartesianProduct", "SortMergeJoin"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "conformal_interval_coverage": {
        # fold predicates fused into scans; fit + quantile + coverage
        # ride 1-row broadcasts and the ordered_scan range shuffle —
        # never a single-task sort over residuals
        "must": ["Scan ExistingRDD", "HashAggregate",
                 "BroadcastNestedLoopJoin"],
        "must_not": ["SortMergeJoin", "CartesianProduct"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "seasonal_decompose_weekday": {
        # daily integer frame + calendar-bounded centered window
        # (bounded-window tier) + two scalar aggregates
        "must": ["Window", "HashAggregate"],
        "must_not": ["SortMergeJoin", "Generate"],
    },
    "acf_ljung_box": {
        # lag() products over the calendar-bounded daily frame; one
        # aggregate row exploded into the 7 lag rows (Generate is the
        # unpivot, not a shingle blowup)
        "must": ["Window", "HashAggregate", "Generate"],
        "must_not": ["SortMergeJoin"],
    },
    "adf_unit_root_daily_revenue": {
        # lag() windows over the calendar-bounded daily frame, exact
        # DECIMAL(38,0) moment sums, one-row closed-form solve
        "must": ["Window", "HashAggregate"],
        "must_not": ["SortMergeJoin", "CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
    },
    "containment_near_superset": {
        # candidate-only explode-joins on shingle hashes, like
        # near_dup_jaccard: equi-joins only, nothing all-pairs
        "must": ["Generate", "HashAggregate"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
    },
    "mrl_truncation_recall": {
        # two broadcast-query corpus scans (cosine_topk shape) + a
        # bounded k-row overlap join
        "must": ["BroadcastNestedLoopJoin", "Window"],
        "must_not": ["CartesianProduct", "SortMergeJoin"],
    },
    "survival_logrank": {
        # KM-shaped: key-partitioned lead windows, calendar-bounded
        # cumulative frame (bounded-window tier), broadcast scalars,
        # one final aggregate
        "must": ["Window", "HashAggregate"],
        "must_not": ["SortMergeJoin", "CartesianProduct"],
    },
    "cuped_adjusted_ab": {
        # one per-user hash aggregate, 1-row broadcast of the pooled
        # power sums, per-variant aggregate — no windows, no sorts
        "must": ["HashAggregate", "BroadcastNestedLoopJoin"],
        "must_not": ["Window", "SortMergeJoin", "Generate"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "spearman_price_discount": {
        # rank tables from ordered_scan (range repartition + LOCAL
        # window); facts join the price ranks hash-partitioned, the
        # 11-row discount ranks broadcast; moments in one aggregate
        "must": ["HashAggregate", "BroadcastHashJoin"],
        "must_not": ["CartesianProduct"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "kendall_tau_qty_discount": {
        # O(cells^2) broadcast theta-join over the aggregated grid —
        # never a fact-side pair join; no windows or sorts anywhere
        "must": ["HashAggregate", "BroadcastNestedLoopJoin"],
        "must_not": ["Window", "SortMergeJoin", "CartesianProduct"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "bloom_filter_membership": {
        # k-position explode stays a Generate; the <=m-row bit set
        # broadcasts to the probe side; verdicts in one hash aggregate
        "must": ["Generate", "BroadcastHashJoin", "HashAggregate"],
        "must_not": ["Window", "CartesianProduct"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "cramers_v_segment_priority": {
        # broadcast dim join onto the fact scan, one cell groupBy,
        # broadcast marginals — no windows, no sorts, no NL joins
        "must": ["BroadcastHashJoin", "HashAggregate"],
        "must_not": ["CartesianProduct", "Window",
                     "BroadcastNestedLoopJoin"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "wilcoxon_signed_rank_price": {
        # per-part paired differences via a broadcast dim join + one
        # groupBy; |d| ranks from ordered_scan (range repartition);
        # the d↔rank equi-join runs over two pre-aggregated frames
        # (SMJ or hash both fine); 1-row tie-term broadcast only
        "must": ["HashAggregate", "BroadcastHashJoin"],
        "must_not": ["CartesianProduct"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "group_kfold_counts": {
        # fold = pure hash expression over the group key — no group
        # table, no join, one map-side-combined rollup
        "must": ["HashAggregate"],
        "must_not": ["Join", "Window", "Generate"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "kruskal_wallis_returnflag": {
        # distinct-value ranks from ordered_scan (range repartition +
        # LOCAL window), one fact join, per-group rank sums in one
        # aggregate; 1-row tie-term broadcast only
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "negative_sampling_unigram": {
        # inverse-CDF draw resolved by the bucketed interval join:
        # draws equi-join the bucket-exploded vocab intervals (hash
        # join); the only BNLJ is the 1-row total broadcast; the
        # Window is ordered_scan's LOCAL (range-partitioned) pass
        "must": ["BroadcastHashJoin", "Generate", "HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "chi2_token_selection": {
        # distinct (doc, token) presence + per-doc label join + ONE
        # contingency groupBy; 1-row label-total broadcast only
        "must": ["BroadcastHashJoin", "Generate", "HashAggregate"],
        "must_not": ["CartesianProduct", "Window", "SortMergeJoin"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "bfs_hops_trade_graph": {
        # frontier BFS: checkpointed frontier/visited frames, hash
        # joins on node ids only; final hop histogram is one aggregate
        "must": ["HashAggregate"],
        "must_not": ["Window", "CartesianProduct"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    # ---- round-8 WARC ingest tier: payloads built and consumed in
    # ONE Arrow kernel (MapInPandas), only counts/sums shuffle
    "warc_html_extraction": {
        "must": ["MapInPandas", "HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BroadcastNestedLoopJoin"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "warc_record_census": {
        "must": ["MapInPandas", "HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BroadcastNestedLoopJoin"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "ivf_gemm_assignment_census": {
        # large-k coarse assignment: ONE Arrow GEMM kernel, then a
        # combiner-friendly keyed aggregate — no join, no window
        "must": ["MapInPandas", "HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BroadcastNestedLoopJoin", "BroadcastHashJoin"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "url_canonical_dedup": {
        # codegen-only normalization; the two per-host aggregates meet
        # in a broadcast join (host cardinality is tiny at any SF)
        "must": ["BroadcastHashJoin", "HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BroadcastNestedLoopJoin", "MapInPandas",
                     "ArrowEvalPython", "BatchEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "dp_noisy_source_counts": {
        # one keyed aggregate + codegen noise arithmetic; no join
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BroadcastNestedLoopJoin", "BroadcastHashJoin",
                     "MapInPandas", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "dp_noisy_clamped_sum": {
        # clamp folds into the partial aggregate (map-side combine)
        "must": ["HashAggregate", "least"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BroadcastNestedLoopJoin", "BroadcastHashJoin",
                     "MapInPandas", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "media_tiff_pixel_stats": {
        # one Arrow kernel over the scan; payload bytes never shuffle
        "must": ["MapInPandas"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BroadcastNestedLoopJoin", "BroadcastHashJoin",
                     "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "media_qoi_pixel_stats": {
        # one Arrow kernel over the scan; payload bytes never shuffle
        "must": ["MapInPandas"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BroadcastNestedLoopJoin", "BroadcastHashJoin",
                     "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "media_png_pixel_stats": {
        # one Arrow kernel over the scan; payload bytes never shuffle
        "must": ["MapInPandas"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BroadcastNestedLoopJoin", "BroadcastHashJoin",
                     "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "media_g711_audio_stats": {
        # one Arrow kernel over the scan; payload bytes never shuffle
        "must": ["MapInPandas"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BroadcastNestedLoopJoin", "BroadcastHashJoin",
                     "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "media_legacy_image_parity": {
        # one Arrow kernel over the scan; payload bytes never shuffle
        "must": ["MapInPandas"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BroadcastNestedLoopJoin", "BroadcastHashJoin",
                     "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "media_exr_pixel_stats": {
        # one Arrow kernel over the scan; payload bytes never shuffle
        "must": ["MapInPandas"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BroadcastNestedLoopJoin", "BroadcastHashJoin",
                     "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "media_audio_container_parity": {
        # one Arrow kernel over the scan; payload bytes never shuffle
        "must": ["MapInPandas"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BroadcastNestedLoopJoin", "BroadcastHashJoin",
                     "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    # ---- round-8 bulk structural pins: every remaining registry
    # query gets at least the structural scale guards (no
    # SinglePartition-fed Window, no global Sort, no cartesian
    # product) plus broadcast-join pins where the probed plan
    # already broadcasts (bhj>0, smj==0).  Queries with a
    # deliberate 1-row-scalar BroadcastNestedLoopJoin (linter WARN
    # tier) skip the BNLJ must_not.  Generated from a formatted-
    # plan probe at sf0.01; tests/test_plans.py enforces.
    "ann_ivf_topk": {
        "must": ['BroadcastHashJoin'],
        "must_not": ['CartesianProduct', 'SortMergeJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "ann_pq_recall_eval": {
        "must": ['BroadcastHashJoin'],
        "must_not": ['CartesianProduct', 'SortMergeJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "ann_sq8_recall_eval": {
        "must": ['BroadcastHashJoin'],
        "must_not": ['CartesianProduct', 'SortMergeJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "anti_join_unregistered": {
        "must": ['BroadcastHashJoin'],
        "must_not": ['CartesianProduct', 'SortMergeJoin', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "approx_distinct_users": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "approx_quantiles_bounded": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "asof_join_events": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "below_avg_qty_revenue": {
        "must": ['BroadcastHashJoin'],
        "must_not": ['CartesianProduct', 'SortMergeJoin', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "benford_first_digit": {
        "must": [],
        "must_not": ['CartesianProduct'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "boilerplate_span_stats": {
        "must": ['BroadcastHashJoin'],
        "must_not": ['CartesianProduct', 'SortMergeJoin', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "conditional_replace": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "contrastive_pairs": {
        "must": ['BroadcastHashJoin'],
        "must_not": ['CartesianProduct', 'SortMergeJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "conversion_funnel": {
        "must": ['BroadcastHashJoin'],
        "must_not": ['CartesianProduct', 'SortMergeJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "cube_qty": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "cumsum_rank": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "curation_funnel": {
        "must": ['BroadcastHashJoin'],
        "must_not": ['CartesianProduct', 'SortMergeJoin', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "customer_order_distribution": {
        "must": ['BroadcastHashJoin'],
        "must_not": ['CartesianProduct', 'SortMergeJoin', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "cyclical_features": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "date_functions": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "dedup_by_key_latest": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "dedup_components": {
        "must": ['BroadcastHashJoin'],
        "must_not": ['CartesianProduct', 'SortMergeJoin', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "deterministic_sample_stats": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "disjunctive_revenue": {
        "must": ['BroadcastHashJoin'],
        "must_not": ['CartesianProduct', 'SortMergeJoin', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "distinct_conditional_agg": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "distinct_pairs": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "event_dedup_within_watermark": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "except_all": {
        "must": ['BroadcastHashJoin'],
        "must_not": ['CartesianProduct', 'SortMergeJoin', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "filter_retention_window": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "fuzzy_name_match": {
        "must": [],
        "must_not": ['CartesianProduct'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "gbt_price_improves": {
        "must": [],
        "must_not": ['CartesianProduct'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "groupby_last_update": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "grouped_agg_median_discount": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "histogram_totalprice": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "hll_set_ops_estimate": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "idempotent_merge": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "intersect_all_multiset": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "json_extract_coalesce": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "lag_delta": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "langid_confusion": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "lsh_bucket_histogram": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "macd_signal": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "market_beta": {
        "must": ['BroadcastHashJoin'],
        "must_not": ['CartesianProduct', 'SortMergeJoin', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "media_frame_count": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "media_h264_stream_index": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "media_image_features": {
        "must": ['BroadcastHashJoin'],
        "must_not": ['CartesianProduct', 'SortMergeJoin', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "media_metadata": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "media_mp4_keyframe_index": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "media_probe_summary": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "media_adts_probe_stats": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin',
                     'SortMergeJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "media_id3_tags": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin',
                     'SortMergeJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "minmax_scale": {
        "must": [],
        "must_not": ['CartesianProduct'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "ml_feature_pipeline": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "null_safe_join": {
        "must": ['BroadcastHashJoin'],
        "must_not": ['CartesianProduct', 'SortMergeJoin', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "ols_price_on_qty": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "orphan_fk_check": {
        "must": ['BroadcastHashJoin'],
        "must_not": ['CartesianProduct', 'SortMergeJoin', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "pii_scrub_stats": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "pivot_status_qty": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "polynomial_features": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "price_qty_regression": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "props_variant_stats": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "range_join_shipping_delay": {
        "must": ['BroadcastHashJoin'],
        "must_not": ['CartesianProduct', 'SortMergeJoin', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "recursive_supplier_chain": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "regex_validated_filter": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "ridge_price_on_qty": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "rolling_high_low": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "rollup_qty": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "rsi_14": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "semi_join_active": {
        "must": ['BroadcastHashJoin'],
        "must_not": ['CartesianProduct', 'SortMergeJoin', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "session_windows": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "sessionize_events": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "set_ops": {
        "must": ['BroadcastHashJoin'],
        "must_not": ['CartesianProduct', 'SortMergeJoin', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "simhash_fingerprints": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "sliding_hourly_30m": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "sql_surface": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "staleness_report": {
        "must": ['BroadcastHashJoin'],
        "must_not": ['CartesianProduct', 'SortMergeJoin', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "stratified_sample_counts": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "term_doc_frequency": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "text_fingerprint": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "text_langid_agreement": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "text_quality_score": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "text_token_stats": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "theil_index_revenue": {
        "must": [],
        "must_not": ['CartesianProduct'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "time_bucket_rollup": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "topk_orders": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "topk_per_group": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "tpch_q11_important_stock": {
        "must": ['BroadcastHashJoin'],
        "must_not": ['CartesianProduct', 'SortMergeJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "tpch_q12_late_by_status": {
        "must": ['BroadcastHashJoin'],
        "must_not": ['CartesianProduct', 'SortMergeJoin', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "tpch_q14_promo_revenue": {
        "must": ['BroadcastHashJoin'],
        "must_not": ['CartesianProduct', 'SortMergeJoin', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "tpch_q16_supplier_cnt": {
        "must": ['BroadcastHashJoin'],
        "must_not": ['CartesianProduct', 'SortMergeJoin', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "tpch_q22_idle_customers": {
        "must": ['BroadcastHashJoin'],
        "must_not": ['CartesianProduct', 'SortMergeJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "tpch_q7_volume_shipping": {
        "must": ['BroadcastHashJoin'],
        "must_not": ['CartesianProduct', 'SortMergeJoin', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "triangle_count_cosupply": {
        "must": [],
        "must_not": ['CartesianProduct'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "udtf_chunk_documents": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "value_counts": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "value_stats": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "vector_norm_stats": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "window_rownum_dedup": {
        "must": [],
        "must_not": ['CartesianProduct', 'BroadcastNestedLoopJoin'],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "tail_dependence_segments": {
        # one conditional daily collapse, one percentile aggregate,
        # 1-row threshold broadcast, exact exceedance counts
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BatchEvalPython", "ArrowEvalPython", "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "label_centroid_similarity": {
        # labels x dims centroid collapse, bounded matrix self-join
        # under a < guard (broadcast NL on the 5-row frame)
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BatchEvalPython", "ArrowEvalPython", "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "lateral_topk_per_group": {
        # Catalyst decorrelates the LATERAL into a ranked join — never
        # per-outer-row execution, never a cartesian expansion
        "must": [],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "neyman_allocation": {
        # one exact-DECIMAL strata-moments pass + scalar allocation
        # algebra
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BatchEvalPython", "ArrowEvalPython", "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "vocab_capture_recapture": {
        # md5-halved corpus, explode + presence aggregate, closed-form
        # Chapman estimator over four exact integers
        "must": ["HashAggregate", "Generate"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython", "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "edge_triangle_support": {
        # canonical bounded closure, map-side per-edge charge, keyed
        # count, LEFT broadcast join back to the edge list
        "must": ["HashAggregate", "BroadcastHashJoin"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "ann_ivf_trained_recall_eval": {
        # both pipelines reuse their component shapes; tiny keyed
        # intersection join
        "must": ["BroadcastHashJoin", "HashAggregate"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "rich_club_coefficient": {
        # shared capped pair build (its customer-keyed SMJ self-join is
        # the intended scale shape); >k subsets via broadcast degree
        # joins on the bounded edge list; the 3-row literal k frame
        # broadcasts (bounded-literal-frame NL, the approved pattern)
        "must": ["HashAggregate", "BroadcastHashJoin"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "event_markov_stationary": {
        # the window/matrix stages run INSIDE the eager
        # localCheckpointed iteration (the heaps_law_fit pin rule), so
        # the pinned plan is the post-checkpoint scan + final project
        "must": [],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "decomposition_strength": {
        # day collapse, centered window over the bounded daily frame,
        # broadcast seasonal-mean join, one variance aggregate
        "must": ["HashAggregate", "BroadcastHashJoin"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "mase_pinball_naive": {
        # day collapse, two lag windows over the bounded daily frame,
        # exact-integer error aggregate
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "near_dup_survivorship_by_source": {
        # bounded LSH candidates + checkpointed min-label closure +
        # one LEFT broadcast verdict join + keyed rollup; text never
        # shuffles
        "must": ["HashAggregate", "BroadcastHashJoin"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "fisher_price_index": {
        # two pushdown-filtered per-part aggregates, one part-keyed
        # equi-join, one basket rollup
        "must": ["HashAggregate", "PushedFilters"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython", "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "ltv_cohort_curve": {
        # per-user first-touch aggregate broadcast into the purchase
        # scan, (cohort, age) collapse, cohort-partitioned cumulative
        # window over bounded 8-row curves
        "must": ["HashAggregate", "BroadcastHashJoin", "Window"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "classifier_ks_gains": {
        # shared integer score, global_ntile decile cut, exact
        # cumulative integers over the bounded 10-row frame
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "media_ogg_flac_audio_stats": {
        # two Arrow kernels over the sampled scan (mux, then the
        # dispatching decode); payload bytes never shuffle
        "must": ["MapInPandas"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BroadcastNestedLoopJoin", "BroadcastHashJoin",
                     "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "signup_to_purchase_latency": {
        # one conditional per-user min-aggregate (no self-join between
        # event types), filter, one percentile aggregate
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BatchEvalPython", "ArrowEvalPython", "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "term_burstiness_top": {
        # explode + two keyed aggregations to per-term integer moments;
        # variance via the moment identity (no zero-filled matrix);
        # TakeOrdered top cut
        "must": ["HashAggregate", "Generate", "TakeOrderedAndProject"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BatchEvalPython", "ArrowEvalPython", "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "poisson_dispersion_daily_events": {
        # (type, day) integer collapse + keyed moment rollup
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython", "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "two_proportion_ab_test": {
        # per-user conversion aggregate + four-integer rollup + scalar
        # closed form
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython", "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "attribution_position_based": {
        # per-user bounded as-of join, purchase-partitioned position
        # windows, integer-ppm weights, tiny channel rollup
        "must": ["HashAggregate", "Window"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "multi_table_key_profile": {
        # one pushdown-pruned aggregate per table, unioned; no joins,
        # no windows
        "must": ["HashAggregate", "Union"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "SortMergeJoin", "BroadcastHashJoin",
                     "BatchEvalPython", "ArrowEvalPython", "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "qq_shift_returned_vs_kept": {
        # group-partitioned ntile (two partitions, never a global
        # sort of the facts), per-(group,bin) collapse, 10-row pivot
        "must": ["HashAggregate", "Window"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "cohens_kappa_langid": {
        # shared codegen classifier -> bounded confusion frame; kappa
        # algebra on tiny keyed aggregates + scalar broadcasts
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BatchEvalPython", "ArrowEvalPython", "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "ab_power_mde": {
        # per-user metric aggregate + pooled-moment aggregate + scalar
        # closed form
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython", "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "woe_iv_price_returned": {
        # global_ntile decile cut (range-partitioned rank, no
        # single-task ntile sort), exact per-bin counts, scalar WOE/IV
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "mutual_information_priority_flag": {
        # FK equi-join collapses to a 15-cell frame; marginals/windows
        # on that bounded frame; scalar entropy frames broadcast back
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "hhi_supplier_concentration": {
        # broadcast supplier/nation dims, one (nation, supplier)
        # map-side-combined collapse, nation-partitioned share window
        "must": ["BroadcastHashJoin", "HashAggregate", "Window"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "srm_check": {
        # one distinct + one counting aggregate; closed-form statistics
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython", "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "diff_in_diff_urgent": {
        # ONE conditional 2x2 aggregate, exact DECIMAL moments, scalar
        # contrast algebra
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython", "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "price_elasticity_by_brand": {
        # broadcast dim join + one keyed bivariate-aggregate pass
        "must": ["BroadcastHashJoin", "HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BatchEvalPython", "ArrowEvalPython", "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "pettitt_changepoint": {
        # day collapse, tie-aware rank windows + running statistic over
        # the bounded daily frame, TakeOrdered argmax cut
        "must": ["HashAggregate", "Window", "TakeOrderedAndProject"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "runs_test_daily_revenue": {
        # day collapse, exact-mean scalar broadcast, one lag window on
        # the bounded daily frame, closed-form z
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "mixture_temperature_sampling": {
        # one map-side-combined token-count aggregate; scalar algebra
        # on the tiny per-source frame (1-row scalar broadcast NLs)
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BatchEvalPython", "ArrowEvalPython", "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "ann_ivf_trained_topk": {
        # scan-fused literal-argmin assignment + one keyed codebook
        # aggregate; probe via broadcast of the tiny codebook; the
        # candidate join is an equality join on cluster id
        "must": ["HashAggregate", "BroadcastHashJoin", "Window"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "ann_graph_topk": {
        # graph build = capped-bucket candidates + per-src argmin
        # windows over materialized (localCheckpointed) rounds; beam
        # rounds broadcast the tiny frontier into the edge join; the
        # only NL join is the bounded (queries x entries) seed
        "must": ["BroadcastHashJoin", "Window"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "ann_graph_build": {
        # the build itself executes eagerly through the artifact seam
        # (plans.artifacts.materialized) before explain captures the
        # plan, so the registered plan is the steady-state shape: a
        # parquet scan of the maintained edge table feeding two keyed
        # aggregates — no joins, no windows, no Python
        "must": ["HashAggregate", "Scan parquet"],
        "must_not": ["CartesianProduct", "SortMergeJoin", "Window",
                     "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "ann_graph_recall_eval": {
        # beam search over the maintained edge artifact (broadcast
        # frontier joins + per-query top-k windows); the exact side is
        # the deliberate bounded (queries x corpus) brute-force NL —
        # BNLJ is therefore allowed, a shuffled SMJ is not
        "must": ["BroadcastHashJoin", "Window", "HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "ann_ivf_retrain_drift": {
        # one literal-argmin seed pass (localCheckpointed) feeds both
        # codebook aggregates; re-assignment = the two codebooks
        # collapsed to single broadcast rows (the bounded 1-row scalar
        # NL pattern) + a per-row ordered array-fold argmin — NO
        # per-vector window, no corpus×K shuffle, no census self-join
        # (r12: the windowed form shuffled 8× the corpus four times);
        # the K²-row contingency table is cached and rolled up twice
        "must": ["HashAggregate", "InMemoryTableScan"],
        "must_not": ["CartesianProduct", "Window", "SortMergeJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "ann_graph_repair_recall": {
        # base build + insert + repair all execute eagerly (artifact /
        # localCheckpoint discipline); the captured plan is the double
        # beam search + recall join: broadcast frontier hash joins,
        # per-query top-k windows, the deliberate bounded brute-force
        # NL for the exact side — never a shuffled SMJ
        "must": ["BroadcastHashJoin", "Window", "HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "kcenter_coreset_selection": {
        # the Gonzalez greedy loop runs eagerly (per-pick
        # localCheckpoint + TakeOrdered(1)); the registered plan is
        # the shuffle-free union of the checkpointed pick rows — any
        # Exchange here would mean the assembly started re-shuffling
        "must": ["Union"],
        "must_not": ["Exchange", "CartesianProduct", "SortMergeJoin",
                     "Window", "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "media_dhash_cross_format_dedup": {
        # one Arrow decode+hash kernel (payloads never leave it — only
        # the 8-byte hash + format id + digest exit), then a
        # hash-keyed aggregate (Expand = the countDistinct pair); no
        # joins of any kind
        "must": ["MapInPandas", "HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin", "Window",
                     "BroadcastNestedLoopJoin", "BroadcastHashJoin"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "dsir_importance_selection": {
        # two 256-row feature-model aggregates broadcast back to the
        # token stream; per-doc keyed aggregate; top-k via TakeOrdered
        "must": ["HashAggregate", "TakeOrderedAndProject"],
        "must_not": ["CartesianProduct", "SortMergeJoin", "Window",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "top_session_paths": {
        # one (user, time) sort reused by the sessionize window pair +
        # within-session row_number, rn<=3 filter before the pivot,
        # tiny path-count frame, TakeOrdered cut (1-row total is the
        # approved scalar broadcast NL)
        "must": ["Window", "HashAggregate", "TakeOrderedAndProject"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "grubbs_outlier_test": {
        # exact-DECIMAL moments pass + broadcast-scalar max pass (1-row
        # scalar broadcast NL is the approved pattern)
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BatchEvalPython", "ArrowEvalPython", "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "pacf_daily_revenue": {
        # day-collapsed frame, three lag windows over the bounded daily
        # frame, one aggregate + scalar Durbin-Levinson algebra
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "breusch_pagan_daily_trend": {
        # exact DECIMAL trend moments, scalar (a,b) broadcast back, one
        # windowless auxiliary aggregate
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython", "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "hurst_rs_daily_revenue": {
        # day collapse, scale explode, (scale, block)-partitioned
        # cumulative window (never global over facts), integer R/S
        # quantization, 4-point regression
        "must": ["HashAggregate", "Generate", "Window"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "ann_bq_topk": {
        # the Hamming scan is the deliberate broadcast-queries × corpus
        # NL join over the integer sign packs (16x less traffic than
        # floats); per-query window cuts; never a repartition join
        "must": ["BroadcastNestedLoopJoin", "Window"],
        "must_not": ["SortMergeJoin", "CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "ann_bq_recall_eval": {
        # two broadcast-query scans + one tiny keyed intersection join
        "must": ["BroadcastHashJoin", "HashAggregate"],
        "must_not": ["SortMergeJoin", "CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "welch_t_returned_vs_kept": {
        # one conditional two-group aggregate, exact DECIMAL moments,
        # scalar-frame algebra only
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython", "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "anova_levene_returnflag": {
        # group moments + broadcast-join deviation pass + 3-row frame
        # algebra; the 1-row cross of the two scalar frames is the
        # approved scalar broadcast NL
        "must": ["HashAggregate", "BroadcastHashJoin"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BatchEvalPython", "ArrowEvalPython", "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "obv_trend": {
        # one (ticker, time) window sort shared by lag + running sum,
        # one keyed aggregate — all integer arithmetic
        "must": ["HashAggregate", "Window"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "media_ico_pixel_stats": {
        # one Arrow kernel over the scan; payload bytes never shuffle
        "must": ["MapInPandas"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BroadcastNestedLoopJoin", "BroadcastHashJoin",
                     "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "tokenizer_fertility": {
        # per-doc integer counts in the scan stage, one keyed aggregate
        # — text bytes never shuffle
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython", "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "lexical_diversity_by_source": {
        # explode + two keyed map-side-combined aggregations; closed
        # integer expressions only
        "must": ["HashAggregate", "Generate"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython", "Window"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "string_agg_ordered": {
        # broadcast dim join + one keyed aggregate with in-group sort
        "must": ["BroadcastHashJoin", "HashAggregate"],
        "must_not": ["CartesianProduct", "SortMergeJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "mode_per_group": {
        # fact collapses to a bounded (status, priority) frame before
        # the rank window
        "must": ["HashAggregate", "Window"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "adamic_adar_link_prediction": {
        # capped wedge self-join with broadcast hub-weight join, exact
        # integer pair sums, anti-join existing edges, TakeOrdered cut
        "must": ["HashAggregate", "TakeOrderedAndProject"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
    },
    "degree_powerlaw_hill": {
        # shared capped pair build + threshold edges, one keyed degree
        # count, filter + exact-integer tail aggregate, 1-row scalar NL
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "durbin_watson_ols": {
        # day-collapsed frame, exact DECIMAL trend moments, scalar
        # (a,b) broadcast back (1-row broadcast NL is the approved
        # scalar pattern), one lag window over the bounded daily frame
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "variance_ratio_test": {
        # day-collapsed frame, two lag windows over the bounded daily
        # frame, telescoped exact mean broadcast as a 1-row scalar
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
    "stochastic_oscillator": {
        # two (ticker, time) window passes (channel extremes + %D) and
        # one keyed aggregate — all partitioned by ticker, no global
        # window, no Python
        "must": ["HashAggregate", "Window"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "garman_klass_volatility": {
        # (ticker, day) OHLC collapse then per-ticker aggregate — two
        # keyed shuffles, windows only partitioned by (ticker, day)
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "amihud_illiquidity": {
        # (ticker, day) close+volume collapse, per-ticker lag window on
        # the daily frame, one keyed aggregate
        "must": ["HashAggregate", "Window"],
        "must_not": ["CartesianProduct", "BroadcastNestedLoopJoin",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_window": True,
        "no_global_sort": True,
    },
    "friedman_priority_weekday": {
        # 7x5 cell-mean collapse (map-side combine), rank window
        # partitioned by block over the bounded cell frame, tiny
        # per-treatment rollup + 1-row dims broadcast
        "must": ["HashAggregate", "Window"],
        "must_not": ["CartesianProduct",
                     "BatchEvalPython", "ArrowEvalPython"],
        "no_global_sort": True,
    },
}


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main(sf_dir: str = "/root/testdata/sf0.01") -> int:
    spark = get_spark("plan_audit")
    lines = [
        "# PLANS — physical-plan audit of flagship queries",
        "",
        f"Generated by `scripts/plan_audit.py` at `{sf_dir}`. Each query",
        "lists the scale-critical plan properties asserted (also enforced",
        "in `tests/test_plans.py`), then the `explain('formatted')` output.",
        "",
    ]
    failures = []
    for name, exp in EXPECTATIONS.items():
        plan = formatted_plan(REGISTRY[name].fn(spark, sf_dir))
        checks = []
        for frag in exp["must"]:
            ok = frag in plan
            checks.append(f"- `{frag}` present: {'✅' if ok else '❌'}")
            if not ok:
                failures.append((name, f"missing {frag}"))
        for frag in exp["must_not"]:
            ok = frag not in plan
            checks.append(f"- `{frag}` absent: {'✅' if ok else '❌'}")
            if not ok:
                failures.append((name, f"unexpected {frag}"))
        if exp.get("no_global_window"):
            bad = global_window_ids(plan)
            checks.append(
                f"- no SinglePartition-fed Window: {'✅' if not bad else '❌ ' + str(bad)}"
            )
            if bad:
                failures.append((name, f"global window nodes {bad}"))
        if exp.get("no_global_sort"):
            bad = global_sort_ids(plan)
            checks.append(
                f"- no global Sort: {'✅' if not bad else '❌ ' + str(bad)}"
            )
            if bad:
                failures.append((name, f"global sort nodes {bad}"))
        lines += [f"## {name}", "", *checks, "", "```", plan.rstrip(), "```", ""]
    with open("PLANS.md", "w") as f:
        f.write("\n".join(lines))
    print(f"PLANS.md written; {len(failures)} failures")
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
