"""Named query registry backing ``__spark_entry__.queries()``.

Importing this package registers every query module; the driver-facing
surface is ``all_queries()`` / ``all_oracle_sql()``.
"""

from __future__ import annotations

from zip_to_parquet_spark.plans.registry import (
    all_oracle_sql,
    all_queries,
    query,
    set_priority,
)

# Import for side effect: each module registers its queries.
from zip_to_parquet_spark.plans import relational  # noqa: E402,F401
from zip_to_parquet_spark.plans import llm  # noqa: E402,F401
from zip_to_parquet_spark.plans import zipparity  # noqa: E402,F401
from zip_to_parquet_spark.plans import streamingq  # noqa: E402,F401
from zip_to_parquet_spark.plans import temporal  # noqa: E402,F401
from zip_to_parquet_spark.plans import analytics  # noqa: E402,F401
from zip_to_parquet_spark.plans import learn  # noqa: E402,F401
from zip_to_parquet_spark.plans import tpch_deco  # noqa: E402,F401
from zip_to_parquet_spark.plans import tpch2  # noqa: E402,F401
from zip_to_parquet_spark.plans import market  # noqa: E402,F401
from zip_to_parquet_spark.plans import scidata  # noqa: E402,F401
from zip_to_parquet_spark.plans import journeys  # noqa: E402,F401
from zip_to_parquet_spark.plans import experiments  # noqa: E402,F401

# The driver's per-round correctness sweep covers the FIRST 50 registry keys.
# Window policy (per VERDICT r2, AUTOMATED since round 4 by
# tests/test_window_policy.py; `python scripts/window_pin.py` prints the
# changed set and a suggested pin): any key whose implementing code changed
# since its last green driver row must be inside the window; when more keys
# changed than the window holds, every slot must at least be spent on a
# changed key.
#
# ROUND-7 pin (this round): the r5/r6 windows verified the round-5 first
# three waves; 97 keys have never held a driver slot. The two-round
# rotation plan for burning down that backlog:
#   round 7 (this list): the THREE DECIMAL→VARCHAR overflow-fixed keys
#     (stats_corr_exact, stats_groupwise_linreg — red in r5/r6 —
#     plus latent stats_anova_f, fixed in the same commit) MUST get
#     fresh rows, then the never-checked backlog in window_pin.py's
#     suggested order: oldest-wave families first (set_ops_all /
#     agg_kmv_distinct rotations, dq/stats/retrieval/layout singles,
#     the round-5 fourth-wave events/quality block, the TPC-H tail
#     q2/q7/q8/q9/q12/q15/q16/q18/q20/q21).
#   round 8: the remaining ~47 never-checked keys (fifth/sixth/seventh
#     waves: scidata ts/stats tail, journeys, experiments, privacy,
#     events_cusum_alarm which ceded its slot to stats_anova_f) PLUS the
#     29 keys round 7 added (stats_bh_fdr_cells, text_boilerplate_lines,
#     quality_classifier_auc/calibration_bins/mcnemar,
#     stats_conformal_coverage, ts_pinball_loss, ts_changepoint_binary,
#     dedup_entity_blocking, dedup_apss_prefix,
#     mixture_temperature_rates, stats_trimmed_mean, sample_ht_estimate,
#     sample_effective_size, lm_kneser_ney_bigram, stats_spearman_daily,
#     privacy_l_diversity, events_pattern_strict_funnel,
#     stream_pattern_strict_funnel, quality_isotonic_pav,
#     corpus_novelty_by_source, lm_good_turing_counts,
#     graph_local_clustering, ts_seasonal_strength,
#     sketch_bloom_fpr, stats_dispersion_index,
#     events_audience_overlap, experiment_group_sequential,
#     dedup_threshold_curve) — ~76 total, so the burn-down takes
#     rounds 8 AND 9 at 50 slots/round; after that every registry key
#     has a driver row and rotation returns to oldest-green-first
#     refresh. All round-7 keys are sf0.001-parity-tested on every run
#     and were hand-driven through the driver contract at sf0.01 (exact
#     value match, zero float64 pandas columns) before landing.
# All keys outside the window remain value-verified by the sf0.001
# oracle-parity suite on every test run plus the round-end sf0.01 sweep
# and the type+overflow audit (scripts/audit_oracle_types.py).
set_priority([
    # overflow-fixed this round — red r5/r6 rows, must re-verify
    "stats_corr_exact",
    "stats_groupwise_linreg",
    "stats_anova_f",
    # never driver-checked backlog, window_pin.py suggested order
    "set_ops_all",
    "agg_kmv_distinct",
    "dq_expectations_report",
    "agg_sampled_percentiles",
    "join_null_aware_anti",
    "stats_ks_statistic",
    "stats_mannwhitney_u",
    "dq_benford_first_digit",
    "retrieval_mmr_rerank",
    "contrastive_negative_pairs",
    "ann_ndcg_eval",
    "lm_perplexity_holdout",
    "cogroup_user_attribution",
    "join_asof_nearest_click",
    "join_partition_pruning_dynamic",
    "graph_degree_assortativity",
    "cluster_silhouette_eval",
    "layout_shuffle_shards",
    "batch_length_buckets",
    "select_token_mass_topp",
    "layout_compaction_plan",
    "quality_rank_normalize",
    "quality_classifier_confusion",
    "vector_matryoshka_recall",
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q12_late_priority_count",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q18_large_orders",
    "q20_part_promotion",
    "q21_waiting_supplier",
    "events_time_weighted_avg",
    "events_ohlc_bars",
    "stream_ohlc_bars",
    "basket_pair_lift",
    "customer_rfm_segments",
    "stats_weighted_median",
    "events_rolling_anomaly",
    "dq_distribution_drift",
    "scan_column_profile",
    "events_ewma_fixed_point",
    "stats_chi_square_cells",
    "ts_seasonal_naive_mae",
    "dq_k_anonymity",
])

__all__ = ["all_queries", "all_oracle_sql", "query", "set_priority"]
