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
# changed key. Round-5 situation: the r4 driver verified 50 keys, leaving
# 71 whose last green row predates the r4 file churn, and the round-5
# edits (dedupe/llm/analytics/joins) flipped most r4-green keys back to
# changed — so every slot goes to a changed key, ordered:
# (a) operators NEW in round 5 (never driver-checked) — the incremental
#     pair + recall eval from the first wave, then the second wave
#     (k-means, distilled classifier, Z-order layout + its pruning eval,
#     tar ingestion);
# (b) stale keys oldest-green-round first (r1 → r2 → r3) — the rows most
#     likely to have rotted; the exact order scripts/window_pin.py
#     suggests, minus the r3 slots given to (a)'s second wave and (c);
# (c) the five r4-green keys whose behavior round 5 DIRECTLY touched:
#     the hot-shingle-guard default (dedup_containment,
#     dedup_cluster_keep_best), the MERGE contract guard
#     (corpus_merge_upsert), the ORC scratch isolation
#     (format_orc_roundtrip), and the joins.py closure (dim_scd2_history)
#     — a behavior edit outranks closure drift for a driver row.
# Rotated out (all still value-verified at sf0.001 by
# tests/test_oracle_parity.py on every test run, plus the round-end
# sf0.01 full-registry sweep): the r4-window zip_*/stream_*/temporal
# block (r4-green, functions untouched), the remaining r3 window/agg
# tail, and r4-closure-drift keys whose implementing functions round 5
# never edited.
set_priority([
    # (a) new in round 5 — never driver-checked
    "dedup_incremental_vs_snapshot",
    "zip_incremental_ingest",
    "ann_recall_eval",
    "cluster_kmeans_embeddings",
    "quality_distill_classifier",
    "layout_zorder_files",
    "tar_explode_hash",
    "layout_pruning_eval",
    "bpe_tokenize_stats",
    "dedup_clusters_star",
    "stream_static_enrich",
    "text_chunk_windows_udtf",
    "q14_promo_revenue",
    "q19_disjunctive_revenue",
    "retrieval_rrf_fusion",
    "graph_bfs_hops",
    "stats_corr_exact",
    "q13_order_distribution",
    "q17_small_qty_revenue",
    "q22_idle_balance",
    "q11_important_share",
    "agg_bitmap_distinct",
    "join_bloom_prefilter",
    "stats_outlier_zscore",
    "mapinarrow_text_metrics",
    "join_existence_mark",
    "agg_histogram_equiwidth",
    "stream_watermark_late_drop",
    "join_null_safe",
    "global_rank_two_pass",
    "matview_incremental_refresh",
    "spatial_grid_neighbors",
    "agg_mode_exact",
    "skew_diagnosis_report",
    "join_interval_overlap",
    "skyline_orders_pareto",
    "text_collocations_pmi",
    "stats_outlier_mad",
    "sketch_set_algebra",
    "join_point_in_time_scd2",
    "events_markov_transitions",
    "mixture_source_entropy",
    "scan_schema_evolution",
    "sample_weighted_aes",
    "stats_groupwise_linreg",
    "stream_stream_left_outer",
    "json_variant_shredding",
    "q4_priority_count",
    "q10_returned_items",
    "join_lateral_top1",
    # (b) stale, last green r1
    # (b) stale, last green r2
    # (the remaining r2-stale tail — text/multimodal/dedup-cluster keys —
    # rotated out to make room for the round-5 third wave above; all stay
    # covered by the sf0.001 oracle-parity sweep on every test run, and
    # all r3-stale slots already went to (a)'s second wave)
    # (c) r4-green keys whose behavior round 5 directly changed
    # Rotated out at round-5 close (52 never-driver-verified keys, 50
    # slots): set_ops_all and agg_kmv_distinct (simplest semantics, both
    # green in every full-registry sf0.01 sweep and pytest-asserted),
    # plus the earlier r4-green rotations (format_orc_roundtrip,
    # dim_scd2_history, dedup_containment, dedup_cluster_keep_best,
    # corpus_merge_upsert) — all sweep-verified this round.
    # The round-5 FOURTH wave (events_time_weighted_avg, events_ohlc_bars,
    # basket_pair_lift, customer_rfm_segments, stats_weighted_median,
    # stats_chi_square_cells, events_rolling_anomaly,
    # join_partition_pruning_dynamic, scan_column_profile,
    # events_ewma_fixed_point, dq_distribution_drift,
    # stream_ohlc_bars) landed after the 50 slots were
    # already claimed by older never-verified keys; all of them are
    # full-oracle green in the sf0.001 suite AND the sf0.01 driver-contract
    # drive + type audit this round, and are first in line for the
    # round-6 window.
    # The round-5 FIFTH wave (plans/scidata.py: stats_anova_f,
    # ts_autocorrelation, dq_referential_integrity,
    # select_coreset_kcenter, tokenizer_vocab_coverage,
    # text_lexical_diversity, ts_rolling_median, stats_theil_sen_daily,
    # stats_zipf_fit, stats_kaplan_meier, graph_jaccard_linkpred,
    # sample_poisson_replicate, sketch_count_min, stats_runs_test; plus
    # ann_ndcg_eval and quality_classifier_confusion) follows the same
    # rule: outside the already-claimed window, every key verified by
    # the fresh-process driver-contract drive at sf0.01 + the sf0.001
    # suite + the type audit this session, queued behind the fourth
    # wave for round-6 slots.
    # The round-5 SIXTH wave (plans/journeys.py: events_attribution_linear,
    # events_session_paths, text_readability_fk, ts_ma_decompose,
    # events_anomaly_deseasonalized, stats_ols_two_factor,
    # multimodal_ahash_dedup, retrieval_prf_expansion,
    # sketch_hll_registers, recsys_item_item_topn) likewise: each key
    # verified by the fresh-process driver-contract drive at sf0.01 +
    # the sf0.001 suite + the type audit in the session that added it,
    # queued behind the fifth wave for round-6 slots.
    # The round-5 SEVENTH wave (events_bot_regularity, text_rake_keywords;
    # plans/experiments.py: experiment_cuped_adjust, experiment_srm_check,
    # privacy_randomized_response, feature_target_encode_loo,
    # sample_stratified_exact, events_locf_fill, experiment_lift_t2,
    # stats_bootstrap_ci_poisson, experiment_stratified_ate,
    # experiment_diff_in_diff; plus events_attribution_ushape,
    # events_sequence_pairs, vector_matryoshka_recall,
    # graph_degree_assortativity, events_cohort_ltv) likewise: every key
    # verified by the fresh-process driver-contract drive at sf0.01 +
    # the sf0.001 suite + the type audit in the session that added it,
    # queued with the earlier waves for round-6 slots.
])

__all__ = ["all_queries", "all_oracle_sql", "query", "set_priority"]
