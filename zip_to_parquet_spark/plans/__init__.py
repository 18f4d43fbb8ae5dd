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
# ROUND-8 pin (this round): burn-down round 1 of 2 for the 76-key
# never-driver-checked backlog (VERDICT r7 asks 1-2).
#   slot 1: curriculum_quantile_order — the ONE key whose engine changed
#     in r7 (operators/stats.py NULL filter, shared cumulative_value_counts
#     helper) without a fresh driver row.
#   slot 2: sink_parquet_roundtrip — NEW this round (VERDICT ask 4): A4's
#     write->read->verify loop, closing the last pytest-only SURVEY §2 row.
#   slots 3-5: the three keys whose engine changed THIS round (must be in
#     the window per policy): dedup_apss_prefix (cos2_micro through
#     decimal(38,0) — ADVICE overflow-headroom fix), sample_ht_estimate
#     (dropped the float double-division — ADVICE integer-exactness fix),
#     text_boilerplate_lines (refactored onto
#     operators.textops.boilerplate_line_stats; plan unchanged).
#   slots 6-31: the remaining 26 round-7 keys, never driver-checked.
#   slots 32-50: 19 of the 47-key round-5 tail, events_cusum_alarm first
#     (it ceded its r7 slot to stats_anova_f), then events/experiments
#     families.
#   round 9 finishes the rest: FIRST the three green keys whose engine
#     changed in r8 without a slot (stats_ks_statistic,
#     dq_distribution_drift, mixture_rates_for_budget — all three got
#     decimal(38,0)/HUGEINT headroom fixes in the same sweep that fixed
#     the five in-window keys; sf0.001 parity + the sf0.01 audit cover
#     them meanwhile — the curriculum_quantile_order precedent), then
#     the remaining 28 backlog keys + this round's additions (rationed
#     to <= 22 so r9's 50 slots cover everything; after r9 every
#     registry key has a driver row and rotation returns to
#     oldest-green-first refresh, starting with the r4-vintage §2 zip
#     keys).
# All keys outside the window remain value-verified by the sf0.001
# oracle-parity suite on every test run plus the round-end sf0.01 sweep
# and the type+overflow audit (scripts/audit_oracle_types.py).
set_priority([
    "curriculum_quantile_order",
    "sink_parquet_roundtrip",
    "dedup_apss_prefix",
    "sample_ht_estimate",
    "text_boilerplate_lines",
    "stats_bh_fdr_cells",
    "quality_classifier_auc",
    "quality_calibration_bins",
    "quality_classifier_mcnemar",
    "stats_conformal_coverage",
    "ts_pinball_loss",
    "ts_changepoint_binary",
    "dedup_entity_blocking",
    "mixture_temperature_rates",
    "stats_trimmed_mean",
    "sample_effective_size",
    "lm_kneser_ney_bigram",
    "stats_spearman_daily",
    "privacy_l_diversity",
    "events_pattern_strict_funnel",
    "stream_pattern_strict_funnel",
    "quality_isotonic_pav",
    "corpus_novelty_by_source",
    "lm_good_turing_counts",
    "graph_local_clustering",
    "ts_seasonal_strength",
    "sketch_bloom_fpr",
    "stats_dispersion_index",
    "events_audience_overlap",
    "experiment_group_sequential",
    "dedup_threshold_curve",
    "events_cusum_alarm",
    "events_anomaly_deseasonalized",
    "events_attribution_linear",
    "events_attribution_ushape",
    "events_bot_regularity",
    "events_cohort_ltv",
    "events_holt_linear_trend",
    "events_locf_fill",
    "events_sequence_pairs",
    "events_session_paths",
    "events_session_window_builtin",
    "events_time_to_convert",
    "experiment_cuped_adjust",
    "experiment_diff_in_diff",
    "experiment_lift_t2",
    "experiment_srm_check",
    "experiment_stratified_ate",
    "dq_freshness_lag",
    "dq_referential_integrity",
])

__all__ = ["all_queries", "all_oracle_sql", "query", "set_priority"]
