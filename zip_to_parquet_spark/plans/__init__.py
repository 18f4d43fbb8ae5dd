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
# ROUND-10 pin (committed FIRST this round per VERDICT r9 ask #1; the r9
# round ran on the stale r8 pin, so this window clears the whole debt):
#   slots 1-3: the three keys whose engine changed in r8 (decimal(38,0)/
#     HUGEINT headroom sweep) without a post-change driver row —
#     stats_ks_statistic, dq_distribution_drift, mixture_rates_for_budget.
#     Two rounds of policy debt; first in line.
#   slots 4-45: the 42 never-driver-checked backlog keys (exact list from
#     `python scripts/window_pin.py` at r10 start), alphabetical. This
#     includes vector_int8_quant_error (empty-array short-circuit fixed in
#     b226561 — changed code, never driver-checked) and the five r9
#     additions (stats_kendall_tau_daily, stats_kruskal_wallis,
#     sample_systematic_interval, split_leakage_neardup,
#     events_page_hinkley).
#   slots 46-50: oldest-green-first refresh (VERDICT r8 ask #3 / r9 ask #1):
#     the §2 zip keys riding on round-4 driver evidence — zip_explode_hash,
#     zip_glob_members, zip_null_projection, zip_union_sources,
#     zip_count_members — re-anchoring reference parity (builder.rs:171-226
#     semantics) on a current driver run.
# Arithmetic: 3 changed + 42 backlog + 5 refresh = 50 = window size; after
# this round every key registered at the r10 pin has a driver row and
# rotation becomes oldest-green-first (scripts/window_pin.py emits the
# r11 list mechanically). New-key ration this round: 5 (the VERDICT r9
# cap) — events_attribution_time_decay, graph_resource_allocation,
# stats_levene_bf, sample_class_balanced, ts_ljung_box, added AFTER this
# pin with full oracles + sf0.001/sf0.01 parity; they are the r11
# window's slots 1-5 by the never-checked-first rule.
# All keys outside the window remain value-verified by the sf0.001
# oracle-parity suite on every test run plus the round-end sf0.01 sweep
# and the type+overflow audit (scripts/audit_oracle_types.py).
set_priority([
    # slots 1-3: changed in r8, never re-verified
    "stats_ks_statistic",
    "dq_distribution_drift",
    "mixture_rates_for_budget",
    # slots 4-45: never-driver-checked backlog (42 keys)
    "ann_nprobe_curve",
    "corpus_token_budget_curve",
    "dq_functional_dependency",
    "events_gap_log2_histogram",
    "events_page_hinkley",
    "experiment_power_mde",
    "feature_target_encode_loo",
    "graph_jaccard_linkpred",
    "multimodal_ahash_dedup",
    "parts_abc_classification",
    "pipeline_filter_interaction",
    "privacy_dp_geometric_counts",
    "privacy_randomized_response",
    "recsys_item_item_topn",
    "retrieval_prf_expansion",
    "revenue_mom_yoy",
    "sample_neyman_allocation",
    "sample_poisson_replicate",
    "sample_stratified_exact",
    "sample_systematic_interval",
    "select_coreset_kcenter",
    "sketch_count_min",
    "sketch_hll_registers",
    "split_group_aware",
    "split_leakage_neardup",
    "stats_bootstrap_ci_poisson",
    "stats_gini_permille",
    "stats_kaplan_meier",
    "stats_kendall_tau_daily",
    "stats_kruskal_wallis",
    "stats_ols_two_factor",
    "stats_runs_test",
    "stats_theil_sen_daily",
    "stats_zipf_fit",
    "text_lexical_diversity",
    "text_rake_keywords",
    "text_readability_fk",
    "tokenizer_vocab_coverage",
    "ts_autocorrelation",
    "ts_ma_decompose",
    "ts_rolling_median",
    "vector_int8_quant_error",
    # slots 46-50: r4-vintage §2 zip-key refresh (oldest-green-first)
    "zip_explode_hash",
    "zip_glob_members",
    "zip_null_projection",
    "zip_union_sources",
    "zip_count_members",
])

__all__ = ["all_queries", "all_oracle_sql", "query", "set_priority"]
