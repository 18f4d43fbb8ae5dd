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
# ROUND-13 pin (the mechanical `python scripts/window_pin.py --list`
# suggestion, verbatim; the r12 window went 49/50 full-oracle green + the
# by-design rows-only sketch key):
#   29 changed keys first — the 18 remaining stale-closure keys (VERDICT
#     r12 ask #1: the r6/r7/r9/r10-vintage tail, the WHOLE backlog), the
#     7 keys whose closures change THIS round (basket-capped pair
#     generation per VERDICT r12 ask #2 / finding #1:
#     graph_jaccard_linkpred, graph_resource_allocation,
#     basket_pair_lift, graph_triangle_count, graph_bfs_hops,
#     graph_local_clustering; plus mixture_sample_by_source's
#     modulus-guard fix, ADVICE r12; plus dedup_minhash_lsh and
#     dedup_embedding_cosine, whose LSH bucket expansion gains the
#     star-above-cap guard — dedupe.LSH_BUCKET_CAP, the same C(group,2)
#     family one stage over; plus dedup_simhash, whose band buckets get
#     the same star guard at its own SIMHASH_BUCKET_CAP — 15-bit bands
#     are low-entropy, fixture max 501 — and corpus-sized LSH dials land
#     in dedup_embedding_cosine via vectors.lsh_params_for), and the one
#     NEW key
#     graph_adamic_adar (VERDICT r12 ask #4 — completes the
#     link-prediction triad on the shared _weighted_linkpred pipeline).
#   slots 30-50: oldest-last-green-first top-up (the r4/r6 vintage:
#     zip_csv_members, zip_jsonl_members, zip_federated_join,
#     tar_explode_hash, the early relational core).
# New-key ration this round: 1 of ≤5 (graph_adamic_adar).
# All keys outside the window remain value-verified by the sf0.001
# oracle-parity suite on every test run plus the round-end sf0.01 sweep
# and the type+overflow audit (scripts/audit_oracle_types.py).
set_priority([
    "graph_adamic_adar",
    "graph_triangle_count",
    "stream_watermark_late_drop",
    "graph_bfs_hops",
    "ann_ndcg_eval",
    "join_partition_pruning_dynamic",
    "stats_corr_exact",
    "stats_groupwise_linreg",
    "basket_pair_lift",
    "stats_anova_f",
    "stream_pattern_strict_funnel",
    "graph_local_clustering",
    "dq_referential_integrity",
    "experiment_cuped_adjust",
    "experiment_stratified_ate",
    "experiment_diff_in_diff",
    "ann_nprobe_curve",
    "ts_autocorrelation",
    "stats_kaplan_meier",
    "sample_neyman_allocation",
    "stats_ols_two_factor",
    "sketch_hll_registers",
    "stats_bootstrap_ci_poisson",
    "dedup_embedding_cosine",
    "graph_resource_allocation",
    "graph_jaccard_linkpred",
    "mixture_sample_by_source",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "events_sessionize",
    "ann_cosine_topk",
    "lm_surprisal_scores",
    "multimodal_mp4_meta",
    "lm_bigram_surprisal",
    "topic_lexicon_classify",
    "graph_pagerank_nations",
    "zip_csv_members",
    "zip_jsonl_members",
    "zip_federated_join",
    "join_asof_last_click",
    "join_range_within_5min",
    "tfidf_topk_terms",
    "events_funnel",
    "events_retention_cohort",
    "dim_scd2_history",
    "events_rolling_active_users",
    "events_interval_islands",
    "window_time_range_sum",
    "events_funnel_partitioned",
    "scalar_array_battery",
])

__all__ = ["all_queries", "all_oracle_sql", "query", "set_priority"]
