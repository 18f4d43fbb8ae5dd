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
# ROUND-11 pin (committed FIRST this round per VERDICT r10 ask #1; the r10
# window went 50/50 green and cleared the never-checked backlog down to the
# five r10 additions):
#   slots 1-6: the five never-driver-checked r10 additions —
#     graph_resource_allocation, stats_levene_bf, ts_ljung_box,
#     events_attribution_time_decay, sample_class_balanced — all
#     full-oracle, sf0.001/sf0.01 parity-green in pytest, PLUS
#     graph_jaccard_linkpred swapped into slot 2: the hub-guard fix
#     (VERDICT r10 ask #2) changes both link-prediction keys' closures,
#     so both re-verify on post-fix code this round.
#   slots 7-50: oldest-last-green-first refresh of the stale-closure debt
#     surfaced by the function-granular differ (VERDICT r10 "What's
#     missing" #1: 104 keys whose implementing closure changed since their
#     last green row; this window takes the 45 oldest — r1/r2/r3 vintage
#     set ops, scalar/date keys, q1, multiway q5, the dedup/text/multimodal
#     families, and the join/agg relational core). Exact list emitted
#     mechanically by `python scripts/window_pin.py --list` at r11 start.
# New-key ration this round: held low per VERDICT r10 ask #3 until the
# differ reports zero stale greens.
# All keys outside the window remain value-verified by the sf0.001
# oracle-parity suite on every test run plus the round-end sf0.01 sweep
# and the type+overflow audit (scripts/audit_oracle_types.py).
set_priority([
    "graph_resource_allocation",
    "graph_jaccard_linkpred",
    "stats_levene_bf",
    "ts_ljung_box",
    "events_attribution_time_decay",
    "sample_class_balanced",
    "set_union_all",
    "set_intersect",
    "set_except",
    "scalar_string_date",
    "agg_collect_sorted",
    "scalar_string_date_extra",
    "agg_approx_percentile",
    "unpivot_part_measures",
    "q1_pricing_summary",
    "glob_filter_names",
    "join_multiway_q5",
    "sha256_documents",
    "events_tumbling_window",
    "agg_salted_skew",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "text_stats",
    "text_quality_score",
    "lang_id_heuristic",
    "token_count",
    "doc_fingerprint",
    "multimodal_meta",
    "doc_winnow_fingerprints",
    "multimodal_frame_sample",
    "dedup_clusters",
    "text_chunk_windows",
    "pack_sequences",
    "dataset_split",
    "quality_gopher_rules",
    "repetition_ratios",
    "multimodal_wav_roundtrip",
    "multimodal_png_roundtrip",
    "decontam_ngram_overlap",
    "pii_redact_counts",
    "multimodal_png_resize",
    "filter_pushdown_project",
    "join_broadcast_dim",
    "join_shuffle_facts",
    "join_semi",
    "join_anti",
    "agg_rollup",
    "agg_cube",
    "agg_count_distinct",
])

__all__ = ["all_queries", "all_oracle_sql", "query", "set_priority"]
