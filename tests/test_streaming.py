"""Structured Streaming surface: AvailableNow drain of the events fixture
must reproduce the batch answers (full oracle parity at sf0.001)."""

from __future__ import annotations

from zip_to_parquet_spark.plans import all_oracle_sql, all_queries
from zip_to_parquet_spark.runtime import ensure_shipped
from zip_to_parquet_spark.streaming import (
    read_events_stream,
    run_stream_to_memory,
    stateful_user_totals,
)

from tests.parity import compare

STREAM_KEYS = [
    "stream_tumbling_window",
    "stream_sessionize",
    "stream_stateful_totals",
    "stream_stream_join",
    "stream_dedup_keys",
]


def test_streaming_queries_match_oracle(spark, sf_dir):
    qs, oracles = all_queries(), all_oracle_sql()
    for key in STREAM_KEYS:
        compare(spark, sf_dir, qs[key], oracles[key])


def test_stateful_totals_is_streaming(spark, sf_dir):
    ensure_shipped(spark)
    stream = read_events_stream(spark, sf_dir)
    assert stream.isStreaming
    out = run_stream_to_memory(stateful_user_totals(stream), "update", "t_assert")
    assert not out.isStreaming
    assert out.columns == ["user_id", "n_events", "total_value"]
    assert out.count() > 0
