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


def test_late_drop_replay_actually_drops(spark, sf_dir):
    """The stream_watermark_late_drop key is only meaningful if the late
    file is REALLY discarded by the watermark (not admitted and merged) —
    assert the drop via query progress, not just final-state parity."""
    from zip_to_parquet_spark.streaming import (
        read_events_stream_staged,
        windowed_counts,
    )

    ensure_shipped(spark)
    agg = windowed_counts(read_events_stream_staged(spark, sf_dir))
    q = (
        agg.writeStream.trigger(availableNow=True)
        .format("memory")
        .queryName("late_drop_assert")
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    drops = {
        p["batchId"]: (p["stateOperators"][0]["numRowsDroppedByWatermark"]
                       if p["stateOperators"] else 0)
        for p in q.recentProgress
    }
    n_inputs = {p["batchId"]: p["numInputRows"] for p in q.recentProgress}
    # Four data batches; batch 3 (the late file) is excluded wholesale —
    # most of it counted by the state operator's drop metric, the rest
    # discarded by the pre-aggregation watermark filter (which has no
    # metric; the oracle-parity test proves the full exclusion by value).
    assert set(n_inputs) >= {0, 1, 2, 3}, n_inputs
    assert 0 < drops[3] <= n_inputs[3], (drops, n_inputs)
    assert all(drops.get(b, 0) == 0 for b in (0, 1, 2)), drops
    emitted = spark.table("late_drop_assert").count()
    admitted = sum(n_inputs.values()) - n_inputs[3]
    # Every emitted row comes from on-time batches only.
    assert emitted <= admitted, (emitted, admitted)
