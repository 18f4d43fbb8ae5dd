from zip_to_parquet_spark.streaming.streams import (
    read_events_stream,
    run_stream_to_memory,
    sessionized_stream,
    stateful_user_totals,
    windowed_counts,
)

__all__ = [
    "read_events_stream",
    "run_stream_to_memory",
    "sessionized_stream",
    "stateful_user_totals",
    "windowed_counts",
]
