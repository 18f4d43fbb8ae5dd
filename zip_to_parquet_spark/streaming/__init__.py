from zip_to_parquet_spark.streaming.streams import (
    clicks_to_purchases_join,
    read_events_stream,
    read_events_stream_staged,
    run_stream_to_memory,
    sessionized_stream,
    stateful_user_totals,
    stream_to_parquet_foreachbatch,
    rocksdb_state_store,
    tws_running_totals,
    windowed_counts,
)

__all__ = [
    "clicks_to_purchases_join",
    "read_events_stream",
    "read_events_stream_staged",
    "rocksdb_state_store",
    "run_stream_to_memory",
    "sessionized_stream",
    "stateful_user_totals",
    "stream_to_parquet_foreachbatch",
    "tws_running_totals",
    "windowed_counts",
]
