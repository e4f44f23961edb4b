from pyveb_spark.streaming.stream import (
    foreach_batch_upsert,
    read_file_stream,
    run_available_now,
    session_window_agg,
    stateful_dedup,
    stateful_running_totals,
    stream_enrich,
    stream_interval_join,
    windowed_agg,
)

__all__ = [
    "foreach_batch_upsert",
    "read_file_stream",
    "run_available_now",
    "session_window_agg",
    "stateful_dedup",
    "stateful_running_totals",
    "stream_enrich",
    "stream_interval_join",
    "windowed_agg",
]
