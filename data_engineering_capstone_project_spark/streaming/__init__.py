from data_engineering_capstone_project_spark.streaming.events import (
    EVENT_SCHEMA,
    dedup_events,
    run_available_now_to_memory,
    run_available_now_to_parquet,
    run_foreach_batch,
    session_aggregate,
    sliding_counts,
    stream_events_from_dir,
    tumbling_counts,
)

__all__ = [
    "EVENT_SCHEMA",
    "stream_events_from_dir",
    "dedup_events",
    "tumbling_counts",
    "sliding_counts",
    "session_aggregate",
    "run_available_now_to_memory",
    "run_available_now_to_parquet",
    "run_foreach_batch",
]
