from dgraph_dbpedia_spark.streaming.events import (
    EVENTS_SCHEMA,
    read_events_stream,
    tumbling_counts,
    sliding_counts,
    sessionize_batch,
    sessionize_stream,
    run_to_memory,
)

__all__ = [
    "EVENTS_SCHEMA",
    "read_events_stream",
    "tumbling_counts",
    "sliding_counts",
    "sessionize_batch",
    "sessionize_stream",
    "run_to_memory",
]
