from parquet_converters_spark.streaming.events import (  # noqa: F401
    windowed_event_counts,
    read_events_stream,
    sessionize,
)
