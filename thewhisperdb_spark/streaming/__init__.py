from thewhisperdb_spark.streaming.jobs import (  # noqa: F401
    sessionize_stream,
    sessionize_with_state,
    stream_events_from_dir,
    windowed_event_counts,
)
