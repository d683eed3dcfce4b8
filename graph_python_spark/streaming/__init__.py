from graph_python_spark.streaming.streams import (
    stream_degree_counts,
    stream_windowed_events,
)

__all__ = ["stream_degree_counts", "stream_windowed_events"]
