from .incremental import (
    stateful_source_totals,
    stream_pipeline,
    stream_pipeline_memory_sink,
    watermarked_window_counts,
)

__all__ = [
    "stream_pipeline",
    "stream_pipeline_memory_sink",
    "stateful_source_totals",
    "watermarked_window_counts",
]
