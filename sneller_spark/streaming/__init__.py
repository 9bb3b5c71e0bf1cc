from .incremental import (
    stateful_source_totals,
    stream_pipeline,
    stream_pipeline_memory_sink,
)

__all__ = ["stream_pipeline", "stream_pipeline_memory_sink", "stateful_source_totals"]
