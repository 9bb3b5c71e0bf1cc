from .incremental import stream_pipeline, stream_pipeline_memory_sink

__all__ = ["stream_pipeline", "stream_pipeline_memory_sink"]
