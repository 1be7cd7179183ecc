from sagan_spark.streaming.engine import StreamingSaganEngine, pages_stream_frame

__all__ = ["StreamingSaganEngine", "pages_stream_frame"]
