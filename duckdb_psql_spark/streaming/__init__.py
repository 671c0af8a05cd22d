from .events import sessionize, stream_tumbling_counts

__all__ = ["stream_tumbling_counts", "sessionize"]
