from .events import sessionize, stream_dedup, stream_sliding_counts, stream_tumbling_counts
from .stateful import running_user_profile

__all__ = [
    "sessionize",
    "stream_dedup",
    "stream_sliding_counts",
    "stream_tumbling_counts",
    "running_user_profile",
]
