from .dedup_store_stream import StreamingIncrementalDedupLoader
from .runner import StreamingScd2Loader, StreamingSilverLoader

__all__ = [
    "StreamingIncrementalDedupLoader",
    "StreamingScd2Loader",
    "StreamingSilverLoader",
]
