from .dedup_store_stream import (
    StreamingEmbeddingDedupLoader,
    StreamingIncrementalDedupLoader,
)
from .runner import StreamingScd2Loader, StreamingSilverLoader

__all__ = [
    "StreamingEmbeddingDedupLoader",
    "StreamingIncrementalDedupLoader",
    "StreamingScd2Loader",
    "StreamingSilverLoader",
]
