from .dedup_store_stream import (
    StreamingEmbeddingDedupLoader,
    StreamingIncrementalDedupLoader,
)
from .lm_stream import StreamingPerplexityScorer
from .runner import StreamingScd2Loader, StreamingSilverLoader

__all__ = [
    "StreamingEmbeddingDedupLoader",
    "StreamingIncrementalDedupLoader",
    "StreamingPerplexityScorer",
    "StreamingScd2Loader",
    "StreamingSilverLoader",
]
