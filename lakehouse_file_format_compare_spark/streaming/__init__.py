from .corpus_build_stream import StreamingCorpusBuildLoader
from .dedup_store_stream import (
    StreamingEmbeddingDedupLoader,
    StreamingIncrementalDedupLoader,
)
from .eval_stream import StreamingAucMonitor
from .lm_stream import StreamingPerplexityScorer
from .tokenizer_stream import StreamingTokenizerMonitor
from .runner import StreamingScd2Loader, StreamingSilverLoader

__all__ = [
    "StreamingAucMonitor",
    "StreamingCorpusBuildLoader",
    "StreamingEmbeddingDedupLoader",
    "StreamingIncrementalDedupLoader",
    "StreamingPerplexityScorer",
    "StreamingTokenizerMonitor",
    "StreamingScd2Loader",
    "StreamingSilverLoader",
]
