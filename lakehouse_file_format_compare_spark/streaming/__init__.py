from .runner import StreamingScd2Loader, StreamingSilverLoader

__all__ = ["StreamingScd2Loader", "StreamingSilverLoader"]
