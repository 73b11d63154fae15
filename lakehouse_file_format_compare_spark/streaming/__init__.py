from .runner import StreamingSilverLoader

__all__ = ["StreamingSilverLoader"]
