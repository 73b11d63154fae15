from .merge import keep_latest, merge

__all__ = ["merge", "keep_latest"]
