from . import generate, gold, ingest

__all__ = ["generate", "ingest", "gold"]
