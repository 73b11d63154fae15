from . import multimodal
from .datasheet import corpus_datasheet

__all__ = ["corpus_datasheet", "multimodal"]
