from . import multimodal

__all__ = ["multimodal"]
