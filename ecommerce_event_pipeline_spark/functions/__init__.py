from . import dedup, similarity, text

__all__ = ["dedup", "similarity", "text"]
