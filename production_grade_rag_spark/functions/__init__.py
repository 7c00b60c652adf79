from . import text, vector

__all__ = ["text", "vector"]
