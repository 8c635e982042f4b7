from . import similarity, vectors, textfns

__all__ = ["similarity", "vectors", "textfns"]
