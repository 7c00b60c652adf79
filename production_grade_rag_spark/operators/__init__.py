from . import (
    attribution,
    budget,
    chunking,
    dedup,
    embedding,
    fusion,
    multimodal,
    similarity,
    textstats,
)

__all__ = [
    "attribution",
    "budget",
    "chunking",
    "dedup",
    "embedding",
    "fusion",
    "multimodal",
    "similarity",
    "textstats",
]
