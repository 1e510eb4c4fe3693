from .store import NumpyVectorStore, PgVectorStore, RetrievalRecord
from .combiner import Combiner
from .embedder import RetrievalEmbedder

__all__ = ["NumpyVectorStore", "PgVectorStore", "RetrievalRecord",
           "Combiner", "RetrievalEmbedder"]
