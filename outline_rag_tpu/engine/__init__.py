"""The query engine: embed -> score -> top-K -> rerank as one device program.

Replaces the reference's retriever pipeline
(``ContextualCompressionRetriever`` = pgvector top-K then remote rerank,
reference ``app/rag.py:85-99`` + ``app/blueprints/api.py:112-149``), which
crosses the network twice per query, with a single XLA computation over
device-resident state (SURVEY.md section 3.1: "embed->retrieve->rerank
collapses into one XLA program invocation").
"""

from outline_rag_tpu.engine.embedder import EncoderEmbedder, get_embedder
from outline_rag_tpu.engine.rerank import CrossEncoderReranker, NoopReranker
from outline_rag_tpu.engine.service import RetrievalService, RetrievedChunk

__all__ = [
    "EncoderEmbedder",
    "get_embedder",
    "CrossEncoderReranker",
    "NoopReranker",
    "RetrievalService",
    "RetrievedChunk",
]
