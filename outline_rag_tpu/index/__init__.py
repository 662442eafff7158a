"""Device-resident vector index.

Replaces the reference's pgvector table + HNSW index
(``langchain_pg_embedding``, reference ``app/database.py:118-139``) with
capacity-padded embedding matrices living in TPU HBM, mutated by
delta-append / tombstone / compaction instead of SQL DELETE+INSERT
(reference ``app/rag.py:216-235``).
"""

from outline_rag_tpu.index.shard import DeviceShard, ShardState
from outline_rag_tpu.index.store import VectorIndex

__all__ = ["DeviceShard", "ShardState", "VectorIndex"]
