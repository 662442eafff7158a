"""outline_rag_tpu — a TPU-native retrieval-augmented-generation framework.

Re-implements the capabilities of the Outline-RAG reference service
(FastAPI RAG chat over an Outline wiki) with the retrieval core rebuilt as a
device-resident JAX/XLA/Pallas index-and-query engine:

- ``ops``      : Pallas kernels — tiled cosine matmul with fused top-K select,
                 int8/bf16 quantized scoring (replaces pgvector HNSW/exact SQL).
- ``index``    : mutable device-resident embedding shards with delta-append /
                 tombstone / compaction semantics (replaces Postgres upserts).
- ``models``   : on-TPU XLM-RoBERTa-family encoder (BGE-m3 class) and
                 cross-encoder reranker forward passes (replace remote
                 SiliconFlow embedding / rerank APIs).
- ``parallel`` : jax.sharding Mesh row-parallel scoring with cross-shard
                 top-K merge over ICI collectives.
- ``engine``   : the fused query program (embed -> score -> top-K -> rerank)
                 plus a continuous micro-batcher for concurrent queries.
- ``sync``     : Outline wiki delta-sync protocol (updatedAt diff, webhook
                 debounce, batch ingestion) feeding the device index.
- ``storage``  : metadata/document stores and the coordination bus
                 (locks/queues/counters) with sqlite/in-memory backends.
- ``serve``    : first-party asyncio HTTP/SSE server and the ``/chat`` API
                 surface (conversations, messages, ask-with-citations, OIDC).

See SURVEY.md at the repo root for the reference structural analysis this
framework is built to (component inventory in SURVEY.md section 2).
"""

__version__ = "0.1.0"
