"""Mesh parallelism: row-sharded scoring with cross-shard top-K merge.

The reference has no device parallelism; its concurrency is Redis queues
across uvicorn workers (SURVEY.md section 2c). The TPU-native equivalent is
a ``jax.sharding.Mesh`` with the corpus row-sharded across devices: each
device scores its rows and selects a local top-K, then a single
``all_gather`` over ICI merges the per-shard lists into the global top-K.
"""

from outline_rag_tpu.parallel.mesh import data_mesh, row_sharding
from outline_rag_tpu.parallel.query import sharded_topk

__all__ = ["data_mesh", "row_sharding", "sharded_topk"]
