"""TPU compute kernels for the retrieval core.

``topk``  — tiled cosine-similarity matmul with a fused top-K select
            (replaces the pgvector cosine top-K SQL, reference
            ``app/database.py:137-138`` + ``app/rag.py:85-87``).
``quant`` — per-row int8 quantization and quantized scoring.
"""

from outline_rag_tpu.ops.topk import (
    cosine_topk,
    join_bf16x2,
    merge_topk,
    split_f32_bf16x2,
    topk_pallas,
    topk_xla,
)
from outline_rag_tpu.ops.quant import (
    dequantize_rows_int8,
    int8_topk,
    quantize_rows_int8,
)

__all__ = [
    "cosine_topk",
    "merge_topk",
    "topk_pallas",
    "topk_xla",
    "split_f32_bf16x2",
    "join_bf16x2",
    "quantize_rows_int8",
    "dequantize_rows_int8",
    "int8_topk",
]
