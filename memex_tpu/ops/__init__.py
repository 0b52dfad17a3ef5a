"""TPU compute kernels for the retrieval data plane.

The reference's scoring path is hnsw_rs graph traversal on CPU SIMD
(lib/libmemex/src/storage/local.rs:71-91). Here scoring is brute-force
MIPS/cosine on the MXU:

- `topk`: XLA paths — exact `lax.top_k`, two-stage blockwise exact, and
  hardware `lax.approx_max_k` (TPU PartialReduce op).
- `fused_topk`: Pallas kernel fusing the [Q,D]x[D,N] block matmul with a
  running top-k candidate accumulator held in VMEM, so [Q,N] scores are
  never materialized in HBM (the bandwidth bottleneck at 1M+ vectors).
"""

from .topk import exact_topk, blockwise_topk, approx_topk, score_topk
from .fused_topk import fused_score_topk

__all__ = [
    "exact_topk",
    "blockwise_topk",
    "approx_topk",
    "score_topk",
    "fused_score_topk",
]
