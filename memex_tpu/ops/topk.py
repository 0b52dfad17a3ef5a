"""XLA top-k scoring paths (exact oracle + hardware-accelerated approx).

All functions take pre-computed scores or (db, queries) pairs with
**unit-normalized** vectors, so inner product == cosine similarity — same
metric as the reference's DistCosine (lib/libmemex/src/storage/local.rs:101,
distance→similarity at :86).

Shapes are static everywhere; `count` masking handles partially-filled
index buffers without recompilation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)


def _mask_scores(scores: jnp.ndarray, count) -> jnp.ndarray:
    """Mask columns >= count (unfilled capacity rows) to -inf.

    scores: [Q, N]; count: scalar int (traced ok).
    """
    n = scores.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, scores.ndim - 1)
    return jnp.where(col < count, scores, NEG_INF)


def exact_topk(scores: jnp.ndarray, k: int, count=None):
    """Full-sort exact top-k. The recall oracle."""
    if count is not None:
        scores = _mask_scores(scores, count)
    return jax.lax.top_k(scores, k)


def blockwise_topk(scores: jnp.ndarray, k: int, count=None, block: int = 4096):
    """Two-stage exact top-k: per-block top-k, then top-k over block winners.

    Equivalent result to `exact_topk` (top-k of a set == top-k of the union
    of per-block top-k's) but sorts B small arrays instead of one huge one —
    much faster on TPU for N in the millions.
    """
    q, n = scores.shape
    if count is not None:
        scores = _mask_scores(scores, count)
    if n <= block:
        return jax.lax.top_k(scores, k)
    nblocks = -(-n // block)
    pad = nblocks * block - n
    if pad:
        scores = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=NEG_INF)
    blocked = scores.reshape(q, nblocks, block)
    vals, idx = jax.lax.top_k(blocked, min(k, block))  # [Q, B, k]
    base = (jnp.arange(nblocks, dtype=jnp.int32) * block)[None, :, None]
    idx = idx.astype(jnp.int32) + base
    vals = vals.reshape(q, -1)
    idx = idx.reshape(q, -1)
    fvals, fargs = jax.lax.top_k(vals, k)
    return fvals, jnp.take_along_axis(idx, fargs, axis=1)


def approx_topk(scores: jnp.ndarray, k: int, count=None, recall_target: float = 0.95):
    """Hardware-accelerated approximate top-k (TPU PartialReduce op via
    `lax.approx_max_k`) — the ScaNN-style scoring reducer."""
    if count is not None:
        scores = _mask_scores(scores, count)
    vals, idx = jax.lax.approx_max_k(scores, k, recall_target=recall_target)
    return vals, idx.astype(jnp.int32)


@partial(jax.jit, static_argnames=("k", "method", "block"))
def score_topk(
    db: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    count=None,
    method: str = "blockwise",
    block: int = 4096,
):
    """One-shot scoring: [N, D] x [Q, D] -> (vals [Q, k], idx [Q, k]).

    The matmul runs in bfloat16 on the MXU with float32 accumulation
    (preferred_element_type) — at unit-norm inputs bf16 mantissa error is
    ~1e-3, far below typical inter-candidate score gaps; the oracle path in
    tests quantifies this.
    """
    if method == "exact_f32":
        # Full-precision scoring for ground-truth oracles. HIGHEST is
        # load-bearing on TPU: a DEFAULT-precision f32 einsum downcasts
        # inputs to bf16 on the MXU, which made this "exact" oracle
        # ~8e-4-noisy at unit-norm — above real rank-10/11 boundary gaps
        # (measured 1e-3 min at 1M random), so true-top-10 answers from
        # the f32/refine tiers were being scored as misses (round 4).
        scores = jnp.einsum("qd,nd->qn", queries, db,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        return exact_topk(scores, k, count)
    scores = jnp.einsum(
        "qd,nd->qn",
        queries.astype(jnp.bfloat16),
        db.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    if method == "exact":
        return exact_topk(scores, k, count)
    if method == "approx":
        return approx_topk(scores, k, count)
    return blockwise_topk(scores, k, count, block=block)
