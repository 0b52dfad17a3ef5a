"""Synthetic corpora for recall/QPS benchmarking.

Two regimes:
  - `uniform`: iid unit vectors — IVF's worst case, flat's neutral case;
  - `clustered`: mixture-of-gaussians on the sphere — the realistic regime
    for sentence embeddings (what MiniLM output actually looks like).

Queries are perturbed corpus rows (`query_noise`), matching the semantic-
search workload where queries are near their relevant documents.
"""

from __future__ import annotations

import numpy as np


def unit_rows(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def make_corpus(
    n: int,
    dim: int = 384,
    kind: str = "clustered",
    n_centers: int = 256,
    center_noise: float = 0.75,
    seed: int = 0,
) -> np.ndarray:
    """`center_noise` is the NORM of the per-point offset (the per-dim
    stddev is center_noise/sqrt(dim)); cos(point, center) ~ 1/sqrt(1+cn^2),
    so 0.75 -> ~0.8, matching intra-topic similarity of real sentence
    embeddings. (An un-normalized per-dim stddev would drown the centers
    at high dim and silently degenerate to the uniform regime.)"""
    rng = np.random.default_rng(seed)
    if kind == "uniform":
        return unit_rows(rng.standard_normal((n, dim), dtype=np.float32))
    centers = unit_rows(rng.standard_normal((n_centers, dim), dtype=np.float32))
    assign = rng.integers(0, n_centers, size=n)
    sigma = center_noise / np.sqrt(dim)
    x = centers[assign] + sigma * rng.standard_normal((n, dim)).astype(np.float32)
    return unit_rows(x)


def make_queries(
    corpus: np.ndarray, q: int, query_noise: float = 0.5, seed: int = 1
) -> np.ndarray:
    """`query_noise` is the offset norm (see make_corpus)."""
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, corpus.shape[0], size=q)
    sigma = query_noise / np.sqrt(corpus.shape[1])
    x = corpus[rows] + sigma * rng.standard_normal(
        (q, corpus.shape[1])
    ).astype(np.float32)
    return unit_rows(x)


def oracle_topk(corpus: np.ndarray, queries: np.ndarray, k: int) -> np.ndarray:
    """Exact f32 numpy ground truth [Q, k] (blocked to bound memory)."""
    out = np.empty((queries.shape[0], k), np.int64)
    B = 8192
    scores = np.empty((queries.shape[0], corpus.shape[0]), np.float32)
    for s in range(0, corpus.shape[0], B):
        scores[:, s : s + B] = queries @ corpus[s : s + B].T
    out[:] = np.argpartition(-scores, k, axis=1)[:, :k]
    # order within top-k
    row = np.arange(queries.shape[0])[:, None]
    order = np.argsort(-scores[row, out], axis=1)
    return out[row, order]
