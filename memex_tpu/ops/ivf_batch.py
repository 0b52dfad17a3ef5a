"""Batched IVF probe-scan: one pass over the UNION of probed clusters.

The per-query kernel (ops/ivf_scan.py) reads, for every query, each of its
`nprobe` clusters — so a cluster probed by j queries is DMA'd j times. The
scan is HBM-bound (measured ~85% of speed-of-light at 10M rows), so those
repeat reads are the entire cost. This kernel inverts the loop: the host of
the batch routes every query, dedupes the probed clusters ON DEVICE into an
ascending `cluster_list` (+ active count), and the kernel streams each
unique cluster ONCE, scoring it against the WHOLE query block on the MXU.

Semantics are batch-union IVF: every query is scored against the union of
the batch's probed clusters, a superset of its own probes — recall is >=
strict per-query IVF at identical nprobe (extra candidates are real rows
with exact scores). Bytes read: |union| * M * D <= Q * nprobe * M * D, with
equality only when no two queries share a cluster; for clustered query
workloads the union saturates at C and per-batch cost goes FLAT while QPS
scales linearly with Q.

Compute check (v5e, C=4096, M=3840, D=384, bf16): scoring all Q queries per
cluster costs Q*M*D*2 FLOPs against M*D bytes of DMA — the MXU runs out of
HBM before it runs out of FLOPs until Q ~ 256, so the batch stays
bandwidth-bound and the extra scoring is free.

Kernel shape: grid (1,), hand-rolled double-buffered cluster DMAs driven by
the scalar-prefetched cluster list, dynamic fori_loop over the active
count, per-lane maxima slot banks (ops/fused_topk.py scheme) in VMEM.
Replaces hnsw_rs ef_search traversal (reference
lib/libmemex/src/storage/local.rs:71-91) at the 10M-100M tier.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_LANES = 128


def route_union(centroids, queries, nprobe: int,
                prune_margin: float | None = None):
    """Route a query batch and dedupe its probed clusters.

    (centroids [C, D], queries [Q, D]) -> (cluster_list [C] int32 — active
    cluster ids ascending, inactive ids after; n_active [1] int32). f32
    routing: bf16 would misroute probes on near-tied centroid scores.

    prune_margin (cosine units, opt-in): a fixed nprobe forces every query
    to read its full long tail of low-scoring probes even when the query
    sits squarely inside one topic cluster. With a margin, a probe counts
    only while its centroid score is within `prune_margin` of that query's
    BEST centroid — the scan is HBM-bound on the probed-union bytes, so
    dropped clusters convert ~1:1 into throughput. nprobe stays the hard
    upper bound (recall can only approach strict-nprobe from below; tune
    the margin against a recall target — tests pin >=97% of the unpruned
    recall at >=25% fewer clusters on clustered corpora)."""
    C = centroids.shape[0]
    qc = jnp.einsum("qd,cd->qc", queries, centroids,
                    preferred_element_type=jnp.float32)
    top_vals, probes = jax.lax.top_k(qc, nprobe)  # [Q, nprobe]
    # The margin may be a DYNAMIC scalar (traced), so serving can retune
    # the pruning operating point without recompiling. None -> 4.0, the
    # keep-all sentinel: cosine scores span [-1, 1], so no probe can trail
    # the best by more than 2 and the where() folds to identity.
    margin = jnp.asarray(4.0 if prune_margin is None else prune_margin,
                         jnp.float32)
    keep = top_vals >= top_vals[:, :1] - margin
    probes = jnp.where(keep, probes, C)  # OOB -> dropped by the scatter
    mask = jnp.zeros((C,), jnp.int32).at[probes.reshape(-1)].set(1, mode="drop")
    # Actives first (ascending id = ascending HBM address), inactives after.
    order = jnp.argsort(jnp.where(mask > 0, jnp.arange(C), C + jnp.arange(C)))
    return order.astype(jnp.int32), jnp.sum(mask, keepdims=True)


def _chunk_walk(sizes32, cluster_list, n_active, M: int, S: int):
    """Flattened (cluster, chunk) DMA walk, precomputed so the kernel's
    scalar core does two SMEM loads per chunk instead of successor
    arithmetic. Returns (walk [C*(M//S)] int32 packed cid*256+chunk,
    n_chunks [1] int32). Entries past n_chunks are clamped garbage the
    loop never reads. The chunk index is packed into 8 bits, so M/S must
    be <= 256 — enforced here (the builders round M to S multiples but a
    load-time `M = max(M, counts.max())` with one hot cluster could exceed
    it; a silent clip would re-scan chunk 255 and lose recall)."""
    assert M // S <= 256, (
        f"bucket M={M} has {M // S} chunks of {S}; the packed walk carries "
        f"at most 256 — raise n_clusters or chunk width")
    C = sizes32.shape[0]
    T = C * (M // S)
    chunks_per = jnp.maximum(1, (sizes32 + S - 1) // S)
    chunks_act = jnp.where(jnp.arange(C) < n_active[0],
                           jnp.take(chunks_per, cluster_list), 0)
    cum = jnp.cumsum(chunks_act)                       # [C]
    n_chunks = cum[-1:]
    t_iota = jnp.arange(T, dtype=jnp.int32)
    p = jnp.minimum(jnp.searchsorted(cum, t_iota, side="right"),
                    C - 1).astype(jnp.int32)           # walk pos -> list pos
    start = cum - chunks_act                           # first t of cluster p
    cid = jnp.take(cluster_list, p)
    j = t_iota - jnp.take(start, p)
    return (cid * 256 + jnp.clip(j, 0, 255)).astype(jnp.int32), \
        n_chunks.astype(jnp.int32)


def _kernel(walk_ref, nchunk_ref, sizes_ref, q_ref, db_hbm, rs_hbm,
            *rest, M: int, banks: int, scaled: bool,
            exact: bool = False, keep2: bool = False):
    if keep2:
        (out_v_ref, out_i_ref, out_v2_ref, out_i2_ref, buf, rsbuf,
         acc_v, acc_i, acc_v2, acc_i2, db_sems, rs_sems) = rest
    else:
        (out_v_ref, out_i_ref, buf, rsbuf, acc_v, acc_i,
         db_sems, rs_sems) = rest
    """Chunked variable-length streaming: each active cluster is read in
    CHUNK(=S)-row pieces, stopping at ceil(size/CHUNK) — scan bytes track
    LIVE rows, not the padded bucket M, so bucket_factor stops costing
    bandwidth. The flattened (cluster, chunk) walk is PRECOMPUTED on
    device (walk_ref[t] = cid*256 + chunk, scalar-prefetched): the loop
    body does two SMEM loads instead of the successor arithmetic a carried
    (cluster, chunk) pair needs — the scan is partly scalar-core-bound on
    per-chunk work, so every op in the body is paid n_chunks times."""
    S = banks * _LANES  # == CHUNK
    Q = q_ref.shape[0]
    n_chunks = nchunk_ref[0]

    def db_dma(slot, t):
        w = walk_ref[t]
        return pltpu.make_async_copy(
            db_hbm.at[w >> 8, pl.ds((w & 255) * S, S)], buf.at[slot],
            db_sems.at[slot])

    def rs_dma(slot, t):
        w = walk_ref[t]
        return pltpu.make_async_copy(
            rs_hbm.at[w >> 8, :, pl.ds((w & 255) * S, S)], rsbuf.at[slot],
            rs_sems.at[slot])

    @pl.when(n_chunks > 0)
    def _start():
        db_dma(0, 0).start()
        if scaled:
            rs_dma(0, 0).start()

    acc_v[:] = jnp.full((Q, S), NEG_INF, jnp.float32)
    acc_i[:] = jnp.zeros((Q, S), jnp.int32)
    if keep2:
        acc_v2[:] = jnp.full((Q, S), NEG_INF, jnp.float32)
        acc_i2[:] = jnp.zeros((Q, S), jnp.int32)

    def body(t, carry):
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)

        @pl.when(t + 1 < n_chunks)
        def _prefetch():
            db_dma(nxt, t + 1).start()
            if scaled:
                rs_dma(nxt, t + 1).start()

        db_dma(slot, t).wait()
        if scaled:
            rs_dma(slot, t).wait()

        w = walk_ref[t]
        cid = w >> 8
        j = w & 255
        csize = sizes_ref[cid]
        # [Q, S] on the MXU: the whole query block vs one chunk. exact
        # mode (f32 storage only) keeps f32 inputs and runs the MXU
        # multi-pass decomposition — the scan is HBM-bound at ~18% compute
        # peak, so the extra passes ride in the bandwidth shadow, and the
        # slot fold then selects by EXACT scores (bf16 inputs misrank
        # near-tie corpora whose top-k gaps undercut an 8-bit mantissa).
        scores = jax.lax.dot_general(
            q_ref[:],                             # [Q, D] bf16 (f32: exact)
            buf[slot] if exact else buf[slot].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.HIGHEST if exact
                       else jax.lax.Precision.DEFAULT),
        )
        if scaled:
            scores = scores * rsbuf[slot]
        base = j * S
        col = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
        scores = jnp.where(col + base < csize, scores, NEG_INF)

        # CHUNK == S: exactly one lane-aligned fold per chunk, straight
        # into the accumulator (no reshape relayout; see fused_topk.py).
        # keep2 keeps the best TWO rows per slot (fused_topk._fold_chunks
        # rationale: two true top-k rows at positions congruent mod S
        # shadow each other in a single-winner fold, and no rerank depth
        # recovers the loser — the pair update is exact because each
        # chunk contributes one candidate per slot).
        cidx = cid * M + base + col
        take = scores > acc_v[:]
        if keep2:
            dem_v = jnp.where(take, acc_v[:], scores)
            dem_i = jnp.where(take, acc_i[:], cidx)
            take2 = dem_v > acc_v2[:]
            acc_v2[:] = jnp.where(take2, dem_v, acc_v2[:])
            acc_i2[:] = jnp.where(take2, dem_i, acc_i2[:])
        acc_v[:] = jnp.where(take, scores, acc_v[:])
        acc_i[:] = jnp.where(take, cidx, acc_i[:])
        return carry

    jax.lax.fori_loop(0, n_chunks, body, jnp.int32(0))
    out_v_ref[:] = acc_v[:]
    out_i_ref[:] = acc_i[:]
    if keep2:
        out_v2_ref[:] = acc_v2[:]
        out_i2_ref[:] = acc_i2[:]


@functools.partial(jax.jit, static_argnames=("k", "banks", "interpret",
                                              "exact", "keep2"))
def ivf_batch_topk(data, rscales, sizes, cluster_list, n_active, queries,
                   k: int, *, banks: int = 4, interpret: bool = False,
                   exact: bool = False, keep2: bool = False):
    """(data [C,M,D] (f32/bf16/int8), rscales [C,M] f32, sizes [C] int32,
    cluster_list [C] int32 actives-first, n_active [1] int32, queries
    [Q,D] f32) -> (vals [Q,k], cluster [Q,k], slot [Q,k])."""
    C, M, D = data.shape
    Q = queries.shape[0]
    S = banks * _LANES  # chunk rows
    assert M % S == 0, f"cluster bucket M={M} must be a multiple of {S}"
    scaled = data.dtype == jnp.int8
    exact = exact and data.dtype == jnp.float32  # exact mode needs f32 rows

    q_pad = max(8, -(-Q // 8) * 8)
    if q_pad != Q:
        queries = jnp.pad(queries, ((0, q_pad - Q), (0, 0)))
    q16 = queries.astype(jnp.float32 if exact else jnp.bfloat16)
    rscales3 = rscales.reshape(C, 1, M)

    # Flattened chunk walk, precomputed: ceil(size/S) chunks per active
    # cluster (empty active clusters still cost one masked chunk), packed
    # as walk[t] = cid*256 + chunk_index (M/S <= 255 by construction).
    sizes32 = sizes.astype(jnp.int32)
    walk, n_chunks = _chunk_walk(sizes32, cluster_list.astype(jnp.int32),
                                 n_active.astype(jnp.int32), M, S)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # walk, n_chunks, sizes
        grid=(1,),
        in_specs=[
            pl.BlockSpec((q_pad, D), lambda i, w, nc, sz: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # data stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # rscales stay in HBM
        ],
        out_specs=tuple(
            pl.BlockSpec((q_pad, S), lambda i, w, nc, sz: (0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4 if keep2 else 2)),
        scratch_shapes=[
            pltpu.VMEM((2, S, D), data.dtype),      # double-buffered chunk
            pltpu.VMEM((2, 1, S), jnp.float32),     # double-buffered scales
        ] + [
            pltpu.VMEM((q_pad, S), jnp.float32 if j % 2 == 0 else jnp.int32)
            for j in range(4 if keep2 else 2)
        ] + [
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel, M=M, banks=banks, scaled=scaled,
                               exact=exact, keep2=keep2)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((q_pad, S), jnp.float32 if j % 2 == 0
                                 else jnp.int32)
            for j in range(4 if keep2 else 2)),
        cost_estimate=pl.CostEstimate(
            flops=2 * q_pad * C * M * D,
            bytes_accessed=C * M * (D * data.dtype.itemsize + 4)
            + 2 * (2 if keep2 else 1) * q_pad * S * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(walk, n_chunks, sizes32, q16, data, rscales3)
    # keep2: second-best slot winners extend the bank to [Q, 2S].
    cand_v = jnp.concatenate(out[0::2], axis=1)
    cand_i = jnp.concatenate(out[1::2], axis=1)

    vals, args = jax.lax.top_k(cand_v[:Q], k)
    idx = jnp.take_along_axis(cand_i[:Q], args, axis=1)
    return vals, idx // M, idx % M


@functools.partial(jax.jit, static_argnames=("nprobe", "k", "banks",
                                              "interpret", "exact", "keep2"))
def _ivf_batch_search(centroids, data, rscales, sizes, queries, prune_margin,
                      nprobe: int, k: int, banks: int = 4,
                      interpret: bool = False, exact: bool = False,
                      keep2: bool = False):
    clist, nact = route_union(centroids, queries, nprobe,
                              prune_margin=prune_margin)
    return ivf_batch_topk(data, rscales, sizes, clist, nact, queries, k,
                          banks=banks, interpret=interpret, exact=exact,
                          keep2=keep2)


def ivf_batch_search(centroids, data, rscales, sizes, queries,
                     nprobe: int, k: int, banks: int = 4,
                     prune_margin: float | None = None,
                     interpret: bool = False, exact: bool = False,
                     keep2: bool = False):
    """Routing + dedupe + the batch-union kernel in one jit.

    `prune_margin` enters the executable as a DYNAMIC f32 scalar (None ->
    the 4.0 keep-all sentinel), so sweeping or retuning the pruning
    operating point at serve time reuses one compiled kernel instead of
    paying a multi-minute tunnel recompile per margin value."""
    margin = 4.0 if prune_margin is None else prune_margin
    return _ivf_batch_search(centroids, data, rscales, sizes, queries,
                             margin, nprobe=nprobe, k=k, banks=banks,
                             interpret=interpret, exact=exact, keep2=keep2)
