"""int4 scan tier for the batch-union IVF kernel (ops/ivf_batch.py).

The 10M IVF scan is HBM-bound on the probed-cluster union read (~2 GB at
nprobe=64); int8 bucket bytes are the entire batch cost. This tier keeps
the index AUTHORITATIVE in int8 (all maintenance — fold, rebuild, save —
stays on the int8 table) and mirrors a packed int4 copy used only by the
scan: half the bytes. Recall is restored by an int8 rerank of each query's
candidate bank — the kernel keeps S=512 per-lane maxima per query, and
re-scoring the whole bank against the int8 table is a [Q, S, D] gather,
microscopic next to the scan.

Layout — ROW-PAIR packing, chunk-folded: data4 is [C, M/2, D] int8 where
byte (c, j*S2 + off, d) holds dim d of bucket rows j*S + off (hi nibble)
and j*S + S2 + off (lo nibble), S = chunk rows (banks*128), S2 = S/2 —
i.e. each S-row scan chunk is folded in half onto itself. Properties:

- chunk DMAs are CONTIGUOUS [S2, D] slices (a dim-pair layout [C, D/2, M]
  was tried first: its [D/2, S] slices are 512-byte strided runs that
  halve effective HBM bandwidth, and the 10M scan timed NO faster than
  int8 despite half the bytes);
- the byte is LINEAR, b = 16*hi + lo with both nibbles clipped to [-7, 7]
  (|b| <= 119 fits int8), so b is a valid MXU operand as-is and scoring
  needs ONE nibble extraction (the naive two-nibble unpack costs ~8 VPU
  ops/byte — more VPU than the chip has at HBM rate):
      even half  se = q . hi,        hi = (b+8)>>4
      odd half   so = q . b - 16*se
- score column ordering matches the int8 kernel exactly: column col of the
  [Q, S] chunk scores IS bucket row j*S + col (cols < S2 from se, the rest
  from so), so rscales slices and slot indices are unchanged.

Nibble extraction uses int32 shifts only — int8-dtype shifts crash Mosaic
(see ops/fused_topk.py).

Replaces hnsw_rs ef_search traversal (reference
lib/libmemex/src/storage/local.rs:71-91) at the 10M+ tier, same as
ops/ivf_batch.py; the int4 trick itself has no reference counterpart
(hnsw_rs stores f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ivf_batch import _chunk_walk, route_union

NEG_INF = -1e30
_LANES = 128


# -- packing ----------------------------------------------------------------


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("c_blk", "s_chunk"))
def _pack_into(out4, codes_i8, c0, *, c_blk: int, s_chunk: int):
    """Pack clusters [c0, c0+c_blk) of the int8 table into the DONATED
    [C, M/2, D] mirror in place. int4 code = round(int8/16) via (x+8)>>4
    (round-half-up; arithmetic shift floors negatives), clipped to [-7, 7]
    so the linear byte 16*hi + lo stays in int8 range. Each s_chunk-row
    chunk is folded in half: rows [0, S2) are hi nibbles, [S2, S) lo. c0
    is a traced scalar — ONE compile for the whole sweep (static slice
    offsets would recompile per block; dynamic_slice clamps the ragged
    tail identically on read and write, so a short tail just re-packs a
    few clusters)."""
    C, M, D = codes_i8.shape
    S, S2 = s_chunk, s_chunk // 2
    blk = jax.lax.dynamic_slice(codes_i8, (c0, 0, 0), (c_blk, M, D))
    q4 = jnp.clip((blk.astype(jnp.int32) + 8) >> 4, -7, 7)
    q4 = q4.reshape(c_blk, M // S, S, D)
    packed = (16 * q4[:, :, :S2] + q4[:, :, S2:]).astype(jnp.int8)
    return jax.lax.dynamic_update_slice(
        out4, packed.reshape(c_blk, M // 2, D), (c0, 0, 0))


def pack_int4_buckets(data_i8, rscales, c_blk: int = 64, banks: int = 4):
    """Device-side int8 -> packed-int4 bucket mirror.

    Returns (data4 [C, M/2, D] int8 row-pair packed, rscales4 [C, M] f32 =
    rscales*16). The mirror is written block-by-block into one donated
    buffer: peak extra HBM is the mirror (half the table) + ~c_blk*M*D*4
    bytes of int32 intermediates, never a second full copy (a
    jnp.concatenate of blocks would hold blocks + result simultaneously —
    OOM next to a 10M table)."""
    C, M, D = data_i8.shape
    S = banks * _LANES
    assert M % S == 0, f"bucket M={M} must be a multiple of chunk {S}"
    c_blk = min(c_blk, C)
    out4 = jnp.zeros((C, M // 2, D), jnp.int8)
    for c0 in range(0, C, c_blk):
        out4 = _pack_into(out4, data_i8, jnp.int32(min(c0, C - c_blk)),
                          c_blk=c_blk, s_chunk=S)
    return out4, rscales * 16.0


# -- kernel -------------------------------------------------------------------


def _kernel4(walk_ref, nchunk_ref, sizes_ref, q_ref, db_hbm,
             rs_hbm, *rest, M: int, banks: int, keep2: bool = False):
    if keep2:
        (out_v_ref, out_i_ref, out_v2_ref, out_i2_ref, buf, rsbuf,
         acc_v, acc_i, acc_v2, acc_i2, db_sems, rs_sems) = rest
    else:
        (out_v_ref, out_i_ref, buf, rsbuf, acc_v, acc_i,
         db_sems, rs_sems) = rest
    """ops/ivf_batch.py::_kernel with row-pair-packed int4 chunks: DMA a
    contiguous [S/2, D] slice (half the int8 bytes), extract ONE nibble,
    score both row halves via the deferred identity. Column ordering,
    rscales handling, and the precomputed walk (walk_ref[t] = cid*256 +
    chunk) are identical to the int8 kernel."""
    S = banks * _LANES
    S2 = S // 2
    Q = q_ref.shape[0]
    n_chunks = nchunk_ref[0]

    def db_dma(slot, t):
        w = walk_ref[t]
        return pltpu.make_async_copy(
            db_hbm.at[w >> 8, pl.ds((w & 255) * S2, S2)], buf.at[slot],
            db_sems.at[slot])

    def rs_dma(slot, t):
        w = walk_ref[t]
        return pltpu.make_async_copy(
            rs_hbm.at[w >> 8, :, pl.ds((w & 255) * S, S)], rsbuf.at[slot],
            rs_sems.at[slot])

    @pl.when(n_chunks > 0)
    def _start():
        db_dma(0, 0).start()
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
            rs_dma(nxt, t + 1).start()

        db_dma(slot, t).wait()
        rs_dma(slot, t).wait()

        w = walk_ref[t]
        cid = w >> 8
        j = w & 255
        csize = sizes_ref[cid]
        braw = buf[slot]                            # [S2, D] int8, linear
        hi = ((braw.astype(jnp.int32) + 8) >> 4).astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((), ()))
        se = jax.lax.dot_general(q_ref[:], hi, dimension_numbers=dn,
                                 preferred_element_type=jnp.float32)
        sraw = jax.lax.dot_general(q_ref[:], braw.astype(jnp.bfloat16),
                                   dimension_numbers=dn,
                                   preferred_element_type=jnp.float32)
        # [Q, S]: cols [0, S2) score rows j*S+col, cols [S2, S) rows
        # j*S+col — same ordering as the int8 kernel's chunk.
        scores = jnp.concatenate([se, sraw - 16.0 * se], axis=1)
        scores = scores * rsbuf[slot]
        base = j * S
        col = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
        scores = jnp.where(col + base < csize, scores, NEG_INF)

        # keep2: best-two-per-slot fold (see ivf_batch.py::_kernel).
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
                                              "keep2"))
def ivf_batch_topk4(data4, rscales4, sizes, cluster_list, n_active, queries,
                    k: int, *, banks: int = 4, interpret: bool = False,
                    keep2: bool = False):
    """(data4 [C, M/2, D] row-pair packed int4, rscales4 [C, M] f32 (int8
    scale x16), sizes [C] int32, cluster_list [C] int32 actives-first,
    n_active [1], queries [Q, D] f32) -> (vals [Q, k], cluster [Q, k],
    slot [Q, k])."""
    C, M2, D = data4.shape
    M = 2 * M2
    Q = queries.shape[0]
    S = banks * _LANES
    assert M % S == 0, f"cluster bucket M={M} must be a multiple of {S}"

    q_pad = max(8, -(-Q // 8) * 8)
    if q_pad != Q:
        queries = jnp.pad(queries, ((0, q_pad - Q), (0, 0)))
    q16 = queries.astype(jnp.bfloat16)
    rscales3 = rscales4.reshape(C, 1, M)

    sizes32 = sizes.astype(jnp.int32)
    walk, n_chunks = _chunk_walk(sizes32, cluster_list.astype(jnp.int32),
                                 n_active.astype(jnp.int32), M, S)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # walk, n_chunks, sizes
        grid=(1,),
        in_specs=[
            pl.BlockSpec((q_pad, D), lambda i, w, nc, sz: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # data4 stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # rscales stay in HBM
        ],
        out_specs=tuple(
            pl.BlockSpec((q_pad, S), lambda i, w, nc, sz: (0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4 if keep2 else 2)),
        scratch_shapes=[
            pltpu.VMEM((2, S // 2, D), jnp.int8),   # double-buffered chunk
            pltpu.VMEM((2, 1, S), jnp.float32),     # double-buffered scales
        ] + [
            pltpu.VMEM((q_pad, S), jnp.float32 if j % 2 == 0 else jnp.int32)
            for j in range(4 if keep2 else 2)
        ] + [
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel4, M=M, banks=banks, keep2=keep2)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((q_pad, S), jnp.float32 if j % 2 == 0
                                 else jnp.int32)
            for j in range(4 if keep2 else 2)),
        cost_estimate=pl.CostEstimate(
            flops=2 * q_pad * C * M * D,
            bytes_accessed=C * M * (D // 2 + 4)
            + 2 * (2 if keep2 else 1) * q_pad * S * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(walk, n_chunks, sizes32, q16, data4, rscales3)
    # keep2: second-best slot winners extend the bank to [Q, 2S].
    cand_v = jnp.concatenate(out[0::2], axis=1)
    cand_i = jnp.concatenate(out[1::2], axis=1)

    vals, args = jax.lax.top_k(cand_v[:Q], k)
    idx = jnp.take_along_axis(cand_i[:Q], args, axis=1)
    return vals, idx // M, idx % M


# -- int8 rerank of the int4 candidate bank -----------------------------------


@functools.partial(jax.jit, static_argnames=("k",))
def rerank_int8(data, rscales, queries, vals4, cl, sl, k: int):
    """Re-score int4-scan candidates against the AUTHORITATIVE int8 table
    and take the exact top-k of the re-scored set. (data [C, M, D] int8,
    rscales [C, M] f32, queries [Q, D] f32, vals4/cl/sl [Q, r]) ->
    (vals [Q, k], cluster [Q, k], slot [Q, k]). Candidates the int4 pass
    masked out (NEG_INF) stay masked."""
    C, M, D = data.shape
    flat = (cl * M + sl).astype(jnp.int32)          # [Q, r]
    rows = jnp.take(data.reshape(C * M, D), flat.reshape(-1), axis=0)
    rows = rows.reshape(*flat.shape, D)             # [Q, r, D] int8
    sc = jnp.einsum(
        "qrd,qd->qr",
        rows.astype(jnp.bfloat16),
        queries.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) * jnp.take(rscales.reshape(-1), flat)
    sc = jnp.where(vals4 <= NEG_INF / 2, NEG_INF, sc)
    vals, args = jax.lax.top_k(sc, k)
    return (vals, jnp.take_along_axis(cl, args, axis=1),
            jnp.take_along_axis(sl, args, axis=1))


@functools.partial(jax.jit,
                   static_argnames=("nprobe", "k", "rerank", "banks",
                                    "interpret", "keep2"))
def _ivf_batch_search4(centroids, data4, rscales4, data, rscales, sizes,
                       queries, prune_margin, nprobe: int, k: int,
                       rerank: int | None = None, banks: int = 4,
                       interpret: bool = False, keep2: bool = False):
    S = (2 if keep2 else 1) * banks * _LANES
    clist, nact = route_union(centroids, queries, nprobe,
                              prune_margin=prune_margin)
    r = S if rerank is None else min(max(rerank * k, 64), S)
    v4, cl, sl = ivf_batch_topk4(data4, rscales4, sizes, clist, nact,
                                 queries, r, banks=banks, interpret=interpret,
                                 keep2=keep2)
    return rerank_int8(data, rscales, queries, v4, cl, sl, k)


def ivf_batch_search4(centroids, data4, rscales4, data, rscales, sizes,
                      queries, nprobe: int, k: int, rerank: int | None = None,
                      banks: int = 4, prune_margin: float | None = None,
                      interpret: bool = False, keep2: bool = False):
    """Routing + dedupe + int4 batch-union scan + int8 rerank in one jit.

    By default the ENTIRE candidate bank (S = banks*128 per-lane maxima) is
    re-scored against the int8 table — a [Q, S, D] int8 gather + batched
    matvec, microscopic next to the scan — so the int4 pass only has to get
    bank MEMBERSHIP right, not ranking (measured on near-tie corpora:
    top-10 overlap vs the int8 kernel 0.95 full-bank vs 0.77 at r=64).
    Pass `rerank` to narrow the re-scored set to min(max(rerank*k, 64), S).
    `prune_margin` is a DYNAMIC f32 scalar (None -> 4.0 keep-all sentinel):
    retuning the pruning operating point reuses the compiled kernel."""
    margin = 4.0 if prune_margin is None else prune_margin
    return _ivf_batch_search4(centroids, data4, rscales4, data, rscales,
                              sizes, queries, margin, nprobe=nprobe, k=k,
                              rerank=rerank, banks=banks, interpret=interpret,
                              keep2=keep2)
