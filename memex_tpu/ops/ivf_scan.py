"""Pallas IVF probe-scan kernel: scalar-prefetched cluster streaming.

The IVF hot loop reads, for every query, the `nprobe` clusters its routing
picked — a data-dependent gather. The XLA formulation (jnp.take of
[Q, M, D] per probe step + einsum) runs far below HBM bandwidth because
the gather can't be pipelined against compute. Here the probe table is a
SCALAR-PREFETCH argument: the BlockSpec index_map reads `probes[q, p]` to
pick which [M, D] cluster block the next grid step DMAs, so Mosaic
double-buffers cluster fetches exactly like a dense scan — the flagship
PrefetchScalarGridSpec pattern.

Grid (Q, nprobe), one cluster-vs-one-query matvec per step; per-query
running (value, index) slot banks in VMEM (same per-lane maxima scheme as
ops/fused_topk.py); flush at the last probe. Cluster bucket size M must
be a multiple of banks*128 (index build rounds it up).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_LANES = 128


def _kernel_manual(probes_ref, sizes_ref, q_ref, db_hbm, rs_hbm,
                   out_v_ref, out_i_ref, buf, rsbuf, acc_v, acc_i,
                   db_sems, rs_sems, *, M: int, banks: int, scaled: bool,
                   nprobe: int):
    """Grid (Q,): the probe loop runs INSIDE the kernel with hand-rolled
    double-buffered cluster DMAs. The (Q, nprobe) grid version paid ~40us
    of fixed cost per grid step (measured: 170ms for 4000 steps at 1M),
    dwarfing the ~1us cluster fetch; here there is one grid step per query
    and nprobe pipelined fetches within it."""
    q = pl.program_id(0)
    S = banks * _LANES
    G = M // S

    def db_dma(slot, p):
        cid = probes_ref[q, p]
        return pltpu.make_async_copy(db_hbm.at[cid], buf.at[slot], db_sems.at[slot])

    def rs_dma(slot, p):
        cid = probes_ref[q, p]
        return pltpu.make_async_copy(rs_hbm.at[cid], rsbuf.at[slot], rs_sems.at[slot])

    db_dma(0, 0).start()
    if scaled:
        rs_dma(0, 0).start()
    acc_v[:] = jnp.full((1, S), NEG_INF, jnp.float32)
    acc_i[:] = jnp.zeros((1, S), jnp.int32)

    def loop_body(p, _):
        slot = jax.lax.rem(p, 2)
        nxt = jax.lax.rem(p + 1, 2)

        @pl.when(p + 1 < nprobe)
        def _():
            db_dma(nxt, p + 1).start()
            if scaled:
                rs_dma(nxt, p + 1).start()

        db_dma(slot, p).wait()
        if scaled:
            rs_dma(slot, p).wait()

        cid = probes_ref[q, p]
        csize = sizes_ref[cid]
        scores = jax.lax.dot_general(
            q_ref[0].astype(jnp.bfloat16),       # [1, D]
            buf[slot].astype(jnp.bfloat16),      # [M, D]
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                         # [1, M]
        if scaled:
            scores = scores * rsbuf[slot]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
        scores = jnp.where(col < csize, scores, NEG_INF)

        # Unrolled chunk fold (no [1, G, S] reshape, which relayouts every
        # score lane<->sublane; see fused_topk.py for the measured effect).
        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
        av, ai = acc_v[:], acc_i[:]
        for g in range(G):
            chunk = scores[:, g * S : (g + 1) * S]
            take = chunk > av
            av = jnp.where(take, chunk, av)
            ai = jnp.where(take, cid * M + g * S + slot_iota, ai)
        acc_v[:] = av
        acc_i[:] = ai
        return _

    jax.lax.fori_loop(0, nprobe, loop_body, None)
    out_v_ref[0] = acc_v[:]
    out_i_ref[0] = acc_i[:]


@functools.partial(jax.jit, static_argnames=("k", "banks", "interpret"))
def ivf_probe_topk(data, rscales, sizes, probes, queries, k: int, *,
                   banks: int = 2, interpret: bool = False):
    """(data [C,M,D], rscales [C,M], sizes [C] int32, probes [Q,nprobe]
    int32, queries [Q,D]) -> (vals [Q,k], cluster [Q,k], slot [Q,k])."""
    C, M, D = data.shape
    Q, nprobe = probes.shape
    S = banks * _LANES
    assert M % S == 0, f"cluster bucket M={M} must be a multiple of {S}"
    scaled = data.dtype == jnp.int8

    # Mosaic requires the last two block dims to divide (8, 128) or equal
    # the array dims; per-row blocks get a singleton middle axis so the
    # trailing block dims exactly match the array's.
    queries3 = queries.reshape(Q, 1, D)
    rscales3 = rscales.reshape(C, 1, M)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # probes, sizes
        grid=(Q,),
        in_specs=[
            pl.BlockSpec((1, 1, D), lambda q, probes, sizes: (q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # data stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # rscales stay in HBM
        ],
        out_specs=(
            pl.BlockSpec((1, 1, S), lambda q, probes, sizes: (q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), lambda q, probes, sizes: (q, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, M, D), data.dtype),      # double-buffered cluster
            pltpu.VMEM((2, 1, M), jnp.float32),     # double-buffered scales
            pltpu.VMEM((1, S), jnp.float32),
            pltpu.VMEM((1, S), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel_manual, M=M, banks=banks, scaled=scaled,
                               nprobe=nprobe)
    cand_v, cand_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((Q, 1, S), jnp.float32),
            jax.ShapeDtypeStruct((Q, 1, S), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Q * nprobe * M * D,
            bytes_accessed=Q * nprobe * M * (D * data.dtype.itemsize + 4),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(probes.astype(jnp.int32), sizes.astype(jnp.int32), queries3, data, rscales3)
    cand_v = cand_v.reshape(Q, S)
    cand_i = cand_i.reshape(Q, S)

    vals, args = jax.lax.top_k(cand_v, k)
    idx = jnp.take_along_axis(cand_i, args, axis=1)
    return vals, idx // M, idx % M
