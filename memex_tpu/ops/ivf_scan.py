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


def _kernel(probes_ref, sizes_ref, q_ref, db_ref, rs_ref, out_v_ref, out_i_ref,
            acc_v, acc_i, *, M: int, banks: int, scaled: bool):
    q = pl.program_id(0)
    p = pl.program_id(1)
    nprobe = pl.num_programs(1)
    S = banks * _LANES
    G = M // S

    @pl.when(p == 0)
    def _init():
        acc_v[:] = jnp.full((1, S), NEG_INF, jnp.float32)
        acc_i[:] = jnp.zeros((1, S), jnp.int32)

    cid = probes_ref[q, p]
    csize = sizes_ref[cid]
    scores = jax.lax.dot_general(
        q_ref[0].astype(jnp.bfloat16),          # [1, D]
        db_ref[0].astype(jnp.bfloat16),         # [M, D]
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                            # [1, M]
    if scaled:
        scores = scores * rs_ref[0]              # [1, M] per-row scales
    col = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
    scores = jnp.where(col < csize, scores, NEG_INF)

    s3 = scores.reshape(1, G, S)
    block_max = jnp.max(s3, axis=1)              # [1, S]
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (1, G, S), 1)
    g_sel = jnp.min(jnp.where(s3 == block_max[:, None, :], g_iota, G), axis=1)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    cand_idx = cid * M + g_sel * S + slot_iota   # global row = cid*M + m

    take = block_max > acc_v[:]
    acc_v[:] = jnp.where(take, block_max, acc_v[:])
    acc_i[:] = jnp.where(take, cand_idx, acc_i[:])

    @pl.when(p == nprobe - 1)
    def _flush():
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
        grid=(Q, nprobe),
        in_specs=[
            pl.BlockSpec((1, 1, D), lambda q, p, probes, sizes: (q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, D), lambda q, p, probes, sizes: (probes[q, p], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda q, p, probes, sizes: (probes[q, p], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, S), lambda q, p, probes, sizes: (q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), lambda q, p, probes, sizes: (q, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, S), jnp.float32),
            pltpu.VMEM((1, S), jnp.int32),
        ],
    )
    kernel = functools.partial(_kernel, M=M, banks=banks, scaled=scaled)
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
