"""Part 2: is the 0.9906 plateau (3 misses / 320) structural?

Prints the exact (query, row) misses per config. If the same rows are
lost at S=512 (int8q), S=2048 (int4 b16) and S=4096 (int4 b32), the loss
is not shadowing pressure but something those rows share (e.g. a
rank-10/11 boundary gap below coarse resolution in ALL formats).

Run ON TPU: python benchmarks/int4_bank_sweep2.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxpc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from memex_tpu.index.flat import _exact_flat_rerank  # noqa: E402
from memex_tpu.ops.fused_topk import (  # noqa: E402
    fused_score_topk_int4_rerank,
    fused_score_topk_int8q,
    quantize_rows_int4,
    quantize_rows_int8_refine,
)
from memex_tpu.ops.topk import score_topk  # noqa: E402

N, D, Q, K = 1 << 20, 384, 32, 10

db = jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.float32)
db = db / jnp.linalg.norm(db, axis=1, keepdims=True)
db8, scales, rq8, rsc2 = quantize_rows_int8_refine(db)
db4t, _ = quantize_rows_int4(db)

oracle_q = jax.random.normal(jax.random.PRNGKey(2), (Q, D), jnp.float32)
vals_o, ei = score_topk(db, oracle_q, K, method="exact_f32")
ei = np.asarray(ei)
vo = np.asarray(vals_o)
# rank-10/11 boundary gap per query (true f32 scores)
_, e11 = score_topk(db, oracle_q, K + 1, method="exact_f32")
v11 = np.asarray(score_topk(db, oracle_q, K + 1, method="exact_f32")[0])
gaps = vo[:, -1] - v11[:, -1]
print(json.dumps({"min_boundary_gap": float(gaps.min()),
                  "median_boundary_gap": float(np.median(gaps))}), flush=True)
del db


def misses(name, fn):
    fi = np.asarray(fn(oracle_q)[1])[:Q]
    lost = [(int(qi), int(r)) for qi in range(Q)
            for r in set(ei[qi]) - set(fi[qi])]
    rec = 1.0 - len(lost) / (Q * K)
    print(json.dumps({"variant": name, "recall": round(rec, 4),
                      "misses": lost}), flush=True)
    return lost


def int4_fn(banks):
    def fn(q):
        vals, idx = fused_score_topk_int4_rerank(
            db4t, scales, db8, q, 64, count=N, rerank=128, block_n=32768,
            banks=banks, deferred=True)
        return _exact_flat_rerank(db8, scales, q, vals, idx, K,
                                  rbuf=rq8, rbuf_scales=rsc2)
    return fn


def int8q_fn(banks, block_n=8192):
    def fn(q):
        vals, idx = fused_score_topk_int8q(
            db8, scales, q, 64, count=N, block_n=block_n, banks=banks)
        return _exact_flat_rerank(db8, scales, q, vals, idx, K,
                                  rbuf=rq8, rbuf_scales=rsc2)
    return fn


t0 = time.perf_counter()
m1 = misses("int8q_b4", int8q_fn(4))
m2 = misses("int8q_b8", int8q_fn(8))
m3 = misses("int4_b16", int4_fn(16))
m4 = misses("int4_b32", int4_fn(32))
print(json.dumps({
    "common_int8q_b4_int4_b16": sorted(set(m1) & set(m3)),
    "union_sizes": [len(m1), len(m2), len(m3), len(m4)],
    "elapsed_s": round(time.perf_counter() - t0, 1),
}), flush=True)
