"""Sweep (kk, k_ret) for the int4+refine and int8q+refine fused tiers.

r3 verdict item 7: int4 coarse + residual refine should match int8q QPS
at >=0.99 recall (1M random). The current operating point (kk=128,
k_ret=64) reads 0.981 — the loss is in the two chops between the
1024-slot coarse bank and the 14-bit residual rescoring, not in the bank
itself (int8q+refine over a 512-slot bank reads 0.9906). The chops are
XLA epilogue work (argsort + gathers + small einsums) outside the Pallas
kernel, so deepening them costs microseconds against an HBM-bound scan.

Run ON TPU: python benchmarks/int4_refine_sweep.py
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

from memex_tpu.index.flat import _search_rerank_fused  # noqa: E402
from memex_tpu.ops.fused_topk import (  # noqa: E402
    quantize_rows_int4,
    quantize_rows_int8_refine,
)
from memex_tpu.ops.topk import score_topk  # noqa: E402

N, D, Q, K, R, REPS = 1 << 20, 384, 32, 10, 64, 3

db = jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.float32)
db = db / jnp.linalg.norm(db, axis=1, keepdims=True)
db8, scales, rq8, rsc2 = quantize_rows_int8_refine(db)
db4t, _ = quantize_rows_int4(db)

oracle_q = jax.random.normal(jax.random.PRNGKey(2), (Q, D), jnp.float32)
_, ei = score_topk(db, oracle_q, K, method="exact_f32")
ei = np.asarray(ei)
del db

tiny = jnp.zeros(())
float(tiny + 1)
samples = []
for i in range(15):
    t0 = time.perf_counter()
    float(tiny + (2 + i))
    samples.append(time.perf_counter() - t0)
rpc = float(np.median(samples))
print(f"rpc={rpc * 1e3:.1f}ms", flush=True)

qs = [jax.random.normal(jax.random.PRNGKey(2 + i), (Q, D), jnp.float32)
      for i in range(R)]


def run(name, fn):
    float(fn(qs[0])[0][0, 0])  # compile
    best = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        outs = [fn(q) for q in qs]
        float(outs[-1][0][0, 0])
        best = min(best, (time.perf_counter() - t0 - rpc) / len(qs))
    fi = np.asarray(fn(qs[0])[1])[:Q]
    rec = float(np.mean([len(set(fi[i]) & set(ei[i])) / K for i in range(Q)]))
    row = {"variant": name, "qps": round(Q / best, 1),
           "p50_batch_ms": round(best * 1e3, 3), "recall_at_10": round(rec, 4)}
    print(json.dumps(row), flush=True)
    return row


rows = []
# int4 coarse bank is S = 8 banks * 128 = 1024 slots at block_n=32768.
for kk, kret in ((128, 64), (256, 128), (512, 128), (512, 256), (1024, 256)):
    rows.append(run(
        f"int4_refine_kk{kk}_ret{kret}",
        lambda q, kk=kk, kret=kret: _search_rerank_fused(
            db4t, scales, db8, rq8, rsc2, None, N, q, K, kret, kk, 32768,
            True, True, "int4", False, False)))

# int8q coarse bank is S = 4 banks * 128 = 512 slots at block_n=8192.
for kk, kret in ((64, 64), (128, 128), (256, 128)):
    rows.append(run(
        f"int8q_refine_kk{kk}_ret{kret}",
        lambda q, kk=kk, kret=kret: _search_rerank_fused(
            db8, scales, None, rq8, rsc2, None, N, q, K, kret, kk, 8192,
            True, False, "int8", False, False)))

print(json.dumps({"sweep": rows}), flush=True)
