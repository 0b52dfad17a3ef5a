"""Validate the keep2 slot fold on real TPU at 1M x 384.

Expectation from the collision analysis (int4_bank_sweep2): the 3/320
oracle rows lost by the refine tiers are ALL two-winner slot collisions,
so keep2 should move int8q_refine 0.9906 -> ~1.0 and int4_refine(b16)
0.9906 -> ~0.997+, at a small fold-cost delta at Q=32 (HBM-bound scan).

Run ON TPU: python benchmarks/keep2_validate.py
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
    t0 = time.perf_counter()
    float(fn(qs[0])[0][0, 0])  # compile
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        outs = [fn(q) for q in qs]
        float(outs[-1][0][0, 0])
        best = min(best, (time.perf_counter() - t0 - rpc) / len(qs))
    fi = np.asarray(fn(qs[0])[1])[:Q]
    rec = float(np.mean([len(set(fi[i]) & set(ei[i])) / K for i in range(Q)]))
    print(json.dumps({"variant": name, "qps": round(Q / best, 1),
                      "p50_batch_ms": round(best * 1e3, 3),
                      "recall_at_10": round(rec, 4),
                      "compile_s": round(compile_s, 1)}), flush=True)


def i8(keep2):
    return lambda q: _search_rerank_fused(
        db8, scales, None, rq8, rsc2, None, N, q, K, 64, 64, 8192,
        True, False, "int8", False, False, 16, keep2)


def i4(banks4, keep2):
    return lambda q: _search_rerank_fused(
        db4t, scales, db8, rq8, rsc2, None, N, q, K, 64, 128, 32768,
        True, True, "int4", False, False, banks4, keep2)


run("int8q_refine_keep1", i8(False))       # round-4 recorded baseline
run("int8q_refine_keep2", i8(True))
run("int4_refine_b8_keep1", i4(8, False))  # round-4 recorded baseline
run("int4_refine_b16_keep1", i4(16, False))
run("int4_refine_b16_keep2", i4(16, True))
run("int4_refine_b8_keep2", i4(8, True))
