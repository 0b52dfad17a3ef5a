"""Isolate the int4 refine-tier recall ceiling (0.9812, chop-invariant).

Hypotheses for the ~2% bank loss (true top-10 rows shadowed inside their
slot by a higher-int4-score row, so no rerank depth can recover them):
  A) slot shadowing pressure: N/S rows fold into each slot -> banks=16
     (S=2048) halves it;
  B) deferred-unpack noise: the (q_hi - 16*q_lo) bf16 rounding adds the
     documented ~1% coarse-score noise on top of int4 quantization ->
     deferred=False removes it (exact int4 dots via shift unpack).

Run ON TPU: python benchmarks/int4_bank_sweep.py
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


def run(name, banks, deferred, block_n=32768):
    def fn(q):
        vals, idx = fused_score_topk_int4_rerank(
            db4t, scales, db8, q, 64, count=N, rerank=128, block_n=block_n,
            banks=banks, deferred=deferred)
        return _exact_flat_rerank(db8, scales, q, vals, idx, K,
                                  rbuf=rq8, rbuf_scales=rsc2)

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
    row = {"variant": name, "qps": round(Q / best, 1),
           "p50_batch_ms": round(best * 1e3, 3),
           "recall_at_10": round(rec, 4), "compile_s": round(compile_s, 1)}
    print(json.dumps(row), flush=True)
    return row


rows = [
    run("b8_deferred", 8, True),            # current operating point
    run("b8_exact_unpack", 8, False),       # kills hypothesis B if ~same
    run("b16_deferred", 16, True),          # kills hypothesis A if ~same
    run("b16_exact_unpack", 16, False),     # both fixes together
]
print(json.dumps({"sweep": rows}), flush=True)
