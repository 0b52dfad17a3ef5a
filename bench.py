"""Benchmark harness — run on real TPU hardware by the driver.

Headline: search QPS/chip on a 1M x 384 corpus (BASELINE.json north star:
>=10k QPS/chip with >=95% recall@10). Storage tiers measured in one run:
f32 (exact scan), bf16, int8 (per-row scales); the headline value is the
fastest tier that clears the 0.95 recall bar against the exact oracle.

Timing: per-call wall timing is unreliable through the remote-TPU tunnel
(async dispatch; ~30ms host<->device RPC), so we dispatch R batches
back-to-back and fetch one scalar from the LAST result — device execution
is in-order, so the fetch syncs the whole chain; measured RPC roundtrip is
subtracted once.

Prints exactly one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N = 1_048_576
D = 384
Q = 32
K = 10
R = 32
BASELINE_QPS = 10_000.0   # driver-set target (BASELINE.md)
RECALL_BAR = 0.95


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from memex_tpu.ops.fused_topk import (
        fused_score_topk,
        fused_score_topk_int8,
        quantize_rows_int8,
    )
    from memex_tpu.ops.topk import score_topk

    db = jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.float32)
    db = db / jnp.linalg.norm(db, axis=1, keepdims=True)
    db16 = db.astype(jnp.bfloat16)
    db8, scales = quantize_rows_int8(db)
    qs = [
        jax.random.normal(jax.random.PRNGKey(2 + i), (Q, D), jnp.float32)
        for i in range(R)
    ]

    tiny = jnp.zeros(())
    float(tiny + 1)
    t0 = time.perf_counter()
    float(tiny + 2)
    rpc = time.perf_counter() - t0

    def measure(fn):
        float(fn(qs[0])[0][0, 0])  # compile + warm
        t0 = time.perf_counter()
        outs = [fn(q) for q in qs]      # async dispatch chain
        float(outs[-1][0][0, 0])        # sync the whole chain
        per_batch = (time.perf_counter() - t0 - rpc) / R
        return per_batch

    def recall(fn):
        _, fi = fn(qs[0])
        _, ei = score_topk(db, qs[0], K, method="exact")
        fi, ei = np.asarray(fi), np.asarray(ei)
        return float(np.mean([len(set(fi[i]) & set(ei[i])) / K for i in range(Q)]))

    tiers = {
        "f32": lambda q: fused_score_topk(db, q, K, count=N, block_n=1024),
        "bf16": lambda q: fused_score_topk(db16, q, K, count=N, block_n=1024),
        "int8": lambda q: fused_score_topk_int8(db8, scales, q, K, count=N, block_n=1024),
    }
    results = {}
    for name, fn in tiers.items():
        per_batch = measure(fn)
        results[name] = {
            "qps": Q / per_batch,
            "p50_batch_ms": per_batch * 1e3,
            "recall_at_10": recall(fn),
        }

    eligible = {k: v for k, v in results.items() if v["recall_at_10"] >= RECALL_BAR}
    best = max(eligible, key=lambda k: eligible[k]["qps"])

    print(json.dumps({
        "metric": "flat_search_qps_per_chip_1M_384d",
        "value": round(results[best]["qps"], 1),
        "unit": "queries/sec",
        "vs_baseline": round(results[best]["qps"] / BASELINE_QPS, 3),
        "storage_tier": best,
        "recall_at_10_vs_exact": round(results[best]["recall_at_10"], 4),
        "p50_batch_ms": round(results[best]["p50_batch_ms"], 3),
        "tiers": {
            k: {"qps": round(v["qps"], 1), "recall": round(v["recall_at_10"], 4)}
            for k, v in results.items()
        },
        "query_batch": Q,
        "corpus": N,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
