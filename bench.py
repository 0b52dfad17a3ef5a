"""Benchmark harness — run on real TPU hardware by the driver.

Headline metric: search QPS/chip on a 1M x 384 flat index (BASELINE.json
north star: >=10k QPS/chip with >=95% recall@10). The fused Pallas kernel
scans the full corpus per query batch, so this is the honest brute-force
number — recall vs the exact oracle is measured in the same run and must
stay >= 0.95 for the QPS to count.

Timing method: the remote-TPU tunnel makes per-call wall timing unreliable
(block_until_ready returns early; host fetches pay ~30ms RPC). We time R
query batches inside ONE jit (lax.scan) and fetch a scalar, subtracting the
measured RPC roundtrip — device-bound by construction.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
"""

import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N = 1_048_576
D = 384
Q = 32          # queries per batch
K = 10
R = 32          # batches per timed run
BASELINE_QPS = 10_000.0  # driver-set target (BASELINE.md)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from memex_tpu.ops.fused_topk import fused_score_topk
    from memex_tpu.ops.topk import score_topk

    db = jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.float32)
    db = db / jnp.linalg.norm(db, axis=1, keepdims=True)
    qb = jax.random.normal(jax.random.PRNGKey(1), (R, Q, D), jnp.float32)
    qb = qb / jnp.linalg.norm(qb, axis=-1, keepdims=True)

    # RPC roundtrip baseline (host<->device sync cost, excluded from QPS).
    tiny = jnp.zeros(())
    float(tiny + 1)
    t0 = time.perf_counter()
    float(tiny + 2)
    rpc = time.perf_counter() - t0

    @jax.jit
    def many(db, qb):
        def body(c, q):
            v, i = fused_score_topk(db, q + c * 0, K, count=N, block_n=1024)
            return v[:, :1] * 1e-6, v[:, 0].sum()
        _, sums = jax.lax.scan(body, jnp.zeros((Q, 1)), qb)
        return sums.sum()

    float(many(db, qb))  # compile + warm
    t0 = time.perf_counter()
    float(many(db, qb))
    elapsed = time.perf_counter() - t0 - rpc
    per_batch = elapsed / R
    qps = Q / per_batch

    # Recall@10 of the fused kernel vs the exact oracle on the same corpus.
    qs = qb[0]
    fv, fi = fused_score_topk(db, qs, K, count=N, block_n=1024)
    ev, ei = score_topk(db, qs, K, method="exact")
    fi, ei = np.asarray(fi), np.asarray(ei)
    recall = float(np.mean([len(set(fi[i]) & set(ei[i])) / K for i in range(Q)]))

    print(json.dumps({
        "metric": "flat_search_qps_per_chip_1M_384d",
        "value": round(qps, 1),
        "unit": "queries/sec",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
        "recall_at_10_vs_exact": round(recall, 4),
        "p50_batch_ms": round(per_batch * 1e3, 3),
        "query_batch": Q,
        "corpus": N,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
