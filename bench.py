"""Benchmark harness — run on real TPU hardware by the driver.

Headline: search QPS/chip on a 1M x 384 corpus (BASELINE.json north star:
>=10k QPS/chip with >=95% recall@10). Storage tiers measured in one run:
f32 (exact scan), bf16, int8 (per-row scales), int8q (queries quantized
too -> s8xs8 MXU dot), int4 (packed nibbles + exact int8 rerank), plus
Q=128 rows for the two fastest tiers (the scan is HBM-bound, so larger
query batches raise QPS at near-constant per-batch latency). The headline
value is the fastest row clearing the 0.95 recall bar against the exact
oracle. A 10M-row device-resident stage reports flat + IVF at scale.

Also measured (BASELINE.md target table): end-to-end query latency through
the real serving stack (full MiniLM-L12 encode + fused search), ingest
docs/sec through the worker pipeline, and the 1M-row bulk shard load.

Timing: per-call wall timing is unreliable through the remote-TPU tunnel
(async dispatch; ~30ms host<->device RPC), so we dispatch R batches
back-to-back and fetch one scalar from the LAST result — device execution
is in-order, so the fetch syncs the whole chain; measured RPC roundtrip is
subtracted once. Tier timing is best-of-3 (tunnel throughput is noisy).

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
R = 128           # batches per timing chain (rpc noise divides by R)
REPS = 3
BASELINE_QPS = 10_000.0   # driver-set target (BASELINE.md)
RECALL_BAR = 0.95


def _enable_compile_cache() -> None:
    """Shared persistent-cache policy (memex_tpu/compile_cache.py):
    TPU-only, no-op on the CPU backend — see that module for why."""
    from memex_tpu.compile_cache import enable_compile_cache

    enable_compile_cache()


def bench_kernels(rpc: float) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from memex_tpu.ops.fused_topk import (
        fused_score_topk,
        fused_score_topk_int4_rerank,
        fused_score_topk_int8,
        fused_score_topk_int8q,
        quantize_rows_int4,
        quantize_rows_int8,
    )
    from memex_tpu.ops.topk import score_topk

    db = jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.float32)
    db = db / jnp.linalg.norm(db, axis=1, keepdims=True)
    db16 = db.astype(jnp.bfloat16)
    db8, scales = quantize_rows_int8(db)
    db4t, _ = quantize_rows_int4(db)

    # Tier rows: (name, query_batch, fn). Q=128 rows exist because the scan
    # is HBM-bound and Q-independent until the slot fold saturates the VPU:
    # throughput keeps climbing past Q=32 at near-unchanged per-batch time.
    tiers = [
        ("f32", Q, lambda q: fused_score_topk(db, q, K, count=N, block_n=2048)),
        ("bf16", Q, lambda q: fused_score_topk(db16, q, K, count=N, block_n=1024)),
        ("int8", Q, lambda q: fused_score_topk_int8(
            db8, scales, q, K, count=N, block_n=1024)),
        ("int8q", Q, lambda q: fused_score_topk_int8q(
            db8, scales, q, K, count=N, block_n=8192, banks=4)),
        ("int4", Q, lambda q: fused_score_topk_int4_rerank(
            db4t, scales, db8, q, K, count=N, rerank=64, block_n=32768,
            deferred=True)),  # hi-only unpack: 2.6x at Q=32 (VPU-bound)
        ("int8q_q128", 128, lambda q: fused_score_topk_int8q(
            db8, scales, q, K, count=N, block_n=32768, banks=4)),
        ("int8q_q256", 256, lambda q: fused_score_topk_int8q(
            db8, scales, q, K, count=N, block_n=32768, banks=4)),
        # Q=512: past the HBM/MXU crossover the scan is MXU-bound, so the
        # tier measures how close the kernel sits to the s8xs8 roofline.
        # block 16384 is the measured Q=512 sweet spot (372k vs 354k at
        # 32768: the [512, block] fold working set spills registers at
        # wider blocks — 65536 OOMs VMEM on spill slots alone); at Q<=128
        # 32768 stays ahead, so only this tier narrows the block.
        ("int8q_q512", 512, lambda q: fused_score_topk_int8q(
            db8, scales, q, K, count=N, block_n=16384, banks=4)),
        ("int4_q128", 128, lambda q: fused_score_topk_int4_rerank(
            db4t, scales, db8, q, K, count=N, rerank=64, block_n=32768,
            deferred=False)),
    ]
    oracle_q = jax.random.normal(jax.random.PRNGKey(2), (Q, D), jnp.float32)
    _, ei = score_topk(db, oracle_q, K, method="exact")
    ei = np.asarray(ei)

    results = {}
    for name, qb, fn in tiers:
        qs = [
            jax.random.normal(jax.random.PRNGKey(2 + i), (qb, D), jnp.float32)
            for i in range(R if qb <= Q else 48)
        ]
        float(fn(qs[0])[0][0, 0])  # compile
        best = 1e9
        for _ in range(REPS):
            t0 = time.perf_counter()
            outs = [fn(q) for q in qs]      # async dispatch chain
            float(outs[-1][0][0, 0])        # sync the whole chain
            best = min(best, (time.perf_counter() - t0 - rpc) / len(qs))
        fi = np.asarray(fn(qs[0])[1])[:Q]   # recall on the oracle's Q rows
        rec = float(np.mean([len(set(fi[i]) & set(ei[i])) / K for i in range(Q)]))
        results[name] = {"qps": qb / best, "p50_batch_ms": best * 1e3,
                         "recall_at_10": rec, "query_batch": qb}

    # Release the big buffers before the next stage: the tier lambdas
    # close over them, so the list must go too or nothing frees — and the
    # loop variable `fn` still references the LAST tier's lambda (pinning
    # its closure: db4t + db8 + scales), so it must go as well.
    del tiers, db, db16, db8, db4t, scales, fn, outs, qs
    return results


def bench_scale_10m(rpc: float) -> dict:
    """10M-row tier, fully device-resident (BASELINE.md config: 10M IVF).

    The corpus is generated and quantized ON DEVICE (10M x 384 f32 would be
    15 GB and ~8 min through the tunnel), the exact-int8 oracle is the flat
    int8q scan over the same codes, and the IVF build uses build_device()
    (device argsort + scatter packing). Reported: flat-scan QPS at Q=128
    (best batched throughput), IVF probe QPS at Q=32 (low-latency tier),
    recall vs the int8-exact oracle, and device build time.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from memex_tpu.index.ivf import IVFIndex
    from memex_tpu.ops.fused_topk import fused_score_topk_int8q, quantize_rows_int8

    # Scale is env-overridable so stage changes can be smoke-tested on the
    # real chip in ~1/10th the time (MEMEX_BENCH_10M_BLOCKS=1 -> 1M rows)
    # without burning a 10M build on plumbing bugs.
    BLK = 1 << 20
    N10 = int(os.environ.get("MEMEX_BENCH_10M_BLOCKS", "10")) * BLK
    # Clustered corpus (mixture of gaussians; benchmarks/datasets.py
    # parameters: offset NORM 0.75 -> cos(point, center) ~ 0.8, matching
    # intra-topic similarity of sentence embeddings). A uniform corpus has
    # no cluster structure, which makes IVF routing meaningless (measured
    # recall 0.08 at nprobe/C = 64/4096) — and no one runs IVF on noise.
    CENTERS = 8192
    ckey = jax.random.PRNGKey(99)
    centers = jax.random.normal(ckey, (CENTERS, D), jnp.float32)
    centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)
    sigma = 0.75 / (D ** 0.5)

    @jax.jit
    def gen_block(key):
        ka, kb = jax.random.split(key)
        asg = jax.random.randint(ka, (BLK,), 0, CENTERS)
        v = centers[asg] + sigma * jax.random.normal(kb, (BLK, D), jnp.float32)
        v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
        return quantize_rows_int8(v)

    import functools

    @functools.partial(jax.jit, static_argnames=("m",))
    def gen_queries(key, m):
        ka, kb = jax.random.split(key)
        asg = jax.random.randint(ka, (m,), 0, CENTERS)
        v = centers[asg] + sigma * jax.random.normal(kb, (m, D), jnp.float32)
        return v / jnp.linalg.norm(v, axis=1, keepdims=True)

    t0 = time.perf_counter()
    parts = [gen_block(jax.random.PRNGKey(100 + i)) for i in range(N10 // BLK)]
    vecs = jnp.concatenate([p[0] for p in parts])
    scales = jnp.concatenate([p[1] for p in parts])
    jax.block_until_ready(vecs)
    del parts
    gen_s = time.perf_counter() - t0

    qs32 = [gen_queries(jax.random.PRNGKey(300 + i), Q) for i in range(16)]
    qs128 = [gen_queries(jax.random.PRNGKey(300 + i), 128) for i in range(16)]

    def flat(q):
        return fused_score_topk_int8q(vecs, scales, q, K, count=N10,
                                      block_n=32768, banks=4)

    float(flat(qs128[0])[0][0, 0])
    best = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        outs = [flat(q) for q in qs128]
        float(outs[-1][0][0, 0])
        best = min(best, (time.perf_counter() - t0 - rpc) / len(qs128))
    flat_qps = 128 / best
    ei = np.asarray(flat(qs32[0])[1])  # int8-exact oracle for IVF routing
    # The `flat` closure pins vecs/scales; drop it so the later
    # `del vecs, scales` actually frees the 3.8GB corpus copy and the IVF
    # stage doesn't run with corpus + bucket table both resident.
    del flat

    # --- IVF: device build + probe scan ------------------------------------
    t0 = time.perf_counter()
    # bucket_factor 1.2 -> M=3072 (1024-aligned: the batch kernel runs
    # S=1024 chunks, banks=8 — halved chunk count measured +15%/+28% QPS
    # at Q=32/Q=128 vs S=512). The chunked kernel reads only
    # ceil(live/1024) chunks per bucket, so padding costs no scan
    # bandwidth; the factor is sized for (a) small spill (capacity-aware
    # fold absorbed all but 186 of 10M rows at this M) and (b) rebuild HBM
    # headroom (table 4.8GB + compacted corpus 4GB; a 6.4GB table OOMed
    # ~10.5GB working sets on this chip). Overflow rows go to the spill
    # flat index DEVICE-TO-DEVICE (add_quantized) and are scanned exactly.
    ivf = IVFIndex(dim=D, n_clusters=4096, nprobe=64, dtype="int8",
                   bucket_factor=1.2)
    ivf.build_device(vecs, scales, list(range(N10)))
    build_s = time.perf_counter() - t0
    del vecs, scales

    # Device-path IVF timing: chain jitted probe searches and fetch once
    # (ivf.search() fetches per call, which is ~35ms RPC-bound through the
    # tunnel and would measure the link, not the index). Round 2: the
    # batch-union kernel (ops/ivf_batch.py) — each probed cluster is read
    # once per BATCH, so QPS scales with Q while per-batch bytes saturate
    # at the unique-cluster union.
    from memex_tpu.ops.ivf_batch import ivf_batch_search

    def ivf_dev(q):
        return ivf_batch_search(ivf.centroids, ivf.data, ivf.rscales,
                                ivf.sizes, jnp.asarray(q), ivf.nprobe, K,
                                banks=ivf._batch_banks())

    ivf_rows = {}
    best32 = 1e9
    for name, qset, qb in (("q32", qs32, Q), ("q128", qs128, 128)):
        float(ivf_dev(qset[0])[0][0, 0])  # compile
        best = 1e9
        for _ in range(REPS):
            t0 = time.perf_counter()
            outs = [ivf_dev(q) for q in qset]
            float(outs[-1][0][0, 0])
            best = min(best, (time.perf_counter() - t0 - rpc) / len(qset))
        ivf_rows[name] = {"qps": round(qb / best, 1),
                          "p50_batch_ms": round(best * 1e3, 3)}
        if name == "q32":
            best32 = best
    # Recall through the full index path (bucket + spill + id mapping),
    # hits and oracle on the SAME query batch.
    hits = ivf.search(np.asarray(qs32[0]), K)
    rec = float(np.mean([
        len({int(s) for s, _ in hits[i]} & set(ei[i].tolist())) / K
        for i in range(Q)
    ]))

    # --- margin-pruned routing (ops/ivf_batch.route_union prune_margin):
    # Q=32 is HBM-bound on the probed-union read, so dropping the long
    # tail of low-scoring probes converts ~1:1 into QPS. Report the union
    # shrink + recall alongside so the trade is visible, not hidden.
    from memex_tpu.ops.ivf_batch import route_union

    _, na_full = route_union(ivf.centroids, qs32[0], ivf.nprobe)
    union_full = int(na_full[0])

    def ivf_dev_pruned(q, margin):
        return ivf_batch_search(ivf.centroids, ivf.data, ivf.rscales,
                                ivf.sizes, jnp.asarray(q), ivf.nprobe, K,
                                banks=ivf._batch_banks(), prune_margin=margin)

    # The margin is a DYNAMIC scalar (round 2): one compile covers the
    # whole sweep, so the trade curve costs seconds, not a recompile per
    # operating point.
    float(ivf_dev_pruned(qs32[0], 0.15)[0][0, 0])  # compile (shared)
    sweep = []
    for margin in (0.15, 0.25, 0.35):
        _, na_p = route_union(ivf.centroids, qs32[0], ivf.nprobe,
                              prune_margin=margin)
        bestp = 1e9
        for _ in range(REPS):
            t0 = time.perf_counter()
            outs = [ivf_dev_pruned(q, margin) for q in qs32]
            float(outs[-1][0][0, 0])
            bestp = min(bestp, (time.perf_counter() - t0 - rpc) / len(qs32))
        ivf.prune_margin = margin
        hits_p = ivf.search(np.asarray(qs32[0]), K)
        rec_pruned = float(np.mean([
            len({int(s) for s, _ in hits_p[i]} & set(ei[i].tolist())) / K
            for i in range(Q)
        ]))
        sweep.append({
            "margin": margin,
            "qps_q32": round(Q / bestp, 1),
            "recall_at_10": round(rec_pruned, 4),
            "union_clusters": int(na_p[0]),
        })
    ivf.prune_margin = None
    ok95 = [r for r in sweep if r["recall_at_10"] >= 0.95]
    pruned_row = {
        "union_clusters_full": union_full,
        "sweep": sweep,
        # Fastest operating point holding the >=0.95 recall floor (falls
        # back to the most-accurate margin if none holds it).
        "best_at_95": (max(ok95, key=lambda r: r["qps_q32"]) if ok95
                       else max(sweep, key=lambda r: r["recall_at_10"])),
    }
    # Q=128 at the chosen operating point: pruning and batch-union
    # amortization compose (both shrink/share the probed-union bytes).
    bm = pruned_row["best_at_95"]["margin"]
    float(ivf_dev_pruned(qs128[0], bm)[0][0, 0])  # compile (Q=128 shape)
    bestp128 = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        outs = [ivf_dev_pruned(q, bm) for q in qs128]
        float(outs[-1][0][0, 0])
        bestp128 = min(bestp128, (time.perf_counter() - t0 - rpc) / len(qs128))
    pruned_row["qps_q128_at_best95"] = round(128 / bestp128, 1)

    # --- int4 scan tier (ops/ivf_batch4.py): the probed-union read is the
    # whole batch cost at Q=32 (HBM-bound), so packed-int4 buckets halve it;
    # an int8 rerank of the candidate bank restores recall. Mirror = half
    # the table (+2.8GB next to the 5.6GB table — fits; freed before the
    # rebuild stage below, which needs the headroom).
    from memex_tpu.ops.ivf_batch4 import ivf_batch_search4

    t0 = time.perf_counter()
    data4, rsc4 = ivf._int4_mirror()
    jax.block_until_ready(data4)
    pack4_s = time.perf_counter() - t0

    def ivf_dev4(q):
        return ivf_batch_search4(ivf.centroids, data4, rsc4, ivf.data,
                                 ivf.rscales, ivf.sizes, jnp.asarray(q),
                                 ivf.nprobe, K, banks=ivf._batch_banks())

    ivf4_rows = {}
    for name, qset, qb in (("q32", qs32, Q), ("q128", qs128, 128)):
        float(ivf_dev4(qset[0])[0][0, 0])  # compile
        best = 1e9
        for _ in range(REPS):
            t0 = time.perf_counter()
            outs = [ivf_dev4(q) for q in qset]
            float(outs[-1][0][0, 0])
            best = min(best, (time.perf_counter() - t0 - rpc) / len(qset))
        ivf4_rows[name] = round(qb / best, 1)
    ivf.scan_int4 = True
    hits4 = ivf.search(np.asarray(qs32[0]), K)
    rec4 = float(np.mean([
        len({int(s) for s, _ in hits4[i]} & set(ei[i].tolist())) / K
        for i in range(Q)
    ]))

    # --- int4 + margin pruning COMPOSED: both attack the same bottleneck
    # (probed-union bytes at Q=32 — pruning drops low-scoring clusters,
    # int4 halves bytes per surviving cluster) and the margin is a dynamic
    # scalar, so this point reuses the int4 executable compiled above.
    # Own guard: a failure here degrades to missing composed keys, it must
    # not void the rest of the 10M stage.
    int4_pruned = {}
    try:
        def ivf_dev4p(q):
            return ivf_batch_search4(ivf.centroids, data4, rsc4, ivf.data,
                                     ivf.rscales, ivf.sizes, jnp.asarray(q),
                                     ivf.nprobe, K, banks=ivf._batch_banks(),
                                     prune_margin=bm)

        float(ivf_dev4p(qs32[0])[0][0, 0])
        best4p = 1e9
        for _ in range(REPS):
            t0 = time.perf_counter()
            outs = [ivf_dev4p(q) for q in qs32]
            float(outs[-1][0][0, 0])
            best4p = min(best4p, (time.perf_counter() - t0 - rpc) / len(qs32))
        ivf.prune_margin = bm
        ivf.scan_int4 = True
        hits4p = ivf.search(np.asarray(qs32[0]), K)
        rec4p = float(np.mean([
            len({int(s) for s, _ in hits4p[i]} & set(ei[i].tolist())) / K
            for i in range(Q)
        ]))
        int4_pruned = {
            "ivf_int4_pruned_qps_q32": round(Q / best4p, 1),
            "ivf_int4_pruned_margin": bm,
            "ivf_int4_pruned_recall_at_10": round(rec4p, 4),
        }
        del ivf_dev4p
    except Exception as exc:  # pragma: no cover - bench resilience
        int4_pruned = {"ivf_int4_pruned_error": repr(exc)[:200]}
    finally:
        ivf.prune_margin = None
        ivf.scan_int4 = False
    del ivf_dev4, data4, rsc4
    ivf._invalidate_int4()  # free 2.8GB before the rebuild stage

    # Maintenance at scale (round-1 VERDICT weak #1): streaming ingest then
    # an incremental checkpoint (spill segment only — the device-built base
    # is policy-skipped, SQL is the source of truth) and a full ON-DEVICE
    # rebuild (gather + retrain + re-scatter; zero corpus bytes to host).
    import tempfile

    spill_rows_initial = ivf.spill.count
    ck = tempfile.mkdtemp(prefix="memex_ck_") + "/ten_m.ivf"
    extra = np.asarray(gen_queries(jax.random.PRNGKey(777), 1024))
    ivf.add(extra, [N10 + i for i in range(1024)])
    t0 = time.perf_counter()
    ivf.save(ck)
    ckpt_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    ivf.rebuild()
    rebuild_s = time.perf_counter() - t0
    spill_after = ivf.spill.count

    return {
        "n": N10,
        "corpus_gen_s": round(gen_s, 2),
        "flat_int8q_q128_qps": round(flat_qps, 1),
        "ivf_build_device_s": round(build_s, 2),
        "ivf_spill_rows": spill_rows_initial,
        "ivf_nprobe64_qps_q32": ivf_rows["q32"]["qps"],
        "ivf_nprobe64_qps_q128": ivf_rows["q128"]["qps"],
        "ivf_p50_batch_ms": round(best32 * 1e3, 3),
        "ivf_p50_batch_ms_q128": ivf_rows["q128"]["p50_batch_ms"],
        "ivf_recall_at_10_vs_int8_exact": round(rec, 4),
        "ivf_pruned": pruned_row,
        "ivf_int4_pack_s": round(pack4_s, 2),
        "ivf_int4_qps_q32": ivf4_rows["q32"],
        "ivf_int4_qps_q128": ivf4_rows["q128"],
        "ivf_int4_recall_at_10": round(rec4, 4),
        **int4_pruned,
        "ckpt_incremental_s": round(ckpt_s, 2),
        "rebuild_device_s": round(rebuild_s, 2),
        "spill_after_rebuild": spill_after,
    }


def bench_sharded_ivf(rpc: float) -> dict:
    """The 100M-tier CODE PATH on real hardware: ShardedIVFIndex's SPMD
    program (shard_map-wrapped batch-union kernel + collective top-k
    merge) built and searched on a 1-device mesh at 1M rows. The driver's
    multichip gate proves N-way partitioning on the virtual CPU mesh;
    this proves the same program compiles and runs the MXU kernel on a
    real chip — and exercises prune-margin auto-calibration on hardware."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from memex_tpu.index.sharded_ivf import ShardedIVFIndex
    from memex_tpu.ops.fused_topk import fused_score_topk_int8q, quantize_rows_int8

    N1 = 1 << 20
    CENTERS = 2048
    ckey = jax.random.PRNGKey(77)
    centers = jax.random.normal(ckey, (CENTERS, D), jnp.float32)
    centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)
    sigma = 0.75 / (D ** 0.5)

    import functools

    @functools.partial(jax.jit, static_argnames=("m",))
    def gen(key, m):
        ka, kb = jax.random.split(key)
        asg = jax.random.randint(ka, (m,), 0, CENTERS)
        v = centers[asg] + sigma * jax.random.normal(kb, (m, D), jnp.float32)
        return v / jnp.linalg.norm(v, axis=1, keepdims=True)

    vecs, scales = quantize_rows_int8(gen(jax.random.PRNGKey(500), N1))
    qs = [np.asarray(gen(jax.random.PRNGKey(600 + i), Q)) for i in range(16)]
    ei = np.asarray(fused_score_topk_int8q(
        vecs, scales, jnp.asarray(qs[0]), K, count=N1, block_n=32768,
        banks=4)[1])  # int8-exact oracle

    mesh = Mesh(np.asarray(jax.devices()), ("shard",))
    P = len(jax.devices())
    t0 = time.perf_counter()
    # C=1024/nprobe=16 is the 10M tier's 4096/64 scaled to 1M; device
    # corpus goes straight into build_device (the pod tier's path — the
    # corpus never transits the host).
    sivf = ShardedIVFIndex(dim=D, mesh=mesh, n_clusters=1024 * P, nprobe=16,
                           bucket_factor=1.2)
    sivf.build_device(jax.device_put(vecs, sivf._row_sh),
                      jax.device_put(scales, sivf._vec_sh),
                      list(range(N1)))
    build_s = time.perf_counter() - t0
    del vecs, scales

    hits = sivf.search(qs[0], K)  # warms + caches the SPMD executable
    rec = float(np.mean([
        len({int(s) for s, _ in hits[i]} & set(ei[i].tolist())) / K
        for i in range(Q)
    ]))
    # Chain the compiled SPMD fn directly (search() fetches per call —
    # that measures the ~30ms tunnel RPC, not the index).
    fn = sivf._search_cache[K]
    margin = jnp.float32(4.0)
    best = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        outs = [fn(sivf.centroids, sivf.data, sivf.rscales, sivf.sizes,
                   jnp.asarray(q), margin) for q in qs]
        float(outs[-1][0][0, 0])
        best = min(best, (time.perf_counter() - t0 - rpc) / len(qs))

    # Margin auto-calibration on hardware (corpus-sampled probe queries);
    # the margin is a dynamic scalar, so the pruned timing reuses fn.
    m = sivf.calibrate_margin(target_overlap=0.95)
    row = {
        "n": N1,
        "mesh_devices": P,
        "build_device_s": round(build_s, 2),
        "qps_q32": round(Q / best, 1),
        "recall_at_10_vs_int8_exact": round(rec, 4),
        "calibrated_margin": m,
    }
    if m is not None:
        marg = jnp.float32(m)
        bestp = 1e9
        for _ in range(REPS):
            t0 = time.perf_counter()
            outs = [fn(sivf.centroids, sivf.data, sivf.rscales, sivf.sizes,
                       jnp.asarray(q), marg) for q in qs]
            float(outs[-1][0][0, 0])
            bestp = min(bestp, (time.perf_counter() - t0 - rpc) / len(qs))
        hits_p = sivf.search(qs[0], K)
        row["qps_q32_pruned"] = round(Q / bestp, 1)
        row["recall_at_10_pruned"] = round(float(np.mean([
            len({int(s) for s, _ in hits_p[i]} & set(ei[i].tolist())) / K
            for i in range(Q)
        ])), 4)
    return row


def bench_sotu() -> dict:
    """BASELINE config 1 on the real corpus: the reference's own demo
    document (state_of_the_union_2023.txt) through the serving stack —
    windows -> full MiniLM-L12 encode -> int8 fused index — so ingest
    throughput, query latency and int8-vs-f32 recall are measured on
    embedding-distributed vectors, not Gaussians."""
    import tempfile

    import numpy as np

    from memex_tpu.config import Settings
    from memex_tpu.db import queue
    from memex_tpu.runtime import Runtime
    from memex_tpu.worker import Worker

    path = "/root/reference/example_docs/state_of_the_union_2023.txt"
    if not os.path.exists(path):
        return {"skipped": "reference corpus not present"}
    with open(path, "r", encoding="utf-8") as fh:
        text = fh.read()

    tmp = tempfile.mkdtemp(prefix="memex_sotu_")
    settings = Settings.from_env(
        db_uri=f"sqlite://{tmp}/sotu.db",
        vector_uri=f"tpu://{tmp}/vec?dtype=int8",
        embedding_model="random",  # full L12 architecture, deterministic init
    )
    rt = Runtime(settings)
    # Warm every encode bucket the doc will hit (tunnel compiles are
    # ~30-60s each and would otherwise land inside the ingest timing).
    segments, vecs = rt.engine.encode(text)

    t0 = time.perf_counter()
    queue.enqueue(rt.db, "sotu", text, queue.TaskType.Ingest)
    worker = Worker(rt, poll_interval=0.005)
    assert worker.drain(timeout=600)
    ingest_s = time.perf_counter() - t0
    store = rt.store("sotu")

    queries = [
        "jobs and the state of the economy",
        "the war in ukraine and our allies",
        "lowering the price of insulin and health care",
        "police reform and public safety",
        "american manufacturing and infrastructure",
        "climate and clean energy investment",
        "taxes on the wealthiest corporations",
        "fentanyl and the opioid epidemic",
    ]
    rt.search_batcher.search("sotu", "warm the fused query path", 3)
    lat = []
    for i, q in enumerate(queries * 6):
        t0 = time.perf_counter()
        rt.search_batcher.search("sotu", q, 3)
        lat.append(time.perf_counter() - t0)
    lat = np.sort(np.array(lat))

    # Text-mode recall: the int8 store's top-10 vs the exact f32 oracle on
    # the SAME real-text embeddings.
    qvecs = rt.engine.encode_batch(queries)
    exact = np.argsort(-(qvecs @ vecs.T), axis=1)[:, :10]
    hits = store.search_batch(qvecs, 10)
    id_of = {f: i for i, f in enumerate(store.index.ids)}
    rec = []
    for qi in range(len(queries)):
        got = {id_of.get(h.id, -1) for h in hits[qi]}
        rec.append(len(got & set(exact[qi].tolist())) / 10.0)
    return {
        "windows": len(segments),
        "ingest_s": round(ingest_s, 2),
        "query_p50_ms": round(float(lat[len(lat) // 2] * 1e3), 2),
        "top3_score": round(float(hits[0][0].score), 4) if hits[0] else None,
        "recall_at_10_int8_vs_f32": round(float(np.mean(rec)), 4),
    }


def bench_bulk_load() -> float:
    """Seconds to bulk-load 1M int8 rows into the mesh-sharded index
    through the single-dispatch SPMD write path."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from memex_tpu.index.sharded import ShardedFlatIndex

    mesh = Mesh(np.array(jax.devices()), ("shard",))
    n_dev = len(jax.devices())
    idx = ShardedFlatIndex(
        dim=D, mesh=mesh, capacity_per_shard=-(-N // n_dev), dtype="int8"
    )
    from memex_tpu.native_lib import np_normalize_rows

    rng = np.random.default_rng(0)
    vecs = np_normalize_rows(rng.standard_normal((N, D)).astype(np.float32))
    ids = [f"r{i}" for i in range(N)]
    t0 = time.perf_counter()
    idx.add(vecs, ids)
    jax.block_until_ready(idx.buf)
    float(idx.alive[0])  # force through the tunnel
    elapsed = time.perf_counter() - t0
    del idx, vecs
    return elapsed


def bench_llm() -> dict:
    """Local-LLM decode throughput (benchmarks/llm_bench.py) at the
    TinyLlama-1.1B geometry, bf16 weights, in a SUBPROCESS so the ~2.2GB
    of params never share HBM with the index stages. Reference point:
    GGML q4 CPU decode ~10 tok/s for 7B-class models (the reference's
    clippy prints predict time, examples/clippy/src/main.rs:242)."""
    import subprocess

    proc = subprocess.run(
        [sys.executable, "-m", "memex_tpu.benchmarks.llm_bench",
         "--geometry", "tinyllama-1.1b", "--param-dtype", "bfloat16"],
        capture_output=True, text=True, timeout=1800,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    if proc.returncode != 0:
        raise RuntimeError(f"llm_bench failed: {proc.stderr[-500:]}")
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    out.pop("backend", None)
    return out


def bench_e2e() -> dict:
    """Serving-path numbers: encode (full MiniLM-L12 architecture) +
    fused search per query, and worker ingest docs/sec."""
    import numpy as np

    from memex_tpu.config import Settings
    from memex_tpu.db import queue
    from memex_tpu.runtime import Runtime
    from memex_tpu.worker import Worker

    import tempfile

    tmp = tempfile.mkdtemp(prefix="memex_bench_")
    settings = Settings.from_env(
        db_uri=f"sqlite://{tmp}/bench.db",
        vector_uri=f"tpu://{tmp}/vec?dtype=int8",
        embedding_model="random",  # full MiniLM-L12 architecture, random init
    )
    rt = Runtime(settings)

    # -- ingest docs/sec through the queue + worker pipeline -----------------
    n_docs = 64
    doc = ("tpu chips multiply large matrices quickly and semantic search "
           "finds meaning in documents rather than keywords. " * 6)
    worker = Worker(rt, poll_interval=0.001)
    # Warm every batch bucket the ingest path can hit (compiles ~30-60s
    # each through the tunnel and would otherwise land inside the timing):
    # single-doc and microbatched (up to max_active docs per device call).
    rt.engine.encode(doc)
    rt.engine.encode_many([doc] * rt.settings.worker_max_active)
    queue.enqueue_many(
        rt.db, [("bench", f"{doc} doc {i}", queue.TaskType.Ingest) for i in range(n_docs)]
    )
    t0 = time.perf_counter()
    assert worker.drain(timeout=1200)
    ingest_s = time.perf_counter() - t0
    store = rt.store("bench")

    # -- query p50/p99 through the API data path: microbatcher -> fused
    #    encode+scan (one dispatch, one fetch) ---------------------------------
    lat = []
    rt.search_batcher.search("bench", "warm up the fused query path", K)
    for i in range(100):
        t0 = time.perf_counter()
        rt.search_batcher.search("bench", f"how do tpus find meaning {i}", K)
        lat.append(time.perf_counter() - t0)
    lat = np.sort(np.array(lat))

    # -- concurrent front-end throughput: 8 API-like threads issuing
    #    synchronous searches. They share one microbatched device dispatch
    #    per window and hydrate over PER-THREAD sqlite connections
    #    (round-2: the single-mutex control plane was the host-side
    #    ceiling), so aggregate QPS should approach threads/RTT. ----------
    import threading

    n_threads, per = 8, 32
    errs: list[BaseException] = []

    def _client(t: int) -> None:
        try:
            for i in range(per):
                rt.search_batcher.search("bench", f"client {t} query {i}", K)
        except BaseException as exc:  # noqa: BLE001 — surfaced below
            errs.append(exc)

    wall = 0.0
    for _round in range(2):  # round 1 warms the Q>1 batch buckets
        threads = [threading.Thread(target=_client, args=(t,)) for t in range(n_threads)]
        t0 = time.perf_counter()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        wall = time.perf_counter() - t0
        if errs:
            raise errs[0]
    return {
        "ingest_docs_per_s": n_docs / ingest_s,
        "query_p50_ms": float(lat[49] * 1e3),
        "query_p99_ms": float(lat[98] * 1e3),
        "query_concurrent_qps": round(n_threads * per / wall, 1),
        "query_store_rows": store.count,
    }


def _measure_rpc() -> float:
    """Tunnel RPC roundtrip, median of many samples. The rpc estimate is
    subtracted once per timing chain, so with R-batch chains an error of E
    shifts every per-batch time by E/R — a single +19ms outlier sample
    inflated Q=256 QPS 2.3x in one recorded run. The median of 15 warm
    scalar fetches is stable to ~1-2ms."""
    import jax.numpy as jnp
    import numpy as np

    tiny = jnp.zeros(())
    float(tiny + 1)  # warm the eager add + any first-fetch setup
    samples = []
    for i in range(15):
        t0 = time.perf_counter()
        float(tiny + (2 + i))
        samples.append(time.perf_counter() - t0)
    return float(np.median(samples))


def _stage_guard(extras: dict, key: str, fn):
    """Run one bench stage; on failure record the message in the JSON and
    the full traceback on stderr (the JSON line is the driver artifact,
    stderr is the debugging artifact)."""
    import gc
    import traceback

    try:
        out = fn()
        if out is not None:
            extras[key] = out
    except Exception as exc:
        traceback.print_exc()
        extras[f"{key}_error"] = str(exc)[:200]
    # Drop dead device buffers before the next stage allocates: stage
    # failures can leave multi-GB arrays reachable only via collector
    # cycles (exception frames), and the next stage's peak needs them gone.
    gc.collect()
    _hbm_report(f"after {key}")


def _hbm_report(tag: str) -> None:
    """HBM telemetry (stderr): what is still device-resident at a stage
    boundary — the forensic line when a later stage OOMs."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats() or {}
        used = stats.get("bytes_in_use")
        if used is not None:
            print(f"[bench] {tag}: {used / 2**30:.2f} GiB in use",
                  file=sys.stderr)
    except Exception:
        pass


def main() -> None:
    _enable_compile_cache()
    import jax

    rpc = _measure_rpc()
    print(f"[bench] rpc estimate: {rpc * 1e3:.1f} ms", file=sys.stderr)
    _hbm_report("at start")
    results = bench_kernels(rpc)
    _hbm_report("after kernels")
    eligible = {k: v for k, v in results.items() if v["recall_at_10"] >= RECALL_BAR}
    if not eligible:
        # A recall regression is exactly what this bench exists to surface:
        # still emit the JSON line (flagged) instead of dying on max({}).
        eligible = results
    best = max(eligible, key=lambda k: eligible[k]["qps"])

    extras = {}
    if not os.environ.get("MEMEX_BENCH_SKIP_10M"):
        _stage_guard(extras, "scale_10M", lambda: bench_scale_10m(rpc))
    _stage_guard(extras, "sharded_ivf_1M", lambda: bench_sharded_ivf(rpc))
    _stage_guard(extras, "bulk_load_1M_s", lambda: round(bench_bulk_load(), 2))
    _stage_guard(extras, "sotu_e2e", bench_sotu)

    def _e2e():
        extras.update({k: (round(v, 2) if isinstance(v, float) else v)
                       for k, v in bench_e2e().items()})

    _stage_guard(extras, "e2e", _e2e)
    _stage_guard(extras, "llm_decode", bench_llm)

    print(json.dumps({
        "metric": "flat_search_qps_per_chip_1M_384d",
        "value": round(results[best]["qps"], 1),
        "unit": "queries/sec",
        "vs_baseline": round(results[best]["qps"] / BASELINE_QPS, 3),
        "storage_tier": best,
        "recall_at_10_vs_exact": round(results[best]["recall_at_10"], 4),
        "p50_batch_ms": round(results[best]["p50_batch_ms"], 3),
        "query_batch": results[best]["query_batch"],
        "tiers": {
            k: {"qps": round(v["qps"], 1), "recall": round(v["recall_at_10"], 4),
                "q": v["query_batch"]}
            for k, v in results.items()
        },
        "e2e": extras,
        "corpus": N,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
