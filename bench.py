"""Benchmark harness — run on real TPU hardware by the driver.

Headline: search QPS/chip on a 1M x 384 corpus (BASELINE.json north star:
>=10k QPS/chip with >=95% recall@10). Storage tiers measured in one run:
f32 (exact scan), bf16, int8 (per-row scales), int8q (queries quantized
too -> s8xs8 MXU dot), int4 (packed nibbles + exact int8 rerank), plus
larger query batches for the fast tiers (the scan is HBM-bound, so QPS
scales with Q at near-constant per-batch latency). The headline value is
the fastest row clearing the 0.95 recall bar against the exact oracle.

Survivability (round-2 lesson: BENCH_r02 died rc=124 with zero parsed
output): the FULL JSON line is printed after every tier and re-printed,
enriched, after every stage — the driver keeps the last parseable line,
so a timeout can only truncate coverage, never void the round. Every
stage carries a wall-clock estimate and is skipped (recorded in
"skipped_stages") once the budget (MEMEX_BENCH_BUDGET_S, default 3000s)
cannot cover it. Stage order is headline-first.

Roofline telemetry: every tier reports achieved TOPS / HBM GB/s and % of the
v5e peaks (394 int8 TOPS, 197 bf16 TFLOPS, 819 GB/s) so kernel
regressions read as a %-of-peak drop, not a noisy QPS delta.

Timing: per-call wall timing is unreliable through the remote-TPU tunnel
(async dispatch; ~30ms host<->device RPC), so we dispatch R batches
back-to-back and fetch one scalar from the LAST result — device execution
is in-order, so the fetch syncs the whole chain; measured RPC roundtrip is
subtracted once. Tier timing is best-of-3 (tunnel throughput is noisy).
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

# v5e single-chip peaks (public spec): the telemetry denominators.
PEAK_INT8_TOPS = 394.0
PEAK_BF16_TFLOPS = 197.0
PEAK_F32_TFLOPS = 66.0    # f32 matmul ~= 3-pass bf16 on the MXU
PEAK_HBM_GBPS = 819.0

# Per-tier roofline spec: bytes/row read by the scan and the compute peak
# its dots run against. ops/batch = 2*N*D*Q for every tier (the int4
# deferred path dots the hi nibble at full D).
TIER_ROOFLINE = {
    "f32":        (D * 4,     PEAK_F32_TFLOPS),
    "bf16":       (D * 2,     PEAK_BF16_TFLOPS),
    "int8":       (D + 4,     PEAK_BF16_TFLOPS),   # dequant -> bf16 dots
    "int8q":      (D + 4,     PEAK_INT8_TOPS),
    "int8q_q128": (D + 4,     PEAK_INT8_TOPS),
    "int8q_q256": (D + 4,     PEAK_INT8_TOPS),
    "int8q_q512": (D + 4,     PEAK_INT8_TOPS),
    "int4":       (D // 2 + 4, PEAK_BF16_TFLOPS),
    "int4_q128":  (D // 2 + 4, PEAK_BF16_TFLOPS),
    # refine tiers: the SCAN reads the same bytes as their coarse tier
    # (the residual table is touched only by the [Q, 128, D] rerank
    # gather — noise next to the corpus read).
    "int8q_refine": (D + 4,      PEAK_INT8_TOPS),
    "int4_refine":  (D // 2 + 4, PEAK_BF16_TFLOPS),
}


def _roofline(name: str, qb: int, seconds: float, n_rows: int = N) -> dict:
    bytes_row, peak = TIER_ROOFLINE.get(name, (None, None))
    if bytes_row is None or seconds <= 0:
        return {}
    gbps = n_rows * bytes_row / seconds / 1e9
    tops = 2.0 * n_rows * D * qb / seconds / 1e12
    pct_hbm = 100.0 * gbps / PEAK_HBM_GBPS
    pct_mxu = 100.0 * tops / peak
    return {
        "achieved_tops": round(tops, 2),
        "hbm_gbps": round(gbps, 1),
        "pct_peak_hbm": round(pct_hbm, 1),
        "pct_peak_compute": round(pct_mxu, 1),
        "bound": "hbm" if pct_hbm >= pct_mxu else "mxu",
    }


class Reporter:
    """Holds the result document and re-prints it after every tier/stage.

    The driver keeps only a ~2000-char TAIL of stdout and parses the last
    JSON line it finds there. Round 3's full doc grew past that buffer and
    the headline keys (front of the dict) were exactly what got truncated
    off — so every emit() now prints the full doc (human/debug artifact)
    followed by a COMPACT summary line guaranteed < 1500 chars (driver
    artifact). The compact line is always last, so it is always the line
    the driver parses."""

    def __init__(self) -> None:
        self.doc = {
            "metric": "flat_search_qps_per_chip_1M_384d",
            "value": 0.0,
            "unit": "queries/sec",
            "vs_baseline": 0.0,
            "tiers": {},
            "e2e": {},
            "skipped_stages": [],
            "corpus": N,
        }

    def set_headline(self, results: dict) -> None:
        eligible = {k: v for k, v in results.items()
                    if v["recall_at_10"] >= RECALL_BAR}
        if not eligible:
            # A recall regression is exactly what this bench exists to
            # surface: still emit (flagged) instead of dying on max({}).
            eligible = results
        best = max(eligible, key=lambda k: eligible[k]["qps"])
        b = results[best]
        self.doc.update({
            "value": round(b["qps"], 1),
            "vs_baseline": round(b["qps"] / BASELINE_QPS, 3),
            "storage_tier": best,
            "recall_at_10_vs_exact": round(b["recall_at_10"], 4),
            "p50_batch_ms": round(b["p50_batch_ms"], 3),
            "query_batch": b["query_batch"],
        })
        self.doc["tiers"] = {
            k: {"qps": round(v["qps"], 1),
                "recall": round(v["recall_at_10"], 4),
                "q": v["query_batch"], **v.get("roofline", {})}
            for k, v in results.items()
        }

    def compact(self) -> dict:
        """Headline digest, guaranteed to fit the driver's tail buffer.

        Pulls the round-gating numbers (verdict r03 item 1): headline QPS
        + recall, 10M-tier operating point, realtext tie-aware recall for
        f32/int8, LLM stream throughput, HNSW comparisons, skip count."""
        e2e = self.doc.get("e2e", {})
        c: dict = {
            "metric": self.doc["metric"],
            "value": self.doc["value"],
            "unit": self.doc["unit"],
            "vs_baseline": self.doc["vs_baseline"],
            "storage_tier": self.doc.get("storage_tier"),
            "recall_at_10_vs_exact": self.doc.get("recall_at_10_vs_exact"),
            "query_batch": self.doc.get("query_batch"),
            "backend": self.doc.get("backend"),
        }
        # Errored stages FIRST (r4 verdict item 3: the compact line read
        # all-green through a stage crash — `skipped_stages: 0` while the
        # LLM stage's *_error sat only in the sidecar). Placed ahead of
        # every optional key so the fit-trimming loop can never drop it.
        def _find_errors(node, depth=0):
            if depth > 3 or not isinstance(node, dict):
                return
            for k, v in node.items():
                if k.endswith("_error") and v:
                    yield k.removesuffix("_error")
                else:
                    yield from _find_errors(v, depth + 1)

        errored = sorted(set(_find_errors(self.doc)))
        c["errors"] = len(errored)
        if errored:
            c["error_stages"] = errored
        s10 = e2e.get("scale_10M") or {}
        if s10:
            pr = s10.get("ivf_pruned") or {}
            best95 = pr.get("best_at_95") or {}
            c["qps_10M_q32"] = best95.get(
                "qps_q32", s10.get("ivf_nprobe64_qps_q32"))
            # recall vs the TRUE-f32 oracle as of r5 (was int8-exact)
            c["recall_10M"] = best95.get(
                "recall_at_10", s10.get("ivf_recall_at_10_vs_exact_f32"))
            if "floor_met" in pr:
                c["recall_10M_floor_met"] = pr["floor_met"]
            if "ivf_refine_qps_q32" in s10:
                c["ivf_refine_10M"] = {
                    "qps": s10["ivf_refine_qps_q32"],
                    "recall": s10.get(
                        "ivf_refine_recall_at_10_vs_exact_f32"),
                    "tie_recall": s10.get("ivf_refine_tie_recall_at_10"),
                }
                if "ivf_refine_pruned_qps_q32" in s10:
                    c["ivf_refine_10M"].update({
                        "pruned_qps_q32": s10["ivf_refine_pruned_qps_q32"],
                        "pruned_qps_q128": s10.get(
                            "ivf_refine_pruned_qps_q128"),
                        "pruned_recall": s10.get(
                            "ivf_refine_pruned_recall_at_10_vs_exact_f32"),
                    })
        rt = e2e.get("ivf_prune_realtext") or {}
        for tier in ("float32", "int8", "int8_refine"):
            row = rt.get(tier) or {}
            if row:
                c[f"realtext_{tier}_tie_recall"] = row.get(
                    "recall_at_10_vs_exact_f32")
        for tier in ("int8q_refine", "int4_refine"):
            row = self.doc.get("tiers", {}).get(tier) or {}
            if row:
                c[tier] = {"qps": row.get("qps"),
                           "recall": row.get("recall")}
        hnsw = e2e.get("recall_vs_hnsw") or {}
        for k in ("exact_tiers_beat_hnsw", "int8q_beats_hnsw"):
            if k in hnsw:
                c[k] = hnsw[k]
        llm = e2e.get("llm_decode") or {}
        if "stream_tok_per_s" in llm:
            c["llm_stream_tok_per_s"] = llm["stream_tok_per_s"]
            # stream/batch ratio: the r3 verdict item-5 target is >=0.9x
            # (per-token RPC fetches previously cost 38%).
            if llm.get("batch_tok_per_s"):
                c["llm_stream_ratio"] = round(
                    llm["stream_tok_per_s"] / llm["batch_tok_per_s"], 3)
            if "first_token_ms" in llm:
                c["llm_first_token_ms"] = llm["first_token_ms"]
        enc = rt.get("encode_roofline") or {}
        if rt.get("encode_windows_per_s"):
            c["encode_windows_per_s"] = rt["encode_windows_per_s"]
            c["encode_bound"] = enc.get("bound")
        s1m = e2e.get("serve_1M") or {}
        if "qps" in s1m:
            c["serve_1M"] = {"qps": s1m["qps"], "p50_ms": s1m["p50_ms"],
                             "vs_capability": s1m["qps_vs_capability"]}
        c["skipped_stages"] = len(self.doc.get("skipped_stages", []))
        c["elapsed_s"] = self.doc.get("elapsed_s", 0)
        # Belt and braces: never let the driver artifact outgrow its
        # buffer — drop trailing optional keys (everything after the
        # headline four) until it fits.
        while len(json.dumps(c)) > 1500 and len(c) > 4:
            c.pop(list(c.keys())[-1])
        return c

    def emit(self) -> None:
        print(json.dumps(self.doc), flush=True)
        # Driver-parsed line: must be LAST and must fit a 2000-char tail.
        print(json.dumps(self.compact()), flush=True)
        # Full-doc sidecar: the driver artifact keeps only the compact
        # line, so the complete evidence doc (per-tier rooflines, 10M
        # sweep, serve percentiles, ...) is persisted to disk where the
        # end-of-round snapshot commit picks it up. main() sets the path;
        # unit tests that drive Reporter directly never write files.
        path = os.environ.get("MEMEX_BENCH_DOC_PATH")
        if path:
            try:
                tmp = path + ".tmp"
                with open(tmp, "w", encoding="utf-8") as fh:
                    json.dump(self.doc, fh, indent=1)
                os.replace(tmp, path)
            except OSError:
                pass  # evidence sidecar must never kill the bench


def _enable_compile_cache() -> None:
    """Shared persistent-cache policy (memex_tpu/compile_cache.py):
    TPU-only, no-op on the CPU backend — see that module for why."""
    from memex_tpu.compile_cache import enable_compile_cache

    enable_compile_cache()


def _resolve_weights() -> tuple[str, str, str | None]:
    """Real all-MiniLM-L12-v2 weights when present; one bounded download
    attempt when the host has egress; otherwise an EXPLICIT recorded
    fallback (round-2 verdict item 2 — never a silent 'random').
    Returns (embedding_model arg, 'real'|'random', fallback_reason)."""
    needed = ("model.safetensors", "config.json", "vocab.txt")
    here = os.path.dirname(os.path.abspath(__file__))
    cands = [os.environ.get("MEMEX_MINILM_DIR"),
             os.path.join(here, "models", "all-MiniLM-L12-v2"),
             os.path.expanduser("~/.cache/memex/models/all-MiniLM-L12-v2")]
    for c in cands:
        if c and all(os.path.exists(os.path.join(c, f)) for f in needed):
            return c, "real", None
    import socket

    try:
        socket.create_connection(("huggingface.co", 443), timeout=5).close()
    except OSError as exc:
        return ("random", "random",
                f"offline, cannot fetch all-MiniLM-L12-v2 ({exc})")
    import subprocess

    tgt = cands[1]
    try:
        r = subprocess.run(
            [sys.executable, "-m", "memex_tpu", "download-model",
             "--target", tgt],
            capture_output=True, text=True, timeout=900, cwd=here)
    except Exception as exc:  # pragma: no cover - network path
        return "random", "random", f"download error: {exc}"
    if r.returncode == 0 and all(
            os.path.exists(os.path.join(tgt, f)) for f in needed):
        return tgt, "real", None
    return "random", "random", f"download failed: {r.stderr[-160:]}"


def bench_kernels(rpc: float, on_tier=None) -> dict:
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
        quantize_rows_int8_refine,
    )
    from memex_tpu.ops.topk import score_topk

    db = jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.float32)
    db = db / jnp.linalg.norm(db, axis=1, keepdims=True)
    db16 = db.astype(jnp.bfloat16)
    db8, scales, rq8, rsc2 = quantize_rows_int8_refine(db)
    db4t, _ = quantize_rows_int4(db)

    # Residual-refinement tiers (r3 verdict items 2/7): coarse kernel
    # over-fetches a candidate bank, then the refine rerank reconstructs
    # candidates at ~14 effective bits (coarse + residual codes) and
    # re-scores at HIGHEST precision — composed into ONE executable
    # (_search_rerank_fused, the production path: the two-call form paid
    # a ~0.1ms second dispatch per batch, ~20% of the int8q batch time).
    # The defaults engage the keep2 fold (best-two-per-slot candidate
    # bank) and banks=16 for the int4 coarse scan: the 0.9906/0.9812
    # recall plateaus were two-winner slot collisions (the SAME 3/320
    # oracle rows lost at every bank width, each congruent to another
    # top-10 row mod S) — keep2 removes them, measured recall@10 1.0000
    # vs the true f32 oracle at zero int8q QPS cost (40.26k vs 40.20k
    # intra-run) and ~11%% int4 fold cost.
    from memex_tpu.index.flat import _search_rerank_fused

    def _int8q_refine(q):
        return _search_rerank_fused(
            db8, scales, None, rq8, rsc2, None, N, q, K, 64, 64, 8192,
            True, False, "int8", False, False)

    def _int4_refine(q):
        return _search_rerank_fused(
            db4t, scales, db8, rq8, rsc2, None, N, q, K, 64, 128, 32768,
            True, True, "int4", False, False)

    # Tier rows: (name, query_batch, fn). Bigger-Q rows exist because the
    # scan is HBM-bound and Q-independent until the slot fold saturates
    # the VPU: throughput keeps climbing past Q=32 at near-unchanged
    # per-batch time; past the HBM/MXU crossover (Q~256) the tiers measure
    # how close the kernel sits to the s8xs8 roofline.
    tiers = [
        # f32 is the EXACT tier: exact-precision MXU multi-pass + keep2
        # fold, so selection is exact end-to-end (the bf16-input single-
        # winner variant read 0.9844 — slot collisions + mantissa noise).
        # Both ride in the HBM shadow: the f32 scan runs <20% compute peak.
        ("f32", Q, lambda q: fused_score_topk(db, q, K, count=N, block_n=2048,
                                              exact=True, keep2=True)),
        ("bf16", Q, lambda q: fused_score_topk(db16, q, K, count=N, block_n=1024)),
        ("int8", Q, lambda q: fused_score_topk_int8(
            db8, scales, q, K, count=N, block_n=1024)),
        ("int8q", Q, lambda q: fused_score_topk_int8q(
            db8, scales, q, K, count=N, block_n=8192, banks=4)),
        ("int4", Q, lambda q: fused_score_topk_int4_rerank(
            db4t, scales, db8, q, K, count=N, rerank=64, block_n=32768,
            deferred=True)),  # hi-only unpack: 2.6x at Q=32 (VPU-bound)
        ("int8q_refine", Q, _int8q_refine),
        ("int4_refine", Q, _int4_refine),
        ("int8q_q128", 128, lambda q: fused_score_topk_int8q(
            db8, scales, q, K, count=N, block_n=32768, banks=4)),
        ("int8q_q256", 256, lambda q: fused_score_topk_int8q(
            db8, scales, q, K, count=N, block_n=32768, banks=4)),
        # Q=512: block 16384 is the measured sweet spot (372k vs 354k at
        # 32768 — the [512, block] fold working set spills registers at
        # wider blocks; 65536 OOMs VMEM on spill slots alone).
        ("int8q_q512", 512, lambda q: fused_score_topk_int8q(
            db8, scales, q, K, count=N, block_n=16384, banks=4)),
        ("int4_q128", 128, lambda q: fused_score_topk_int4_rerank(
            db4t, scales, db8, q, K, count=N, rerank=64, block_n=32768,
            deferred=False)),
    ]
    oracle_q = jax.random.normal(jax.random.PRNGKey(2), (Q, D), jnp.float32)
    # exact_f32 (HIGHEST), not the bf16 "exact" path: the bf16 oracle's
    # ~8e-4 score noise exceeds real rank-10/11 gaps (1e-3 min here), so
    # it disagreed with TRUE top-10 answers on ~1.5% of rows — the refine
    # tiers plateaued at 0.9844 measured when they were returning the
    # genuine top-10 (round 4 diagnosis: f32-exact rerank of a bank with
    # 0.9906 coverage also "scored" 0.9844 vs that oracle).
    _, ei = score_topk(db, oracle_q, K, method="exact_f32")
    ei = np.asarray(ei)

    results = {}
    for name, qb, fn in tiers:
        # Chain length: the rpc estimate error divides by the chain's
        # wall time. Big-Q tiers at ~0.7ms/batch need >=96 batches so the
        # chain (~70ms) dwarfs the ~30ms rpc — at 48 the headline swung
        # ~±4% run-to-run purely on the rpc sample.
        qs = [
            jax.random.normal(jax.random.PRNGKey(2 + i), (qb, D), jnp.float32)
            for i in range(R if qb <= Q else 96)
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
                         "recall_at_10": rec, "query_batch": qb,
                         "roofline": _roofline(name, qb, best)}
        if on_tier is not None:
            on_tier(results)

    # Release the big buffers before the next stage: the tier lambdas
    # close over them, so the list must go too or nothing frees — and the
    # loop variable `fn` still references the LAST tier's lambda (pinning
    # its closure: db4t + db8 + scales), so it must go as well.
    del tiers, db, db16, db8, db4t, scales, rq8, rsc2, fn, outs, qs
    del _int8q_refine, _int4_refine  # closures pin db8/rq8/scales
    return results


def bench_scale_10m(rpc: float) -> dict:
    """10M-row tier, fully device-resident (BASELINE.md config: 10M IVF).

    The corpus is generated and quantized ON DEVICE (10M x 384 f32 would be
    15 GB and ~8 min through the tunnel). Because generation is
    deterministic, the recall oracle is TRUE f32 (r5): the f32 corpus is
    regenerated block by block through an exact HIGHEST-precision scan —
    no int8 anywhere in the oracle (the int8-exact figure is kept for
    cross-round continuity only). The IVF build uses build_device()
    (device argsort + scatter packing), and a residual-refine tier derives
    its codes on device the same way. Reported: flat-scan QPS at Q=128
    (best batched throughput), IVF probe QPS at Q=32 (low-latency tier),
    recall + tie-aware recall vs exact-f32, refine row, and build times.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from memex_tpu.index.ivf import IVFIndex
    from memex_tpu.ops.fused_topk import fused_score_topk_int8q, quantize_rows_int8

    # Scale is env-overridable so stage changes can be smoke-tested on the
    # real chip in ~1/10th the time (MEMEX_BENCH_10M_BLOCKS=1 -> 1M rows)
    # without burning a 10M build on plumbing bugs.
    # Generation granularity is 256k rows: every consumer of the f32
    # corpus (gen, oracle scan, residual fill) regenerates one block at a
    # time, and the residual fill runs with BOTH 4.8GB bucket tables
    # resident — a 1M f32 block (1.5GB + its residual twin) there blows
    # the ~10.5GB practical HBM budget; 256k keeps the transient under
    # ~1GB.
    BLK = 1 << 18
    N10 = int(os.environ.get("MEMEX_BENCH_10M_BLOCKS", "10")) * (1 << 20)
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

    def _v_of(key, m=BLK):
        """The f32 corpus block for `key` — DETERMINISTIC, so the true-f32
        oracle below can regenerate any block without ever materializing
        the 15GB f32 corpus (r4 verdict item 4c: the int8-exact oracle is
        exactly the oracle class the realtext stage proved can hide large
        errors)."""
        ka, kb = jax.random.split(key)
        asg = jax.random.randint(ka, (m,), 0, CENTERS)
        v = centers[asg] + sigma * jax.random.normal(kb, (m, D), jnp.float32)
        return v / jnp.linalg.norm(v, axis=1, keepdims=True)

    @jax.jit
    def gen_block(key):
        return quantize_rows_int8(_v_of(key))

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
    flat_roof = _roofline("int8q_q128", 128, best, n_rows=N10)
    ei = np.asarray(flat(qs32[0])[1])  # int8-exact ids (legacy comparison)
    # The `flat` closure pins vecs/scales; drop it so the later
    # `del vecs, scales` actually frees the 3.8GB corpus copy and the IVF
    # stage doesn't run with corpus + bucket table both resident.
    del flat

    # --- true-f32 oracle (r4 verdict item 4c): stream the REGENERATED f32
    # corpus block by block through an exact HIGHEST-precision scan with a
    # running top-K merge. No host transfer, no int8 anywhere in the
    # oracle: recall below is vs the scores the reference itself would
    # compute (it always stores/scores f32, storage/local.rs:71-91).
    from memex_tpu.ops.topk import blockwise_topk

    @jax.jit
    def oracle_block(key, q, run_v, run_i, base):
        v = _v_of(key)
        s = jnp.einsum("qd,nd->qn", q, v,
                       precision=jax.lax.Precision.HIGHEST)
        bv, bi = blockwise_topk(s, K)
        allv = jnp.concatenate([run_v, bv], axis=1)
        alli = jnp.concatenate([run_i, bi.astype(jnp.int32) + base], axis=1)
        sel_v, sel = jax.lax.top_k(allv, K)
        return sel_v, jnp.take_along_axis(alli, sel, axis=1)

    @jax.jit
    def gather_block_scores(key, q, ids, base, acc):
        """True f32 scores for arbitrary row ids (one block's contribution;
        each valid id lands in exactly one block)."""
        v = _v_of(key)
        local = ids - base
        valid = (local >= 0) & (local < BLK)
        rows = jnp.take(v, jnp.clip(local, 0, BLK - 1).reshape(-1),
                        axis=0).reshape(ids.shape + (D,))
        sc = jnp.einsum("qd,qkd->qk", q, rows,
                        precision=jax.lax.Precision.HIGHEST)
        return acc + jnp.where(valid, sc, 0.0)

    t0 = time.perf_counter()
    run_v = jnp.full((Q, K), -jnp.inf, jnp.float32)
    run_i = jnp.full((Q, K), N10, jnp.int32)
    for i in range(N10 // BLK):
        run_v, run_i = oracle_block(jax.random.PRNGKey(100 + i), qs32[0],
                                    run_v, run_i, i * BLK)
    oracle_ids = np.asarray(run_i)          # [Q, K] true top-K row ids
    oracle_kth = np.asarray(run_v)[:, -1]   # K-th best TRUE score per query
    oracle_s = time.perf_counter() - t0

    def true_scores(ids_np: np.ndarray) -> np.ndarray:
        acc = jnp.zeros(ids_np.shape, jnp.float32)
        idsd = jnp.asarray(ids_np, jnp.int32)
        for i in range(N10 // BLK):
            acc = gather_block_scores(jax.random.PRNGKey(100 + i), qs32[0],
                                      idsd, i * BLK, acc)
        out = np.asarray(acc, np.float64)
        out[ids_np >= N10] = -np.inf  # sentinel / post-oracle adds
        return out

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
    # tunnel and would measure the link, not the index). The batch-union
    # kernel (ops/ivf_batch.py): each probed cluster is read once per
    # BATCH, so QPS scales with Q while per-batch bytes saturate at the
    # unique-cluster union.
    from memex_tpu.ops.ivf_batch import ivf_batch_search

    def ivf_dev(q):
        return ivf_batch_search(ivf.centroids, ivf.data, ivf.rscales,
                                ivf.sizes, jnp.asarray(q), ivf.nprobe, K,
                                banks=ivf._batch_banks())

    from memex_tpu.ops.ivf_batch import route_union

    _, na_full = route_union(ivf.centroids, qs32[0], ivf.nprobe)
    union_full = int(na_full[0])
    M_bucket = int(ivf.data.shape[1])

    def _ivf_roof(union: int, qb: int, seconds: float) -> dict:
        """Probe-scan roofline: per batch the kernel reads the probed
        UNION's buckets once (int8 codes + f32 scales)."""
        if seconds <= 0:
            return {}
        byts = union * M_bucket * (D + 4)
        gbps = byts / seconds / 1e9
        tops = 2.0 * union * M_bucket * D * qb / seconds / 1e12
        return {"hbm_gbps": round(gbps, 1),
                "pct_peak_hbm": round(100 * gbps / PEAK_HBM_GBPS, 1),
                "achieved_tops": round(tops, 2),
                "pct_peak_compute": round(100 * tops / PEAK_INT8_TOPS, 1)}

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
                          "p50_batch_ms": round(best * 1e3, 3),
                          "roofline": _ivf_roof(union_full, qb, best)}
        if name == "q32":
            best32 = best
    # Recall through the full index path (bucket + spill + id mapping),
    # hits and oracle on the SAME query batch. Primary yardstick is the
    # TRUE-f32 oracle (r4 verdict item 4c); the int8-exact figure stays
    # for cross-round continuity.
    hits = ivf.search(np.asarray(qs32[0]), K)

    def _id_recall(hits_list, oracle) -> float:
        return float(np.mean([
            len({int(s) for s, _ in hits_list[i][:K]}
                & set(int(x) for x in oracle[i])) / K
            for i in range(Q)
        ]))

    rec = _id_recall(hits, ei)
    rec_f32 = _id_recall(hits, oracle_ids)

    # Tie-aware recall vs the TRUE-f32 oracle: a returned row counts iff
    # its true f32 score >= the oracle's K-th best, eps=0. Clustered
    # corpora tie below int8 (and sometimes f32) resolution — many rows
    # from one center — so id-recall charges tie-break order; this
    # yardstick doesn't, and unlike r4's table-dequant scoring it cannot
    # inherit int8 quantization noise on EITHER side.
    def _tie_recall(hits_list) -> float:
        got = np.full((Q, K), N10, np.int64)  # N10 = sentinel (empty)
        for qi in range(Q):
            for j, (sid, _) in enumerate(hits_list[qi][:K]):
                got[qi, j] = int(sid)
        g_sc = true_scores(got)
        return float(np.mean(np.sum(g_sc >= oracle_kth[:, None], axis=1) / K))

    tie_rec = _tie_recall(hits)

    # Row-id -> bucket-slot map (device): used by the residual fill below.
    Cb, Mb = int(ivf.data.shape[0]), int(ivf.data.shape[1])
    rid_flat = ivf._rowids_dev.reshape(-1)
    pos_of_row = (jnp.full((N10 + 1,), Cb * Mb, jnp.int32)
                  .at[jnp.where(rid_flat >= 0, rid_flat, N10)]
                  .set(jnp.arange(Cb * Mb, dtype=jnp.int32), mode="drop"))

    # --- margin-pruned routing (ops/ivf_batch.route_union prune_margin):
    # Q=32 is HBM-bound on the probed-union read, so dropping the long
    # tail of low-scoring probes converts ~1:1 into QPS. Report the union
    # shrink + recall alongside so the trade is visible, not hidden.
    def ivf_dev_pruned(q, margin):
        return ivf_batch_search(ivf.centroids, ivf.data, ivf.rscales,
                                ivf.sizes, jnp.asarray(q), ivf.nprobe, K,
                                banks=ivf._batch_banks(), prune_margin=margin)

    # The margin is a DYNAMIC scalar: one compile covers the whole sweep,
    # so the trade curve costs seconds, not a recompile per point.
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
        sweep.append({
            "margin": margin,
            "qps_q32": round(Q / bestp, 1),
            # recall vs the TRUE-f32 oracle (r4 item 4c; was int8-exact)
            "recall_at_10": round(_id_recall(hits_p, oracle_ids), 4),
            "tie_recall_at_10": round(_tie_recall(hits_p), 4),
            "union_clusters": int(na_p[0]),
        })
    ivf.prune_margin = None
    # Selection floor 0.96, reported bar 0.95 (r3 verdict item 6): the
    # recorded operating point must not sit ON the bar — 13.2k @ 0.953
    # cleared it by 0.003, inside driver-run variance. Picking the
    # fastest margin holding >=0.96 leaves headroom; the driver artifact
    # still judges against >=0.95.
    SELECTION_FLOOR = 0.96
    # When no swept margin meets the floor, EXTEND the sweep toward
    # keep-all instead of silently falling back (r4 verdict item 4b: the
    # r4 record quietly shipped 0.9531 under a 0.96 floor). The keep-all
    # point (margin=4.0 sentinel = full nprobe routing) is the recall
    # ceiling at this nprobe; if even that misses, floor_met: false goes
    # in the record.
    if not any(r["recall_at_10"] >= SELECTION_FLOOR for r in sweep):
        for margin in (0.5, 4.0):
            _, na_p = route_union(ivf.centroids, qs32[0], ivf.nprobe,
                                  prune_margin=margin if margin < 4 else None)
            bestp = 1e9
            for _ in range(REPS):
                t0 = time.perf_counter()
                outs = [ivf_dev_pruned(q, margin) for q in qs32]
                float(outs[-1][0][0, 0])
                bestp = min(bestp, (time.perf_counter() - t0 - rpc) / len(qs32))
            ivf.prune_margin = margin if margin < 4 else None
            hits_p = ivf.search(np.asarray(qs32[0]), K)
            sweep.append({
                "margin": margin,
                "qps_q32": round(Q / bestp, 1),
                "recall_at_10": round(_id_recall(hits_p, oracle_ids), 4),
                "tie_recall_at_10": round(_tie_recall(hits_p), 4),
                "union_clusters": int(na_p[0]),
            })
            ivf.prune_margin = None
            if sweep[-1]["recall_at_10"] >= SELECTION_FLOOR:
                break
    ok_floor = [r for r in sweep if r["recall_at_10"] >= SELECTION_FLOOR]
    pruned_row = {
        "union_clusters_full": union_full,
        "sweep": sweep,
        "selection_floor": SELECTION_FLOOR,
        "floor_met": bool(ok_floor),
        # Fastest operating point holding the selection floor (falls
        # back to the most-accurate margin if none holds it — and says
        # so via floor_met, never silently).
        "best_at_95": (max(ok_floor, key=lambda r: r["qps_q32"]) if ok_floor
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

    # --- residual-refine tier at 10M (r4 verdict item 4a): the corpus is
    # deterministic, so residual codes are derivable ON DEVICE — regenerate
    # each f32 block, requantize (bit-identical codes), quantize the
    # quantization residual, and scatter it into a bucket-aligned twin
    # table via pos_of_row. The rerank then reconstructs candidates at
    # ~14 effective bits (ivf._exact_topk_rerank), the same machinery the
    # 1M tiers use. Residual table = one more N*D int8 in HBM (freed
    # before the int4/rebuild stages, which need the headroom).
    refine_row = {}
    try:
        from memex_tpu.index.ivf import _exact_topk_rerank

        RER = 256

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def fill_resid(resid, rsc2, key, pos, base):
            v = _v_of(key)
            q8, s8 = quantize_rows_int8(v)  # bit-identical to the build
            r = v - q8.astype(jnp.float32) * s8[:, None]
            rq, rs = quantize_rows_int8(r)
            p = jax.lax.dynamic_slice_in_dim(pos, base, BLK)
            return (resid.at[p].set(rq, mode="drop"),
                    rsc2.at[p].set(rs, mode="drop"))

        t0 = time.perf_counter()
        resid = jnp.zeros((Cb * Mb, D), jnp.int8)
        rsc2 = jnp.zeros((Cb * Mb,), jnp.float32)
        for i in range(N10 // BLK):
            resid, rsc2 = fill_resid(resid, rsc2, jax.random.PRNGKey(100 + i),
                                     pos_of_row, i * BLK)
        ivf.resid = resid.reshape(Cb, Mb, D)
        ivf.resid_scales = rsc2.reshape(Cb, Mb)
        del resid, rsc2
        jax.block_until_ready(ivf.resid)
        resid_fill_s = time.perf_counter() - t0
        # Flip the production flags (build_device refuses refine because a
        # caller-quantized corpus has no f32 source — HERE the source is
        # the deterministic generator, so the contract is satisfied).
        ivf.refine = True
        ivf.rerank = RER

        def ivf_dev_refine(q, margin=None):
            vals, cl, sl = ivf_batch_search(
                ivf.centroids, ivf.data, ivf.rscales, ivf.sizes,
                jnp.asarray(q), ivf.nprobe, RER,
                banks=ivf._batch_banks(), keep2=True, prune_margin=margin)
            return _exact_topk_rerank(ivf.data, ivf.rscales, jnp.asarray(q),
                                      vals, cl, sl, K, resid=ivf.resid,
                                      resid_scales=ivf.resid_scales)

        def _time_refine(qset, qb, margin):
            float(ivf_dev_refine(qset[0], margin)[0][0, 0])  # compile/warm
            best = 1e9
            for _ in range(REPS):
                t0 = time.perf_counter()
                outs = [ivf_dev_refine(q, margin) for q in qset]
                float(outs[-1][0][0, 0])
                best = min(best, (time.perf_counter() - t0 - rpc) / len(qset))
            return qb / best

        qps_r32 = _time_refine(qs32, Q, None)
        hits_r = ivf.search(np.asarray(qs32[0]), K)  # full production path
        refine_row = {
            "ivf_refine_fill_s": round(resid_fill_s, 2),
            "ivf_refine_qps_q32": round(qps_r32, 1),
            "ivf_refine_recall_at_10_vs_exact_f32": round(
                _id_recall(hits_r, oracle_ids), 4),
            "ivf_refine_tie_recall_at_10": round(_tie_recall(hits_r), 4),
            "ivf_refine_rerank": RER,
        }
        # refine + margin-pruning COMPOSED (r5): the margin is a dynamic
        # scalar, so the pruned Q=32 point reuses the executable, and the
        # refine rerank rescues the bank/tie losses the stricter f32
        # oracle now charges — this is the 10M tier's route to >=0.96
        # recall at >=10k QPS (the sweep's own ceiling at nprobe=64 is
        # the plain-scan routing+bank loss). Q=128 composes the pruned
        # union with batch amortization (one fresh compile).
        qps_r32p = _time_refine(qs32, Q, bm)
        ivf.prune_margin = bm
        hits_rp = ivf.search(np.asarray(qs32[0]), K)
        ivf.prune_margin = None
        qps_r128p = _time_refine(qs128, 128, bm)
        refine_row.update({
            "ivf_refine_pruned_margin": bm,
            "ivf_refine_pruned_qps_q32": round(qps_r32p, 1),
            "ivf_refine_pruned_qps_q128": round(qps_r128p, 1),
            "ivf_refine_pruned_recall_at_10_vs_exact_f32": round(
                _id_recall(hits_rp, oracle_ids), 4),
            "ivf_refine_pruned_tie_recall_at_10": round(
                _tie_recall(hits_rp), 4),
        })
    except Exception as exc:  # pragma: no cover - bench resilience
        refine_row = {"ivf_refine_error": repr(exc)[:200]}
    finally:
        # Free the 4.8GB residual twin before the int4/rebuild stages.
        ivf.resid = ivf.resid_scales = None
        ivf.refine = False
        ivf.rerank = None
    del pos_of_row

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
    rec4 = _id_recall(hits4, oracle_ids)

    # --- int4 + margin pruning COMPOSED: both attack the same bottleneck
    # (probed-union bytes at Q=32 — pruning drops low-scoring clusters,
    # int4 halves bytes per surviving cluster) and the margin is a dynamic
    # scalar, so this point reuses the int4 executable compiled above.
    # Own guard: a failure here degrades to missing composed keys, it must
    # not void the rest of the 10M stage.
    int4_pruned = {}
    ivf_dev4p = None
    try:
        def ivf_dev4p(q):  # noqa: F811 — assigned for the finally-free
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
        rec4p = _id_recall(hits4p, oracle_ids)
        int4_pruned = {
            "ivf_int4_pruned_qps_q32": round(Q / best4p, 1),
            "ivf_int4_pruned_margin": bm,
            "ivf_int4_pruned_recall_at_10_vs_exact_f32": round(rec4p, 4),
        }
    except Exception as exc:  # pragma: no cover - bench resilience
        int4_pruned = {"ivf_int4_pruned_error": repr(exc)[:200]}
    finally:
        # Free the closure on BOTH paths: on an error it pins data4/rsc4
        # (~2.8GB) past the del below, shorting the rebuild stage's
        # headroom (round-2 advisor finding).
        ivf.prune_margin = None
        ivf.scan_int4 = False
        ivf_dev4p = None
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
        "flat_roofline": flat_roof,
        "ivf_build_device_s": round(build_s, 2),
        "ivf_spill_rows": spill_rows_initial,
        "ivf_nprobe64_qps_q32": ivf_rows["q32"]["qps"],
        "ivf_nprobe64_qps_q128": ivf_rows["q128"]["qps"],
        "ivf_p50_batch_ms": round(best32 * 1e3, 3),
        "ivf_p50_batch_ms_q128": ivf_rows["q128"]["p50_batch_ms"],
        "ivf_roofline_q32": ivf_rows["q32"]["roofline"],
        "ivf_roofline_q128": ivf_rows["q128"]["roofline"],
        "oracle_exact_f32_scan_s": round(oracle_s, 2),
        "ivf_recall_at_10_vs_int8_exact": round(rec, 4),
        "ivf_recall_at_10_vs_exact_f32": round(rec_f32, 4),
        "ivf_tie_recall_at_10_vs_exact_f32": round(tie_rec, 4),
        "ivf_pruned": pruned_row,
        **refine_row,
        "ivf_int4_pack_s": round(pack4_s, 2),
        "ivf_int4_qps_q32": ivf4_rows["q32"],
        "ivf_int4_qps_q128": ivf4_rows["q128"],
        "ivf_int4_recall_at_10_vs_exact_f32": round(rec4, 4),
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
    # that measures the ~30ms tunnel RPC, not the index). Cache key is
    # (kk, nprobe, refine) as of r5; a device-built corpus has no
    # residual source, so refine is False here.
    fn = sivf._search_cache[(K, sivf.nprobe, False)]
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
    del sivf

    # --- refine variant ON HARDWARE (r5): host-built 256k anisotropic
    # corpus (residual codes need an f32 source), centered int8 + per-
    # shard residual rerank before the collective merge, recall vs a
    # true-f32 HIGHEST oracle computed on device. The CPU-mesh suite
    # proves N-way partitioning; this proves the refine SPMD program
    # runs the real MXU and holds f32-fidelity recall where plain int8
    # cannot (the whole reason the tier exists, r4 verdict item 6).
    try:
        row["refine"] = _sharded_refine_hw(rpc)
    except Exception as exc:  # pragma: no cover - bench resilience
        row["refine_error"] = repr(exc)[:200]
    return row


def _sharded_refine_hw(rpc: float) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from memex_tpu.index.sharded_ivf import ShardedIVFIndex
    from memex_tpu.native_lib import np_normalize_rows

    Nr = 1 << 18
    rng = np.random.default_rng(11)
    # Anisotropic mixture at pairwise cos ~0.99: ranking information sits
    # below raw-int8 resolution — the regime centering + refine exist for
    # (random-weight sentence embeddings measure mean cos ~0.995).
    mu = np_normalize_rows(rng.standard_normal((1, D)).astype(np.float32))[0]
    v = mu[None, :] + 0.07 * rng.standard_normal((Nr, D)).astype(np.float32)
    v = np_normalize_rows(v)
    qs = v[rng.choice(Nr, Q, replace=False)].copy()

    # True-f32 oracle on device (one HIGHEST matmul over the f32 corpus).
    vd = jnp.asarray(v)
    sc = jnp.einsum("qd,nd->qn", jnp.asarray(qs), vd,
                    precision=jax.lax.Precision.HIGHEST)
    from memex_tpu.ops.topk import blockwise_topk

    _, oracle = blockwise_topk(sc, K)
    oracle = np.asarray(oracle)
    del vd, sc

    mesh = Mesh(np.array(jax.devices()), ("shard",))
    out = {}
    for name, kw in (("plain", {}), ("refine", {"refine": True})):
        idx = ShardedIVFIndex(dim=D, mesh=mesh, n_clusters=256, nprobe=64,
                              **kw)
        t0 = time.perf_counter()
        idx.build(v, list(range(Nr)))
        build_s = time.perf_counter() - t0
        hits = idx.search(qs, K)  # warm: SPMD executable compiles HERE
        t0 = time.perf_counter()
        for _ in range(4):  # production path, per-call fetch included
            idx.search(qs, K)
        qps = 4 * Q / max(time.perf_counter() - t0, 1e-9)
        rec = float(np.mean([
            len({int(s) for s, _ in hits[i]} & set(oracle[i].tolist())) / K
            for i in range(Q)
        ]))
        out[name] = {"build_s": round(build_s, 1),
                     "qps_q32_e2e": round(qps, 1),
                     "recall_at_10_vs_exact_f32": round(rec, 4)}
        del idx
    return out


def bench_recall_vs_hnsw(rpc: float) -> dict:
    """BASELINE.json's north star as written: recall@10 vs the reference's
    HNSW index (M=16, ef_construction=200, ef_search=32 —
    /root/reference/lib/libmemex/src/storage/local.rs:101,76) on 1M 384-d
    vectors. The graph is built ONCE (single-core CPU, ~40min) and cached
    on disk (benchmarks/hnsw_recall.py); this stage reloads it, scores it
    against an exact f32 host oracle, and scores the shipping TPU tiers
    against (a) the same oracle and (b) HNSW's own top-10 directly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from memex_tpu.benchmarks import hnsw_recall as hr
    from memex_tpu.native_lib import np_quantize_rows_int8
    from memex_tpu.ops.fused_topk import fused_score_topk_int8q

    N1 = 1 << 20
    QN = 128
    seed = 1234
    t0 = time.perf_counter()
    corpus = hr.make_corpus(N1, D, seed=seed)
    gen_s = time.perf_counter() - t0
    build_env = os.environ.get("MEMEX_BENCH_BUILD_HNSW") == "1"
    graph, build_s = hr.build_or_load(corpus, seed=seed,
                                      build_if_missing=build_env)
    if graph is None:
        return {"skipped": "no cached HNSW baseline graph "
                           "(run with MEMEX_BENCH_BUILD_HNSW=1 once)"}
    queries = hr.make_queries(QN, D, seed=seed)
    exact = hr.exact_topk_host(corpus, queries, K)

    t0 = time.perf_counter()
    got = graph.search(queries, K, ef=hr.EF_SEARCH_REF)
    hnsw_ms = (time.perf_counter() - t0) / QN * 1e3
    hnsw_rec = hr.recall_against(exact, got)

    # TPU tiers on the SAME corpus/queries (host-quantized int8 shipped up
    # — the fast direction; the f32 oracle never leaves the host).
    codes, scales = np_quantize_rows_int8(corpus)
    dev_c = jax.device_put(jnp.asarray(codes))
    dev_s = jax.device_put(jnp.asarray(scales))
    qd = jnp.asarray(queries)
    ti = np.asarray(fused_score_topk_int8q(
        dev_c, dev_s, qd, K, count=N1, block_n=32768, banks=4)[1])
    int8q_rec = hr.recall_against(exact, ti)
    int8q_vs_hnsw = hr.recall_against(got, ti)

    # IVF tier (10M params scaled to 1M: C=1024, nprobe=16) with
    # recall-target prune calibration — the shipping operating point.
    from memex_tpu.index.ivf import IVFIndex

    ivf = IVFIndex(dim=D, n_clusters=1024, nprobe=16, dtype="int8",
                   bucket_factor=1.2)
    ivf.build_device(dev_c, dev_s, list(range(N1)))
    m = ivf.calibrate_margin(target_overlap=0.95, target_metric="recall")
    hits = ivf.search(queries, K)
    ivf_idx = np.asarray([[int(s) for s, _ in row] + [-1] * (K - len(row))
                          for row in hits])
    ivf_rec = hr.recall_against(exact, ivf_idx)
    ivf_vs_hnsw = hr.recall_against(got, ivf_idx)

    return {
        "n": N1,
        "corpus_gen_s": round(gen_s, 1),
        "hnsw": {
            "params": f"M{hr.M_REF}_efc{hr.EFC_REF}_ef{hr.EF_SEARCH_REF}",
            "recall_at_10_vs_exact": round(hnsw_rec, 4),
            "search_ms_per_query_cpu": round(hnsw_ms, 3),
            "qps_cpu_1core": round(1e3 / max(hnsw_ms, 1e-9), 1),
            "build_s": round(build_s, 1) if build_s else "cached",
        },
        "tiers": {
            # f32 flat is the exact oracle itself: recall vs exact = 1.0
            # by construction, so its recall vs HNSW = HNSW's own recall.
            "f32_flat": {"recall_at_10_vs_exact": 1.0,
                         "overlap_vs_hnsw_top10": round(hnsw_rec, 4)},
            "int8q_flat": {"recall_at_10_vs_exact": round(int8q_rec, 4),
                           "overlap_vs_hnsw_top10": round(int8q_vs_hnsw, 4)},
            "ivf_int8_pruned": {
                "recall_at_10_vs_exact": round(ivf_rec, 4),
                "overlap_vs_hnsw_top10": round(ivf_vs_hnsw, 4),
                "calibrated_margin": m,
            },
        },
        "exact_tiers_beat_hnsw": True,  # recall 1.0 >= hnsw_rec
        "int8q_beats_hnsw": bool(int8q_rec >= hnsw_rec),
    }


def bench_realtext_ivf() -> dict:
    """Operating point on embedding-distributed vectors (round-2 verdict
    item 6): encode real text (SOTU sentences recombined into 16k distinct
    windows) through the full MiniLM-L12 architecture, build the IVF tier
    on those embeddings, and jointly calibrate (nprobe, prune_margin) to
    the 0.95 recall-vs-exact floor. Gaussian mixtures flatter IVF — on
    this corpus a fixed nprobe=8/64 caps recall near 0.35 no matter the
    margin, so the ladder is what makes the floor reachable."""
    import numpy as np

    from memex_tpu.embed import EmbeddingEngine

    path = "/root/reference/example_docs/state_of_the_union_2023.txt"
    if not os.path.exists(path):
        return {"skipped": "reference corpus not present"}
    with open(path, "r", encoding="utf-8") as fh:
        text = fh.read()
    sents = [s.strip() for s in text.replace("\n", " ").split(".")
             if len(s.strip()) > 20]
    rng = np.random.default_rng(7)
    NW = int(os.environ.get("MEMEX_BENCH_REALTEXT_WINDOWS", "16384"))
    windows = []
    for i in range(NW):
        j = int(rng.integers(0, len(sents) - 3))
        windows.append(f"{sents[j]}. {sents[j + 1]}. {sents[j + 2]}. "
                       f"(window {i})")

    model_arg, weights, reason = _resolve_weights()
    # float16 fetch: the device->host link (~2 MB/s on the tunnel) is the
    # ingest ceiling, not the forward pass — see EmbeddingEngine.fetch_dtype.
    engine = EmbeddingEngine(model_dir=model_arg, fetch_dtype="float16")
    # Ingest roofline (r3 verdict item 4): split host-tokenize vs
    # device-forward vs result-fetch, and report encoder MFU. All chunks
    # are dispatched before any fetch (in-order device execution), so
    # "device_s" is a scalar-fetch sync on the LAST chunk and "fetch_s"
    # is pure transfer of already-computed outputs.
    import jax.numpy as _jnp

    t0 = time.perf_counter()
    from memex_tpu.text import encode_windows as _enc_win

    ids_all, mask_all = _enc_win(windows, engine.tokenizer,
                                 engine.max_seq_length)
    tokenize_s = time.perf_counter() - t0
    B = engine.max_batch
    # Warm the bulk-ingest executable BEFORE the timed section. r3/r4
    # both timed the first-call compile inside "device_s" (r3: 1,235 w/s,
    # r4: 729 — the "regression" was compile/cache-load noise of two
    # different executables, ~10-15s of a ~19s reading); steady-state
    # device throughput is ~4,300 w/s at B=512 with the bf16 residual
    # stream. The timed pass drives the PRODUCTION large-ingest path
    # (EmbeddingEngine._encode_bulk: fixed-shape super-chunk uploads +
    # on-device dynamic_slice per batch); `phases` is its own telemetry.
    engine._encode_padded(ids_all[: 8 * B], mask_all[: 8 * B])
    phases: dict = {}
    t0 = time.perf_counter()
    vecs = engine._encode_bulk(ids_all, mask_all,
                               np.empty((NW, engine.dim), np.float32),
                               phases=phases)
    encode_pass_s = time.perf_counter() - t0
    # dispatch_s includes the (overlapped) super-chunk uploads; the sync
    # point is pure remaining device time; fetch is the f16 result pull.
    device_s = phases["dispatch_s"] + phases["device_sync_s"]
    fetch_s = phases["fetch_s"]
    encode_s = tokenize_s + encode_pass_s
    vecs = vecs / np.maximum(
        np.linalg.norm(vecs, axis=1, keepdims=True), 1e-9)
    # Encoder FLOPs: 12 layers x (QKV+out projections 4*D^2, FFN 2*D*I)
    # matmul MACs per token + attention score/value matmuls 2*L*D per
    # token per layer; x2 flops/MAC.
    cfg = engine.cfg
    L = engine.max_seq_length
    per_tok = (2 * cfg.num_layers
               * (4 * cfg.hidden_size ** 2
                  + 2 * cfg.hidden_size * cfg.intermediate_size)
               + 4 * cfg.num_layers * L * cfg.hidden_size)
    tflops = NW * L * per_tok / max(device_s, 1e-9) / 1e12
    encode_roofline = {
        "tokenize_s": round(tokenize_s, 2),
        "dispatch_s": round(phases["dispatch_s"], 2),
        "device_s": round(device_s, 2),
        "fetch_s": round(fetch_s, 2),
        "fetch_dtype": engine.fetch_dtype,
        "windows_per_s_device": round(NW / max(device_s, 1e-9), 1),
        "achieved_tflops": round(tflops, 1),
        "pct_peak_mxu": round(100.0 * tflops / PEAK_BF16_TFLOPS, 1),
        "bound": max((("tokenize", tokenize_s), ("device", device_s),
                      ("fetch", fetch_s)), key=lambda kv: kv[1])[0],
    }

    qs = vecs[rng.choice(NW, size=64, replace=False)]
    # The windows oversample ~700 sentences, so ~23 windows share text
    # modulo their "(window i)" suffix — the corpus is FULL of duplicate-
    # grade ties whose gaps sit below the f32 oracle's own resolution
    # (median top1-top10 gap 7e-5, many exact ties). recall@10 is scored
    # two ways: id_recall (set overlap vs one arbitrary tie-break of the
    # oracle) and the primary tie-aware score_recall (a returned row
    # counts iff its TRUE f64 score >= the oracle's 10th-best; eps=0) —
    # the standard ANN yardstick on tied corpora. Measured: the exact-scan
    # f32 tier holds score_recall 1.0 while id_recall reads 0.917 purely
    # on tie order.
    scores_all = (qs @ vecs.T).astype(np.float64)
    exact = np.argsort(-scores_all, axis=1)[:, :K]
    kth = scores_all[np.arange(len(qs)), exact[:, K - 1]]

    from memex_tpu.index.ivf import IVFIndex

    # Corpus anisotropy diagnostic: random-weight MiniLM embeddings
    # concentrate at pairwise cos ~0.99+ (all ranking information lives in
    # a tiny residual), which is exactly the regime the centered storage +
    # exact rerank exist for. Real pretrained weights spread much wider.
    samp = vecs[rng.choice(NW, size=256, replace=False)]
    cosm = samp @ samp.T
    mean_cos = float((cosm.sum() - np.trace(cosm)) / (len(samp) ** 2 - len(samp)))
    out = {"windows": NW, "encode_s": round(encode_s, 1),
           "encode_windows_per_s": round(NW / encode_s, 1),
           "encode_roofline": encode_roofline,
           "mean_pairwise_cos": round(mean_cos, 4),
           "weights": weights}
    if reason:
        out["weights_fallback_reason"] = reason
    for tier in ("int8", "int8_refine", "float32"):
        dtype = "int8" if tier.startswith("int8") else tier
        # Bank-wide exact rerank (clamped to S in search): centered storage
        # fixes bf16 input resolution, and the full-bank re-score fixes the
        # slot-fold's coarse ranking (this corpus packs 16k windows inside
        # cos ~0.995 of each other — boundary gaps sit below ANY coarse
        # storage format's score resolution, so the slot maxima are
        # near-arbitrary picks that only an exact pass can order).
        # f32 tier additionally scans at HIGHEST precision (free: the scan
        # is HBM-bound), so the bank itself is selected by exact scores.
        # int8_refine (r3 verdict item 2): same int8 scan, but the rerank
        # reconstructs candidates from coarse+residual codes (~14 bits) —
        # the fix for the tier's quantization recall floor (0.744 here),
        # which re-dequantizing the same 8-bit codes cannot lift.
        ivf = IVFIndex(dim=vecs.shape[1], n_clusters=64, nprobe=8,
                       dtype=dtype, rerank=1024,
                       refine=tier == "int8_refine",
                       scan_precision=("highest" if dtype == "float32"
                                       else "default"))
        ivf.build(vecs, list(range(NW)))
        # Joint (nprobe, margin) calibration on corpus-sampled probe
        # queries; evaluated below on a DIFFERENT held-out sample, so the
        # recorded recall is the operating point generalizing, not the
        # calibration fitting itself.
        pt = ivf.calibrate_operating_point(target_recall=0.95)
        hits = ivf.search(qs, K)
        got = [[int(s) for s, _ in hits[i]] for i in range(len(qs))]
        rec = float(np.mean([
            np.sum(scores_all[i, got[i]] >= kth[i]) / K
            for i in range(len(qs))
        ]))
        rec_id = float(np.mean([
            len(set(got[i]) & set(exact[i].tolist())) / K
            for i in range(len(qs))
        ]))
        from memex_tpu.ops.ivf_batch import route_union
        import jax.numpy as jnp

        _, na_full = route_union(ivf.centroids, jnp.asarray(qs), ivf.nprobe)
        na_pr = na_full
        if ivf.prune_margin is not None:
            _, na_pr = route_union(ivf.centroids, jnp.asarray(qs),
                                   ivf.nprobe, prune_margin=ivf.prune_margin)
        out[tier] = {
            "operating_point": pt,
            # End-to-end vs the f32 exact oracle (routing + storage loss);
            # pt["recall_vs_full"] isolates the routing part. Primary
            # metric is tie-aware (returned row's true score >= the
            # oracle's 10th-best, eps=0); id_recall additionally charges
            # tie-break order on the duplicate-heavy windows.
            "recall_at_10_vs_exact_f32": round(rec, 4),
            "id_recall_at_10": round(rec_id, 4),
            "union_clusters_full": int(na_full[0]),
            "union_clusters_pruned": int(na_pr[0]),
        }
    return out


def bench_sotu() -> dict:
    """BASELINE config 1 on the real corpus: the reference's own demo
    document (state_of_the_union_2023.txt) through the serving stack —
    windows -> full MiniLM-L12 encode -> int8 fused index — so ingest
    throughput, query latency and int8-vs-f32 recall are measured on
    embedding-distributed vectors, not Gaussians. Uses REAL pretrained
    weights when available; records the fallback reason when not
    (air-gapped bench hosts)."""
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

    model_arg, weights, reason = _resolve_weights()
    tmp = tempfile.mkdtemp(prefix="memex_sotu_")
    settings = Settings.from_env(
        db_uri=f"sqlite://{tmp}/sotu.db",
        vector_uri=f"tpu://{tmp}/vec?dtype=int8",
        embedding_model=model_arg,
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
    out = {
        "windows": len(segments),
        "ingest_s": round(ingest_s, 2),
        "query_p50_ms": round(float(lat[len(lat) // 2] * 1e3), 2),
        "top3_score": round(float(hits[0][0].score), 4) if hits[0] else None,
        "recall_at_10_int8_vs_f32": round(float(np.mean(rec)), 4),
        "weights": weights,
    }
    if reason:
        out["weights_fallback_reason"] = reason
    return out


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

    import jax

    try:
        proc = subprocess.run(
            [sys.executable, "-m", "memex_tpu.benchmarks.llm_bench",
             "--geometry", "tinyllama-1.1b", "--param-dtype", "bfloat16"],
            capture_output=True, text=True, timeout=3000,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired:
        # Killing a mid-compile process wedges the remote compile service
        # for ~10 min (claim timeout) — record that so the next stage's
        # slowness is explainable.
        raise RuntimeError(
            "llm_bench timed out at 3000s (likely a cold generate() scan "
            "compile through the tunnel; the remote compile service may be "
            "wedged for ~10min after this kill)")
    if proc.returncode != 0:
        raise RuntimeError(f"llm_bench failed: {proc.stderr[-500:]}")
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    # Keep the child's backend and flag silent CPU fallbacks: decode tok/s
    # recorded as-if-TPU from a CPU child voids the comparison.
    if out.get("backend") != jax.default_backend():
        out["backend_mismatch"] = (
            f"child={out.get('backend')} parent={jax.default_backend()}")
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
    # Warm the whole Q-bucket lattice (r5): straggler microbatches in the
    # concurrent rounds below otherwise hit unwarmed buckets and compile
    # in-request — those compiles also polluted the serve stage's shared
    # dispatch-timer telemetry in the first full r5 run.
    rt.search_batcher.warmup("bench", K)
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


def bench_serve_1m() -> dict:
    """Concurrent serving against a 1M-row store (r3 verdict item 3; r4
    diagnosis): synchronous API-like clients drive rt.search_batcher over
    a 1M x 384 int8 FlatIndex; the microbatcher coalesces them into fused
    encode+scan dispatches (query_path.py) pipelined two-deep (batch N+1
    dispatches while batch N's ~30ms winner-fetch RPC is in flight).
    Reported against the device-capability yardstick (the same fused
    executable driven SERIALLY at the batcher's max batch): e2e must land
    within ~2x of capability, or the serving layers are the bottleneck.
    r4 postmortem: the old stage warmed only the Q=1/Q=max buckets, so
    tail microbatches hit unwarmed Q buckets and compiled ~20s INSIDE the
    timed window (58.6 QPS, 0.018x capability). warmup() now enumerates
    the whole bucket lattice, and the stage reports the batcher's own
    dispatch/complete timer split so host vs device time is visible in
    the record. A second row drives the real aiohttp server over HTTP
    (JSON + hydration tax included).
    Reference analogue: the search handler stack
    /root/reference/lib/api/src/endpoints/collections/handlers.rs:55-109,
    which re-reads the HNSW file per query."""
    import tempfile
    import threading

    import numpy as np

    from memex_tpu.config import Settings
    from memex_tpu.metrics import METRICS
    from memex_tpu.native_lib import np_normalize_rows
    from memex_tpu.runtime import Runtime

    tmp = tempfile.mkdtemp(prefix="memex_serve1m_")
    settings = Settings.from_env(
        db_uri=f"sqlite://{tmp}/serve.db",
        vector_uri=f"tpu://{tmp}/vec?dtype=int8&capacity={N}",
        embedding_model="random",
    )
    settings.port = 18231
    rt = Runtime(settings)
    store = rt.store("big")
    rng = np.random.default_rng(0)
    vecs = np_normalize_rows(rng.standard_normal((N, D)).astype(np.float32))
    t0 = time.perf_counter()
    store.index.add(vecs, [f"r{i}" for i in range(N)])
    load_s = time.perf_counter() - t0
    del vecs

    # Compile every executable the batcher can hit (all Q buckets) —
    # compiles are minutes through the tunnel and must not land inside a
    # timing. This is the same call serve startup makes.
    t0 = time.perf_counter()
    n_exec = rt.search_batcher.warmup("big", K)
    warm_s = time.perf_counter() - t0

    # Serial p50/p99: unloaded single-query latency (window wait + fused
    # dispatch + fetch + hydration).
    lat = []
    for i in range(64):
        t0 = time.perf_counter()
        rt.search_batcher.search("big", f"serial latency probe {i}", K)
        lat.append(time.perf_counter() - t0)
    lat = np.sort(np.array(lat))

    # Device-capability yardstick: the same fused encode+scan executable
    # driven back-to-back (serial dispatch+fetch) at the batcher's own
    # max batch. A pipelined batcher can legitimately EXCEED this.
    from memex_tpu.serve.query_path import FusedQueryPath

    fused = FusedQueryPath(rt.engine)
    QB = settings.search_max_batch
    probe = [f"capability probe {i}" for i in range(QB)]
    fused.search_texts(store, probe, K)  # warm (shared with batcher)
    t0 = time.perf_counter()
    reps = 8
    for _ in range(reps):
        fused.search_texts(store, probe, K)
    cap_qps = QB * reps / (time.perf_counter() - t0)

    def _drive(n_threads: int, per: int, fn) -> tuple[float, dict]:
        errs: list[BaseException] = []

        def _client(t: int) -> None:
            try:
                for i in range(per):
                    fn(t, i)
            except BaseException as exc:  # noqa: BLE001 — surfaced below
                errs.append(exc)

        threads = [threading.Thread(target=_client, args=(t,))
                   for t in range(n_threads)]
        s0 = METRICS.snapshot()
        t0 = time.perf_counter()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        wall = time.perf_counter() - t0
        if errs:
            raise errs[0]
        s1 = METRICS.snapshot()

        def delta(key):
            return (s1["counters"].get(key, 0) - s0["counters"].get(key, 0))

        batches = delta("batcher.search.batches")
        items = delta("batcher.search.items")
        return wall, {
            "batches": batches,
            "mean_batch_fill": round(items / max(batches, 1), 1),
            # Per-batch means from COUNTER DELTAS: the timer ring mixes
            # history from earlier stages (the r5 full run read a 95ms
            # dispatch mean that was entirely the e2e stage's compiles).
            "dispatch_mean_ms": round(
                delta("batcher.search.dispatch_us") / 1e3 / max(batches, 1), 2),
            "complete_mean_ms": round(
                delta("batcher.search.complete_us") / 1e3 / max(batches, 1), 2),
        }

    # Loaded throughput: 256 concurrent synchronous clients (2x the max
    # batch so the pipeline always has a full batch ready). One short
    # settle round first so thread startup is outside the timing.
    _drive(64, 2, lambda t, i: rt.search_batcher.search(
        "big", f"settle {t} {i}", K))
    n_threads, per = 256, 12
    wall, tele = _drive(n_threads, per, lambda t, i: rt.search_batcher.search(
        "big", f"client {t} wants {i}", K))
    qps = n_threads * per / wall

    # HTTP row: the real aiohttp server (JSON parse/serialize + SQL
    # hydration + executor hop) over localhost, same store and batcher.
    http = _serve_1m_http(rt, settings, K)

    out = {
        "rows": int(store.index.count),
        "load_1M_s": round(load_s, 1),
        "warmup_s": round(warm_s, 1),
        "warmed_executables": n_exec,
        "concurrent_clients": n_threads,
        "qps": round(qps, 1),
        "p50_ms": float(round(lat[31] * 1e3, 1)),
        "p99_ms": float(round(lat[62] * 1e3, 1)),
        "device_capability_qps": round(cap_qps, 1),
        "qps_vs_capability": round(qps / cap_qps, 3),
        **tele,
        **http,
    }
    # Free the 1M-row store's HBM before the next stage (the registry
    # would otherwise keep the index alive for the process lifetime).
    from memex_tpu.store.registry import _REGISTRY

    _REGISTRY.drop(settings.vector_uri, "big")
    rt.search_batcher.close()
    return out


def _serve_1m_http(rt, settings, k: int) -> dict:
    """Drive GET /api/collections/big/search through the real aiohttp
    server with synchronous HTTP clients; reports the API tax on top of
    the direct-batcher row. Hydration runs against an empty embeddings
    table (rows were bulk-loaded into the index), so the SQL cost here is
    one batched IN-query per request returning nothing — the serialization
    and executor-hop costs are real."""
    import asyncio
    import http.client
    import json
    import threading
    import time as _time

    from memex_tpu.api.server import start_async

    box: dict = {}
    ready = threading.Event()

    def _srv():
        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)
        ev = asyncio.Event()
        box["loop"], box["ev"] = loop, ev
        ready.set()
        loop.run_until_complete(start_async(rt, ev))
        loop.close()

    th = threading.Thread(target=_srv, daemon=True)
    th.start()
    ready.wait(10)
    path = "/api/collections/big/search"

    def _one(conn: http.client.HTTPConnection, t: int, i: int) -> None:
        conn.request(
            "POST", path,
            body=json.dumps(
                {"query": f"http client {t} wants {i}", "limit": k}).encode(),
            headers={"Content-Type": "application/json"})
        conn.getresponse().read()

    # wait for the listener, then settle
    for _ in range(100):
        try:
            c0 = http.client.HTTPConnection(
                settings.host, settings.port, timeout=120)
            _one(c0, 0, 0)
            c0.close()
            break
        except Exception:
            _time.sleep(0.1)

    n_threads, per = 64, 8
    errs: list[BaseException] = []

    def _client(t: int) -> None:
        # One keep-alive connection per client (the reference's clippy
        # client reuses a reqwest client the same way) — per-request TCP
        # setup on the 1-core host would otherwise dominate.
        try:
            conn = http.client.HTTPConnection(
                settings.host, settings.port, timeout=120)
            for i in range(per):
                _one(conn, t, i)
            conn.close()
        except BaseException as exc:  # noqa: BLE001
            errs.append(exc)

    threads = [threading.Thread(target=_client, args=(t,))
               for t in range(n_threads)]
    t0 = _time.perf_counter()
    for thr in threads:
        thr.start()
    for thr in threads:
        thr.join()
    wall = _time.perf_counter() - t0
    box["loop"].call_soon_threadsafe(box["ev"].set)
    th.join(timeout=10)
    if errs:
        raise errs[0]
    return {"http_clients": n_threads,
            "http_qps": round(n_threads * per / wall, 1)}


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
        # An OOMed stage can pin multi-GB device buffers via JAX's global
        # executable/constant caches even after its frame dies (measured:
        # the 10M stage's captured-constant OOM left every later stage
        # RESOURCE_EXHAUSTED). Dropping the caches costs a few seconds of
        # persistent-cache reloads for later stages — nothing next to an
        # all-stages-dead round.
        try:
            import jax

            jax.clear_caches()
        except Exception:
            pass
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
    t_start = time.monotonic()
    os.environ.setdefault(
        "MEMEX_BENCH_DOC_PATH",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_FULL.json"))
    budget_s = float(os.environ.get("MEMEX_BENCH_BUDGET_S", "3000"))
    deadline = t_start + budget_s
    rep = Reporter()
    rep.doc["budget_s"] = budget_s
    # Emit a full (all-zero) line BEFORE importing jax: backend init goes
    # through the remote tunnel and can hang outright (observed >6h when
    # the tunnel is down) — even that failure mode must leave the driver a
    # parseable artifact.
    rep.emit()

    _enable_compile_cache()
    import jax

    rep.doc["backend"] = jax.default_backend()
    rpc = _measure_rpc()
    print(f"[bench] rpc estimate: {rpc * 1e3:.1f} ms", file=sys.stderr)
    _hbm_report("at start")
    rep.emit()

    def _tick(results):
        rep.set_headline(results)
        rep.doc["elapsed_s"] = round(time.monotonic() - t_start, 1)
        rep.emit()

    try:
        results = bench_kernels(rpc, on_tier=_tick)
        rep.set_headline(results)
    except Exception as exc:
        import traceback

        traceback.print_exc()
        rep.doc["kernels_error"] = str(exc)[:200]
    _hbm_report("after kernels")
    rep.emit()

    extras = rep.doc["e2e"]

    # (key, conservative wall-clock estimate [warm compile cache], fn).
    # Ordered headline-first (round-2 verdict item 1): a budget cut drops
    # the tail, never the 10M/sharded evidence.
    def _e2e_merge():
        extras.update({k: (round(v, 2) if isinstance(v, float) else v)
                       for k, v in bench_e2e().items()})

    stages = [
        ("scale_10M", 600, lambda: bench_scale_10m(rpc)),
        ("sharded_ivf_1M", 420, lambda: bench_sharded_ivf(rpc)),
        ("recall_vs_hnsw", 300, lambda: bench_recall_vs_hnsw(rpc)),
        ("llm_decode", 420, bench_llm),
        ("ivf_prune_realtext", 360, bench_realtext_ivf),
        ("sotu_e2e", 240, bench_sotu),
        ("e2e", 300, _e2e_merge),
        ("serve_1M", 420, bench_serve_1m),
        ("bulk_load_1M_s", 150, lambda: round(bench_bulk_load(), 2)),
    ]
    for key, est, fn in stages:
        if key == "scale_10M" and os.environ.get("MEMEX_BENCH_SKIP_10M"):
            continue
        if os.environ.get(f"MEMEX_BENCH_SKIP_{key.upper()}"):
            rep.doc["skipped_stages"].append({"stage": key, "why": "env"})
            continue
        remaining = deadline - time.monotonic()
        if remaining < est:
            rep.doc["skipped_stages"].append(
                {"stage": key, "why": f"budget ({remaining:.0f}s left, "
                                      f"needs ~{est}s)"})
            rep.emit()
            continue
        _stage_guard(extras, key, fn)
        rep.doc["elapsed_s"] = round(time.monotonic() - t_start, 1)
        rep.emit()

    rep.doc["elapsed_s"] = round(time.monotonic() - t_start, 1)
    rep.emit()


if __name__ == "__main__":
    main()
