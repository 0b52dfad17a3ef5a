"""IVFIndex — k-means partitioned index (the 10M-100M scale tier).

Expert-style routing (SURVEY.md §2.3 item 2): queries score the centroid
table, pick `nprobe` clusters, and scan only those clusters' rows. At
nprobe/C = 1/16 this cuts scanned bytes ~16x vs flat, trading exactness for
recall — the knob the reference delegates to HNSW's ef_search
(lib/libmemex/src/storage/local.rs:76) and we expose directly.

TPU-first layout (all static shapes):
  data    [C, M, D]  — clusters padded to fixed bucket size M
  sizes   [C]        — live rows per cluster
  rowids  [C, M]     — global row -> host id table index
  centroids [C, D]

Search is fully batched on the MXU: gather the probed clusters
[Q, nprobe, M, D] is memory-prohibitive, so instead we scan over nprobe
steps; each step gathers ONE cluster per query ([Q, M, D] via take) and
scores it as a batched matvec, merging into a running top-k. Probe steps
are bandwidth-bound by design (each row is read once per probing query).

Overflow: vectors arriving after build() (streaming ingest) go to a side
FlatIndex scanned exactly; `rebuild()` folds them in. Cluster-bucket
overflow at build time also spills there, so results are exact w.r.t. the
probed clusters + spill — recall loss comes only from unprobed clusters.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..log import get_logger
from .flat import FlatIndex

logger = get_logger(__name__)


# ---------------------------------------------------------------------------
# k-means (on-device Lloyd iterations, jitted once per (C, D))
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_clusters", "iters"))
def kmeans_fit(vectors: jnp.ndarray, n_clusters: int, iters: int = 10, seed: int = 0):
    """Spherical k-means on unit vectors: assign by max inner product,
    update = renormalized mean. Returns [C, D] unit centroids."""
    n, d = vectors.shape
    key = jax.random.PRNGKey(seed)
    init_idx = jax.random.choice(key, n, (n_clusters,), replace=n < n_clusters)
    centroids = vectors[init_idx]

    def step(centroids, _):
        scores = jnp.einsum(
            "nd,cd->nc",
            vectors.astype(jnp.bfloat16),
            centroids.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        assign = jnp.argmax(scores, axis=1)
        onehot = jax.nn.one_hot(assign, n_clusters, dtype=jnp.bfloat16)  # [N, C]
        sums = jnp.einsum(
            "nc,nd->cd", onehot, vectors.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        counts = jnp.sum(onehot.astype(jnp.float32), axis=0)[:, None]
        means = sums / jnp.maximum(counts, 1.0)
        # Empty clusters keep their old centroid.
        means = jnp.where(counts > 0, means, centroids)
        norms = jnp.linalg.norm(means, axis=1, keepdims=True)
        return means / jnp.maximum(norms, 1e-12), None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    return centroids


@jax.jit
def kmeans_assign(vectors: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    scores = jnp.einsum(
        "nd,cd->nc",
        vectors.astype(jnp.bfloat16),
        centroids.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return jnp.argmax(scores, axis=1)


# ---------------------------------------------------------------------------
# search
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("nprobe", "k"))
def _ivf_search(centroids, data, rscales, sizes, queries, nprobe: int, k: int):
    """(centroids [C,D], data [C,M,D] (f32/bf16/int8), rscales [C,M],
    sizes [C], queries [Q,D]) -> (vals [Q,k], cluster [Q,k], slot [Q,k]).

    The probe scan is gather-bound (each query reads its own clusters), so
    storage dtype cuts scanned bytes 2x/4x exactly like the flat tiers."""
    Q, D = queries.shape
    C, M, _ = data.shape
    # f32 routing: the [Q, C] centroid matmul is tiny; bf16 would misroute
    # probes on near-tied centroid scores.
    qc = jnp.einsum("qd,cd->qc", queries, centroids, preferred_element_type=jnp.float32)
    _, probes = jax.lax.top_k(qc, nprobe)  # [Q, nprobe]

    exact = data.dtype == jnp.float32

    def step(_, p):
        cids = probes[:, p]                    # [Q]
        cluster = jnp.take(data, cids, axis=0)  # [Q, M, D]
        csize = jnp.take(sizes, cids)           # [Q]
        if exact:
            # f32 in-cluster scoring: bandwidth-bound matvecs, bf16 buys no
            # time at f32 storage but costs exactness on near-tied rows.
            scores = jnp.einsum(
                "qmd,qd->qm", cluster, queries, preferred_element_type=jnp.float32
            )
        else:
            scores = jnp.einsum(
                "qmd,qd->qm",
                cluster.astype(jnp.bfloat16),
                queries.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) * jnp.take(rscales, cids, axis=0)
        slot = jax.lax.broadcasted_iota(jnp.int32, (Q, M), 1)
        return None, jnp.where(slot < csize[:, None], scores, -1e30)

    # Accumulate ALL probe scores ([nprobe, Q, M] — a few MB), then ONE
    # top-k; a running per-step top_k merge costs nprobe device-side sorts
    # and dominated the scan (measured 4ms/step at M=2000).
    _, all_scores = jax.lax.scan(step, None, jnp.arange(nprobe))
    flat = jnp.transpose(all_scores, (1, 0, 2)).reshape(Q, nprobe * M)
    from ..ops.topk import blockwise_topk

    vals, flat_idx = blockwise_topk(flat, k)
    p_sel = flat_idx // M
    sl = flat_idx % M
    cl = jnp.take_along_axis(probes, p_sel, axis=1)
    return vals, cl, sl


@partial(jax.jit, static_argnames=("nprobe", "k", "banks", "interpret"))
def _ivf_search_fused(centroids, data, rscales, sizes, queries,
                      nprobe: int, k: int, banks: int = 2,
                      interpret: bool = False):
    """Routing + the Pallas probe-scan kernel (ops/ivf_scan.py): cluster
    DMAs are driven by the scalar-prefetched probe table, so the gather
    pipelines like a dense scan instead of serializing on jnp.take."""
    from ..ops.ivf_scan import ivf_probe_topk

    qc = jnp.einsum("qd,cd->qc", queries, centroids,
                    preferred_element_type=jnp.float32)
    _, probes = jax.lax.top_k(qc, nprobe)
    return ivf_probe_topk(data, rscales, sizes, probes, queries, k,
                          banks=banks, interpret=interpret)


class IVFIndex:
    """k-means inverted-file index with exact in-cluster scoring.

    build(vectors, ids) trains centroids and packs clusters; add() streams
    into a flat spill index; rebuild() folds spill back in.
    """

    def __init__(
        self,
        dim: int,
        n_clusters: int = 256,
        nprobe: int = 32,
        bucket_factor: float = 2.0,
        seed: int = 0,
        dtype: str = "float32",
        use_fused: bool | None = None,
    ):
        assert dtype in ("float32", "bfloat16", "int8"), dtype
        if use_fused is None:
            use_fused = jax.default_backend() == "tpu"
        self.use_fused = use_fused
        self.dim = dim
        self.C = n_clusters
        self.nprobe = min(nprobe, n_clusters)
        self.bucket_factor = bucket_factor
        self.seed = seed
        self.dtype = dtype
        self.centroids: jnp.ndarray | None = None
        self.data: jnp.ndarray | None = None          # [C, M, D] storage dtype
        self.rscales: jnp.ndarray | None = None       # [C, M] f32 (int8 mode)
        self.sizes: jnp.ndarray | None = None
        self.rowids: np.ndarray | None = None  # [C, M] -> index into self.ids
        self._rowids_dev = None  # device rowid table (device-built indexes)
        self.ids: list[str] = []
        self.spill = FlatIndex(dim, dtype=dtype)
        self._deleted: set[str] = set()
        self._live: set[str] = set()

    @property
    def count(self) -> int:
        return len(self._live)

    # -- build ---------------------------------------------------------------

    def build(self, vectors: np.ndarray, ids: list[str]) -> None:
        vectors = np.asarray(vectors, np.float32)
        n = vectors.shape[0]
        assert n == len(ids)
        self._live.update(ids)
        if n < self.C * 4:
            logger.info("ivf build: n=%d too small for C=%d, using spill only", n, self.C)
            self.spill.add(vectors, ids)
            return
        # Train centroids on a subsample (standard practice: ~scales with C,
        # not N — a full [N, C] Lloyd assignment at 10M x 3k would be 120GB),
        # then assign all rows in HBM-bounded blocks.
        TRAIN_CAP = max(self.C * 64, 65536)
        if n > TRAIN_CAP:
            rng = np.random.default_rng(self.seed)
            sample = vectors[rng.choice(n, TRAIN_CAP, replace=False)]
        else:
            sample = vectors
        self.centroids = kmeans_fit(jnp.asarray(sample), self.C, seed=self.seed)
        assign = np.empty((n,), np.int64)
        BLOCK = 262_144
        for s in range(0, n, BLOCK):
            assign[s : s + BLOCK] = np.asarray(
                kmeans_assign(jnp.asarray(vectors[s : s + BLOCK]), self.centroids)
            )
        counts = np.bincount(assign, minlength=self.C)
        M = int(max(8, self.bucket_factor * max(1, counts.mean())))
        M = -(-M // 256) * 256  # multiple of the fused kernel's slot banks
        # Vectorized packing (no per-row Python loop): stable-sort rows by
        # cluster; position-within-cluster beyond M overflows to spill.
        order = np.argsort(assign, kind="stable")
        sorted_c = assign[order]
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pos = np.arange(n, dtype=np.int64) - starts[sorted_c]
        in_bucket = pos < M
        data = np.zeros((self.C, M, self.dim), np.float32)
        rowids = np.full((self.C, M), -1, np.int64)
        rows_sel = order[in_bucket]
        data[sorted_c[in_bucket], pos[in_bucket]] = vectors[rows_sel]
        rowids[sorted_c[in_bucket], pos[in_bucket]] = rows_sel
        self.ids = list(ids)
        self._pack(data)
        self.sizes = jnp.asarray(np.minimum(counts, M).astype(np.int32))
        self.rowids = rowids
        self._rowids_dev = None
        n_spill = int(n - in_bucket.sum())
        if n_spill:
            spill_rows = order[~in_bucket]
            logger.info("ivf build: %d bucket-overflow rows -> spill", n_spill)
            self.spill.add(vectors[spill_rows], [ids[i] for i in spill_rows])

    def build_device(self, vecs_q, scales, ids: list) -> None:
        """All-device build from an int8 corpus already resident on device.

        The host-side `build()` needs the f32 corpus in host RAM and ships
        [C, M, D] through the tunnel (~30 MB/s: 10M x 384 int8 is minutes of
        transfer); this path keeps everything on-chip — k-means on a
        dequantized sample, blockwise assignment, argsort packing, and
        scatter into the padded cluster bucket — and only fetches the small
        rowid table. vecs_q: [N, D] int8 (device), scales: [N] f32 (device),
        ids: host list of row ids (any hashables).
        """
        assert self.dtype == "int8", "device build packs int8 storage"
        n, d = vecs_q.shape
        assert d == self.dim and n == len(ids)
        assert n >= self.C * 4, f"n={n} too small for C={self.C}"
        self._live.update(ids)

        TRAIN_CAP = max(self.C * 64, 65536)
        m_samp = min(n, TRAIN_CAP)
        key = jax.random.PRNGKey(self.seed)
        samp_idx = jax.random.choice(key, n, (m_samp,), replace=False)
        sample = vecs_q[samp_idx].astype(jnp.float32) * scales[samp_idx, None]
        self.centroids = kmeans_fit(sample, self.C, seed=self.seed)
        del sample

        BLOCK = 1 << 20
        parts = []
        for s in range(0, n, BLOCK):
            blk = vecs_q[s : s + BLOCK].astype(jnp.bfloat16) * scales[
                s : s + BLOCK, None
            ].astype(jnp.bfloat16)
            parts.append(kmeans_assign(blk, self.centroids))
        assign = jnp.concatenate(parts) if len(parts) > 1 else parts[0]

        counts = jnp.zeros((self.C,), jnp.int32).at[assign].add(1)
        counts_h = np.asarray(counts)
        M = int(max(8, self.bucket_factor * max(1, counts_h.mean())))
        M = -(-M // 256) * 256  # fused-kernel slot alignment
        C, dim = self.C, self.dim

        order = jnp.argsort(assign)
        sorted_assign = jnp.take(assign, order)
        starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
        )
        pos = jnp.arange(n, dtype=jnp.int32) - jnp.take(starts, sorted_assign)
        in_bucket = pos < M
        dest_sorted = jnp.where(in_bucket, sorted_assign * M + pos, C * M)
        # Per-original-row destination (scatter instead of gather: avoids
        # materializing a second full copy of the corpus).
        dest = jnp.zeros((n,), jnp.int32).at[order].set(dest_sorted)

        # Scatter inside ONE jit: eagerly, `.at[dest].set` would materialize
        # the zeros input AND the output (2x the [C*M, D] bucket = OOM at
        # 10M rows); jitted, the init and scatter share one buffer. Overflow
        # rows carry dest == C*M, which is out of bounds for the [C*M]
        # target — scatter mode="drop" discards them (they go to spill).
        @partial(jax.jit, static_argnames=("C", "M"))
        def _pack_scatter(vecs_q, scales, dest, C, M):
            dim_ = vecs_q.shape[1]
            data = (jnp.zeros((C * M, dim_), jnp.int8)
                    .at[dest].set(vecs_q, mode="drop").reshape(C, M, dim_))
            rsc = (jnp.zeros((C * M,), jnp.float32)
                   .at[dest].set(scales, mode="drop").reshape(C, M))
            rid = (jnp.full((C * M,), -1, jnp.int32)
                   .at[dest].set(jnp.arange(vecs_q.shape[0], dtype=jnp.int32),
                                 mode="drop").reshape(C, M))
            return data, rsc, rid

        self.data, self.rscales, rid_cm = _pack_scatter(vecs_q, scales, dest, C, M)
        self.sizes = jnp.minimum(counts, M).astype(jnp.int32)
        # The rowid table stays ON DEVICE: the tunnel's device->host fetch
        # path runs ~2 MB/s (measured: this 84MB int32 fetch alone was 44s
        # of a 68s 10M build), and search maps winners to original rows
        # with a tiny device gather instead. Host save/compact paths fetch
        # it lazily via _rowids_host().
        self.rowids = None
        self._rowids_dev = rid_cm
        self.ids = list(ids)

        # Spill rows: their sorted positions are derivable from counts on
        # the host (cluster c overflows positions starts[c]+M..counts[c]),
        # so no device nonzero / full-mask fetch is needed; fetch the int8
        # codes + scales (4x fewer bytes than f32) and dequantize on host.
        starts_h = np.concatenate([[0], np.cumsum(counts_h)[:-1]])
        over = np.nonzero(counts_h > M)[0]
        if len(over):
            sel = np.concatenate(
                [np.arange(starts_h[c] + M, starts_h[c] + counts_h[c]) for c in over]
            ).astype(np.int32)
            spill_rows = np.asarray(jnp.take(order, jnp.asarray(sel)))
            logger.info("ivf device build: %d bucket-overflow rows -> spill",
                        len(spill_rows))
            sel_dev = jnp.asarray(spill_rows)
            # Device-to-device: the codes never touch the host.
            self.spill.add_quantized(
                jnp.take(vecs_q, sel_dev, axis=0),
                jnp.take(scales, sel_dev),
                [ids[int(i)] for i in spill_rows],
            )

    def _rowids_host(self) -> np.ndarray | None:
        """Host rowid table; device-built indexes fetch + cache it on first
        use (save/compact paths only — search never needs it)."""
        if self.rowids is None and self._rowids_dev is not None:
            self.rowids = np.asarray(self._rowids_dev).astype(np.int64)
        return self.rowids

    def _pack(self, data: np.ndarray) -> None:
        """[C, M, D] f32 -> device arrays in the storage dtype."""
        C, M, D = data.shape
        if self.dtype == "int8":
            from ..native_lib import np_quantize_rows_int8

            q, s = np_quantize_rows_int8(data.reshape(C * M, D))
            self.data = jnp.asarray(q.reshape(C, M, D))
            self.rscales = jnp.asarray(s.reshape(C, M))
        else:
            self.data = jnp.asarray(
                data, jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
            )
            self.rscales = jnp.ones((C, M), jnp.float32)

    def _data_f32(self) -> np.ndarray:
        d = np.asarray(self.data, dtype=np.float32)
        if self.dtype == "int8":
            d = d * np.asarray(self.rscales)[:, :, None]
        return d

    def add(self, vectors: np.ndarray, ids: list[str]) -> None:
        """Streaming ingest: spill index, folded in at next rebuild()."""
        self.spill.add(vectors, ids)
        self._live.update(ids)

    def rebuild(self) -> None:
        vecs, ids = self._all_vectors()
        self.spill.delete_all()
        self._deleted.clear()
        self.build(vecs, ids)

    def _all_vectors(self) -> tuple[np.ndarray, list[str]]:
        out_v, out_i = [], []
        if self.data is not None:
            data = self._data_f32()
            rowids = self._rowids_host()
            sizes = np.asarray(self.sizes)
            for c in range(self.C):
                for m in range(sizes[c]):
                    sid = self.ids[rowids[c, m]]
                    if sid is not None and sid not in self._deleted:
                        out_v.append(data[c, m])
                        out_i.append(sid)
        if self.spill.count:
            alive = np.asarray(self.spill.alive)[: self.spill.count] > 0
            svecs = np.asarray(self.spill.buf)[: self.spill.count]
            for r in np.nonzero(alive)[0]:
                sid = self.spill.ids[r]
                if sid not in self._deleted:
                    out_v.append(svecs[r])
                    out_i.append(sid)
        if not out_v:
            return np.zeros((0, self.dim), np.float32), []
        return np.stack(out_v), out_i

    # -- search --------------------------------------------------------------

    def search(self, queries: np.ndarray, k: int) -> list[list[tuple[str, float]]]:
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        Q = queries.shape[0]
        results: list[list[tuple[str, float]]] = [[] for _ in range(Q)]
        merged: list[dict[str, float]] = [dict() for _ in range(Q)]
        if self.data is not None:
            kk = min(k + len(self._deleted), int(np.asarray(self.sizes).sum()))
            if kk > 0:
                S = 2 * 128  # fused kernel slot width (banks=2)
                vmem_need = 2 * self.data.shape[1] * self.dim * self.data.dtype.itemsize
                fused_ok = (self.use_fused and kk <= S
                            and self.data.shape[1] % S == 0
                            and vmem_need <= 12 * 2**20)  # double buffer fits VMEM
                if fused_ok:
                    try:
                        vals, cl, sl = _ivf_search_fused(
                            self.centroids, self.data, self.rscales, self.sizes,
                            jnp.asarray(queries), self.nprobe, kk,
                        )
                    except Exception:
                        logger.exception("fused IVF kernel failed; XLA fallback")
                        self.use_fused = False
                        fused_ok = False
                if not fused_ok:
                    vals, cl, sl = _ivf_search(
                        self.centroids, self.data, self.rscales, self.sizes,
                        jnp.asarray(queries), self.nprobe, kk,
                    )
                from ..ops.host import fetch

                if self._rowids_dev is not None:
                    # Map winners to original rows on device: the rowid
                    # table fetch is prohibitively slow through the tunnel
                    # (device->host ~2 MB/s), a [Q, k] gather is free.
                    Mb = self.data.shape[1]
                    orig = jnp.take(
                        self._rowids_dev.reshape(-1),
                        jnp.asarray(cl) * Mb + jnp.asarray(sl),
                    )
                    vals, cl, sl, orig = fetch(vals, cl, sl, orig)
                else:
                    vals, cl, sl = fetch(vals, cl, sl)
                    orig = None
                for qi in range(Q):
                    for j, (v, c, s) in enumerate(zip(vals[qi], cl[qi], sl[qi])):
                        if v <= -1e29:
                            continue
                        ridx = orig[qi, j] if orig is not None else self.rowids[c, s]
                        if ridx < 0:
                            continue
                        sid = self.ids[ridx]
                        if sid is None or sid in self._deleted:
                            continue
                        merged[qi][sid] = float(v)
        if self.spill.count:
            for qi, hits in enumerate(self.spill.search(queries, min(k, self.spill.count))):
                for sid, v in hits:
                    if sid not in self._deleted:
                        merged[qi][sid] = v
        for qi in range(Q):
            top = sorted(merged[qi].items(), key=lambda kv: -kv[1])[:k]
            results[qi] = [(sid, v) for sid, v in top]
        return results

    # -- persistence -----------------------------------------------------------

    def save(self, path: str) -> None:
        """Checkpoint to `{path}.npz` + `{path}.meta.json`: centroids plus
        packed live rows with their cluster assignment, so load() restores
        the trained partitions WITHOUT re-running k-means (rebuild() is the
        only path that retrains). Deleted rows are dropped (save compacts)."""
        import json as _json
        import os as _os

        _os.makedirs(_os.path.dirname(path) or ".", exist_ok=True)
        cvecs, cassign, cids = [], [], []
        if self.data is not None:
            data = self._data_f32()
            rowids = self._rowids_host()
            sizes = np.asarray(self.sizes)
            for c in range(self.C):
                for m in range(int(sizes[c])):
                    ridx = rowids[c, m]
                    if ridx < 0:
                        continue
                    sid = self.ids[ridx]
                    if sid is None or sid in self._deleted:
                        continue
                    cvecs.append(data[c, m])
                    cassign.append(c)
                    cids.append(sid)
        svecs, sids = [], []
        if self.spill.count:
            alive = np.asarray(self.spill.alive)[: self.spill.count] > 0
            dq = self.spill._dequantized()
            for r in np.nonzero(alive)[0]:
                sid = self.spill.ids[r]
                if sid not in self._deleted:
                    svecs.append(dq[r])
                    sids.append(sid)
        np.savez(
            path + ".npz",
            centroids=(np.asarray(self.centroids)
                       if self.centroids is not None
                       else np.zeros((0, self.dim), np.float32)),
            cluster_vecs=(np.stack(cvecs) if cvecs else np.zeros((0, self.dim), np.float32)),
            cluster_assign=np.asarray(cassign, np.int32),
            spill_vecs=(np.stack(svecs) if svecs else np.zeros((0, self.dim), np.float32)),
        )
        meta = {
            "dim": self.dim,
            "n_clusters": self.C,
            "nprobe": self.nprobe,
            "bucket_factor": self.bucket_factor,
            "dtype": self.dtype,
            "cluster_ids": cids,
            "spill_ids": sids,
        }
        with open(path + ".meta.json", "w", encoding="utf-8") as fh:
            _json.dump(meta, fh)

    @classmethod
    def load(cls, path: str, **kw) -> "IVFIndex":
        import json as _json

        with open(path + ".meta.json", "r", encoding="utf-8") as fh:
            meta = _json.load(fh)
        arrs = np.load(path + ".npz")
        kw.setdefault("n_clusters", meta["n_clusters"])
        kw.setdefault("nprobe", meta["nprobe"])
        kw.setdefault("bucket_factor", meta["bucket_factor"])
        kw.setdefault("dtype", meta.get("dtype", "float32"))
        idx = cls(dim=meta["dim"], **kw)
        cids: list[str] = meta["cluster_ids"]
        centroids = arrs["centroids"]
        if len(centroids) and len(cids):
            idx.centroids = jnp.asarray(centroids)
            assign = arrs["cluster_assign"]
            vectors = arrs["cluster_vecs"]
            counts = np.bincount(assign, minlength=idx.C)
            M = int(max(8, idx.bucket_factor * max(1, counts.mean())))
            M = max(M, int(counts.max()))
            M = -(-M // 256) * 256  # multiple of the fused kernel's slot banks
            data = np.zeros((idx.C, M, idx.dim), np.float32)
            rowids = np.full((idx.C, M), -1, np.int64)
            idx.ids = list(cids)
            # save() writes rows cluster-sorted, so positions are vectorizable
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            pos = np.arange(len(cids), dtype=np.int64) - starts[assign]
            data[assign, pos] = vectors
            rowids[assign, pos] = np.arange(len(cids))
            idx._pack(data)  # re-quantize into the storage dtype
            idx.sizes = jnp.asarray(counts.astype(np.int32))
            idx.rowids = rowids
            idx._live.update(cids)
        sids = meta["spill_ids"]
        if sids:
            idx.spill.add(arrs["spill_vecs"], sids)
            idx._live.update(sids)
        return idx

    @classmethod
    def exists(cls, path: str) -> bool:
        import os as _os

        return _os.path.exists(path + ".meta.json") and _os.path.exists(path + ".npz")

    def delete(self, ids: list[str]) -> int:
        known = set()
        if self.rowids is not None or self._rowids_dev is not None:
            known.update(i for i in self.ids if i is not None)
        known.update(self.spill.ids)
        removed = 0
        for sid in ids:
            if sid in known and sid not in self._deleted:
                self._deleted.add(sid)
                self._live.discard(sid)
                removed += 1
        self.spill.delete(list(ids))
        return removed

    def delete_all(self) -> None:
        self.centroids = None
        self.data = None
        self.sizes = None
        self.rowids = None
        self._rowids_dev = None
        self.ids = []
        self._deleted.clear()
        self._live.clear()
        self.spill.delete_all()
