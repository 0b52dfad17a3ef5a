"""int4 IVF scan tier (ops/ivf_batch4.py) — interpret-mode hermetic tests.

Covers: the pack arithmetic (round-half-up int8/16 with clipping), the
packed-transposed layout roundtrip, the int4 batch-union kernel vs a numpy
int4 oracle, the int8 rerank's exactness, and end-to-end recall of
ivf_batch_search4 vs the int8 batch kernel. Compiled-path perf is measured
by bench.py on real TPU. Reference parity target: hnsw_rs ef_search
(lib/libmemex/src/storage/local.rs:71-91) — the int4 tier has no reference
counterpart (hnsw_rs stores f32)."""

import jax.numpy as jnp
import numpy as np
import pytest


def unit(rng, n, d):
    v = rng.standard_normal((n, d), dtype=np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


@pytest.fixture
def rng():
    return np.random.default_rng(17)


def _np_int4(codes_i8):
    return np.clip((codes_i8.astype(np.int64) + 8) >> 4, -7, 7)


def _np_unpack(b):
    """Decode the linear byte b = 16*hi + lo (both nibbles in [-7, 7])."""
    t = b.astype(np.int64) + 8
    return t >> 4, (t & 15) - 8


def _ivf_index(rng, n=4096, d=64, C=16):
    from memex_tpu.index.ivf import IVFIndex

    centers = unit(rng, 8, d)
    db = centers[rng.integers(0, 8, n)] + 0.07 * rng.standard_normal(
        (n, d)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    idx = IVFIndex(dim=d, n_clusters=C, nprobe=6, dtype="int8",
                   use_fused=False)
    idx.build(db, [f"v{i}" for i in range(n)])
    assert idx.data.shape[1] % 512 == 0
    return idx, db


class TestPack:
    def test_pack_roundtrip(self, rng):
        """Row-pair chunk-fold layout: byte (c, j*S2+off, d) packs rows
        j*S+off (hi) and j*S+S2+off (lo) of the bucket."""
        from memex_tpu.ops.ivf_batch4 import pack_int4_buckets

        C, M, D, S = 3, 1024, 8, 512
        S2 = S // 2
        codes = rng.integers(-127, 128, (C, M, D)).astype(np.int8)
        rsc = rng.random((C, M), dtype=np.float32)
        data4, rsc4 = pack_int4_buckets(jnp.asarray(codes), jnp.asarray(rsc),
                                        c_blk=2)  # force the multi-block path
        data4, rsc4 = np.asarray(data4), np.asarray(rsc4)
        assert data4.shape == (C, M // 2, D) and data4.dtype == np.int8
        np.testing.assert_allclose(rsc4, rsc * 16.0, rtol=1e-6)
        hi, lo = _np_unpack(data4)
        want = _np_int4(codes)
        for j in range(M // S):
            np.testing.assert_array_equal(
                hi[:, j * S2 : (j + 1) * S2], want[:, j * S : j * S + S2])
            np.testing.assert_array_equal(
                lo[:, j * S2 : (j + 1) * S2], want[:, j * S + S2 : (j + 1) * S])

    def test_pack_edge_values(self):
        from memex_tpu.ops.ivf_batch4 import pack_int4_buckets

        vals = np.array([-127, -8, -1, 0, 1, 8, 16, 127], np.int8)
        codes = np.zeros((1, 512, 1), np.int8)
        codes[0, :8, 0] = vals        # land in hi nibbles
        codes[0, 256:264, 0] = vals   # land in lo nibbles
        data4, _ = pack_int4_buckets(
            jnp.asarray(codes), jnp.ones((1, 512), jnp.float32))
        hi, lo = _np_unpack(np.asarray(data4))
        want = _np_int4(vals)
        np.testing.assert_array_equal(hi[0, :8, 0], want)
        np.testing.assert_array_equal(lo[0, :8, 0], want)


class TestInt4Kernel:
    def test_matches_numpy_oracle(self, rng):
        """Kernel candidates carry exact int4-dequant scores, and its top-k
        matches a numpy oracle scoring the same probed union."""
        from memex_tpu.ops.ivf_batch import route_union
        from memex_tpu.ops.ivf_batch4 import ivf_batch_topk4, pack_int4_buckets

        idx, _ = _ivf_index(rng)
        data4, rsc4 = pack_int4_buckets(idx.data, idx.rscales)
        k, nprobe, Q = 10, 6, 4
        qs = jnp.asarray(unit(rng, Q, 64))
        clist, nact = route_union(idx.centroids, qs, nprobe)
        v, c, s = ivf_batch_topk4(data4, rsc4, idx.sizes, clist, nact, qs, k,
                                  interpret=True)
        v, c, s = np.asarray(v), np.asarray(c), np.asarray(s)

        # numpy oracle over the probed union, bf16 dots like the kernel
        codes = np.asarray(idx.data)
        q4 = _np_int4(codes).astype(np.float32)
        rsc = np.asarray(idx.rscales) * 16.0
        sizes = np.asarray(idx.sizes)
        M = codes.shape[1]
        act = np.asarray(clist)[: int(np.asarray(nact)[0])]
        qsn = np.asarray(qs)
        for qi in range(Q):
            want = {}
            for cid in act:
                sc = (q4[cid, : sizes[cid]] @ qsn[qi]) * rsc[cid, : sizes[cid]]
                for m in range(sizes[cid]):
                    want[cid * M + m] = sc[m]
            top = sorted(want.items(), key=lambda kv: -kv[1])[:k]
            got = c[qi] * M + s[qi]
            # per-lane slot banks may drop near-ties; top-1 is never lost
            # EXCEPT to a genuine tie (oracle gap inside bf16 rounding:
            # the kernel's bf16 dots may legally flip a <2e-3 gap).
            assert (got[0] == top[0][0]
                    or want.get(int(got[0]), -1.0) >= top[0][1] - 2e-3), (
                got[0], top[0])
            overlap = len(set(got.tolist()) & {r for r, _ in top})
            assert overlap / k >= 0.8
            for j, r in enumerate(got.tolist()):
                if r in want:
                    assert abs(v[qi, j] - want[r]) < 2e-2 * max(
                        1.0, abs(want[r]))

    def test_rerank_scores_are_int8_exact(self, rng):
        from memex_tpu.ops.ivf_batch4 import rerank_int8

        idx, _ = _ivf_index(rng)
        M = idx.data.shape[1]
        Q, r, k = 3, 8, 4
        sizes = np.asarray(idx.sizes)
        cl = np.stack([rng.integers(0, idx.C, r) for _ in range(Q)])
        sl = np.stack([[rng.integers(0, sizes[c]) for c in row] for row in cl])
        qs = unit(rng, Q, 64)
        v4 = np.zeros((Q, r), np.float32)  # placeholder coarse scores
        v, c2, s2 = rerank_int8(idx.data, idx.rscales, jnp.asarray(qs),
                                jnp.asarray(v4), jnp.asarray(cl),
                                jnp.asarray(sl), k)
        v, c2, s2 = np.asarray(v), np.asarray(c2), np.asarray(s2)
        codes = np.asarray(idx.data)
        rsc = np.asarray(idx.rscales)
        for qi in range(Q):
            exact = {
                cl[qi, j] * M + sl[qi, j]:
                    float(codes[cl[qi, j], sl[qi, j]] @ qs[qi]
                          * rsc[cl[qi, j], sl[qi, j]])
                for j in range(r)
            }
            order = sorted(exact.items(), key=lambda kv: -kv[1])[:k]
            got = (c2[qi] * M + s2[qi]).tolist()
            assert got == [rid for rid, _ in order]
            for j, rid in enumerate(got):
                assert abs(v[qi, j] - exact[rid]) < 2e-2 * max(
                    1.0, abs(exact[rid]))

    def test_rerank_keeps_masked_candidates_masked(self, rng):
        from memex_tpu.ops.ivf_batch4 import NEG_INF, rerank_int8

        idx, _ = _ivf_index(rng)
        qs = jnp.asarray(unit(rng, 1, 64))
        cl = jnp.zeros((1, 4), jnp.int32)
        sl = jnp.arange(4, dtype=jnp.int32).reshape(1, 4)
        v4 = jnp.asarray([[1.0, NEG_INF, 1.0, NEG_INF]], jnp.float32)
        v, _, _ = rerank_int8(idx.data, idx.rscales, qs, v4, cl, sl, 4)
        v = np.asarray(v)[0]
        assert (v[2:] <= NEG_INF / 2).all() and (v[:2] > NEG_INF / 2).all()

    def test_search4_recall_vs_int8(self, rng):
        """End-to-end: the int4 scan + int8 rerank recovers the int8
        kernel's top-k almost everywhere."""
        from memex_tpu.ops.ivf_batch import ivf_batch_search
        from memex_tpu.ops.ivf_batch4 import ivf_batch_search4, pack_int4_buckets

        idx, _ = _ivf_index(rng)
        data4, rsc4 = pack_int4_buckets(idx.data, idx.rscales)
        k, nprobe, Q = 10, 6, 8
        qs = jnp.asarray(unit(rng, Q, 64))
        v8, c8, s8 = ivf_batch_search(idx.centroids, idx.data, idx.rscales,
                                      idx.sizes, qs, nprobe, k,
                                      interpret=True)
        v4, c4, s4 = ivf_batch_search4(idx.centroids, data4, rsc4, idx.data,
                                       idx.rscales, idx.sizes, qs, nprobe, k,
                                       interpret=True)
        M = idx.data.shape[1]
        g8 = np.asarray(c8) * M + np.asarray(s8)
        g4 = np.asarray(c4) * M + np.asarray(s4)
        hits = sum(
            len(set(g8[q].tolist()) & set(g4[q].tolist())) for q in range(Q))
        assert hits / (Q * k) >= 0.9
        # reranked scores are int8 scores: overlap rows agree tightly
        v8n, v4n = np.asarray(v8), np.asarray(v4)
        for q in range(Q):
            m8 = dict(zip(g8[q].tolist(), v8n[q]))
            for j, rid in enumerate(g4[q].tolist()):
                if rid in m8:
                    assert abs(v4n[q, j] - m8[rid]) < 2e-3


class TestIndexIntegration:
    """IVFIndex(scan_int4=True): same ids out as the int8 batch path, and
    the lazy mirror is invalidated by table mutations (fold_spill)."""

    def _pair(self, rng, n=4096):
        from memex_tpu.index.ivf import IVFIndex

        centers = unit(rng, 8, 64)
        db = centers[rng.integers(0, 8, n)] + 0.07 * rng.standard_normal(
            (n, 64)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        ids = [f"v{i}" for i in range(n)]
        kw = dict(dim=64, n_clusters=16, nprobe=6, dtype="int8",
                  use_fused=True)
        i8 = IVFIndex(**kw)
        i4 = IVFIndex(scan_int4=True, **kw)
        i8._interpret = i4._interpret = True
        i8.build(db, ids)
        i4.build(db, ids)
        return i8, i4, db

    def test_search_matches_int8_index(self, rng):
        i8, i4, db = self._pair(rng)
        qs = unit(rng, 6, 64)
        r8 = i8.search(qs, 10)
        r4 = i4.search(qs, 10)
        assert i4._data4 is not None  # the mirror was built lazily
        hits = sum(
            len({s for s, _ in a} & {s for s, _ in b})
            for a, b in zip(r8, r4))
        assert hits / (6 * 10) >= 0.9

    def test_int4_composes_with_prune_margin(self, rng):
        """int4 scan + margin pruning compose (bench_scale_10m's composed
        operating point): at a generous margin the pruned int4 search keeps
        high overlap with the unpruned one, and a keep-all margin is
        exactly identical (same executable, dynamic scalar)."""
        i8, i4, db = self._pair(rng)
        qs = unit(rng, 6, 64)
        base = i4.search(qs, 10)

        i4.prune_margin = 4.0  # keep-all sentinel: no probe may be dropped
        same = i4.search(qs, 10)
        assert [[s for s, _ in r] for r in same] == \
            [[s for s, _ in r] for r in base]

        i4.prune_margin = 0.25
        pruned = i4.search(qs, 10)
        hits = sum(
            len({s for s, _ in a} & {s for s, _ in b})
            for a, b in zip(base, pruned))
        assert hits / (6 * 10) >= 0.9

    def test_mirror_invalidated_by_fold(self, rng):
        i8, i4, db = self._pair(rng)
        q = unit(rng, 1, 64)
        i4.search(q, 5)
        assert i4._data4 is not None
        # Streamed rows equal to the query land in the spill, then fold into
        # the table; the re-packed mirror must surface them.
        extra_ids = [f"x{i}" for i in range(8)]
        i4.add(np.repeat(q, 8, axis=0), extra_ids)
        assert i4.fold_spill() >= 8  # build overflow rows may fold too
        assert i4._data4 is None  # invalidated
        assert i4.spill.count == 0
        got = {s for s, _ in i4.search(q, 8)[0]}
        assert got & set(extra_ids)
