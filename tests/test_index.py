"""Index tests against a numpy brute-force oracle (SURVEY.md §4: recall@k
fixtures vs exact oracle; multi-device sharding on the virtual CPU mesh)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from memex_tpu.index import FlatIndex, IVFIndex, ShardedFlatIndex


def unit(rng, n, d):
    v = rng.standard_normal((n, d), dtype=np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def oracle_topk(db, q, k):
    scores = q @ db.T
    return np.argsort(-scores, axis=1)[:, :k]


@pytest.fixture
def rng():
    return np.random.default_rng(42)


class TestFlatIndex:
    def test_add_search_exact(self, rng):
        d, n, q_n, k = 64, 500, 7, 5
        db, qs = unit(rng, n, d), unit(rng, q_n, d)
        ids = [f"id-{i}" for i in range(n)]
        idx = FlatIndex(dim=d)
        idx.add(db, ids)
        assert idx.count == n
        results = idx.search(qs, k)
        expect = oracle_topk(db, qs, k)
        for qi in range(q_n):
            got = [sid for sid, _ in results[qi]]
            want = [f"id-{i}" for i in expect[qi]]
            assert got == want

    def test_incremental_adds_match_bulk(self, rng):
        d, k = 32, 5
        db = unit(rng, 300, d)
        ids = [f"v{i}" for i in range(300)]
        q = unit(rng, 3, d)
        # center=False: byte-identical storage regardless of batch split.
        a = FlatIndex(dim=d, center=False)
        a.add(db, ids)
        b = FlatIndex(dim=d, center=False)
        for s in range(0, 300, 37):  # uneven batches exercise padding
            b.add(db[s : s + 37], ids[s : s + 37])
        assert a.search(q, k) == b.search(q, k)
        # Default (centered) storage pins the mean from the FIRST batch, so
        # bulk and incremental residual spaces differ — ranking must still
        # agree, and corrected scores match within bf16 scan rounding.
        ac = FlatIndex(dim=d)
        ac.add(db, ids)
        bc = FlatIndex(dim=d)
        for s in range(0, 300, 37):
            bc.add(db[s : s + 37], ids[s : s + 37])
        ra, rb = ac.search(q, k), bc.search(q, k)
        for ha, hb in zip(ra, rb):
            assert [s for s, _ in ha] == [s for s, _ in hb]
            np.testing.assert_allclose([v for _, v in ha],
                                       [v for _, v in hb], atol=2e-3)

    def test_growth(self, rng):
        d = 16
        idx = FlatIndex(dim=d, capacity=2048)
        db = unit(rng, 5000, d)
        idx.add(db, [f"g{i}" for i in range(5000)])
        assert idx.capacity >= 5001 and idx.count == 5000
        res = idx.search(db[123:124], 1)
        assert res[0][0][0] == "g123"
        assert res[0][0][1] > 0.999

    def test_delete_tombstones(self, rng):
        d = 32
        db = unit(rng, 100, d)
        idx = FlatIndex(dim=d)
        idx.add(db, [f"t{i}" for i in range(100)])
        top = idx.search(db[:1], 1)[0][0][0]
        assert top == "t0"
        assert idx.delete(["t0"]) == 1
        got = [sid for sid, _ in idx.search(db[:1], 5)[0]]
        assert "t0" not in got
        assert idx.delete(["t0"]) == 0  # already gone

    def test_compaction_preserves_results(self, rng):
        d = 32
        db = unit(rng, 200, d)
        idx = FlatIndex(dim=d)
        idx.add(db, [f"c{i}" for i in range(200)])
        idx.delete([f"c{i}" for i in range(0, 120)])  # force compaction
        assert idx.dead == 0  # compacted
        got = idx.search(db[150:151], 1)[0][0]
        assert got[0] == "c150" and got[1] > 0.999

    def test_save_load_roundtrip(self, rng, tmp_path):
        d = 32
        db = unit(rng, 64, d)
        idx = FlatIndex(dim=d)
        idx.add(db, [f"s{i}" for i in range(64)])
        idx.delete(["s3"])
        path = str(tmp_path / "col")
        idx.save(path)
        assert FlatIndex.exists(path)
        idx2 = FlatIndex.load(path)
        q = unit(rng, 2, d)
        assert idx2.search(q, 5) == idx.search(q, 5)

    def test_empty_search(self):
        idx = FlatIndex(dim=16)
        assert idx.search(np.zeros((2, 16), np.float32), 5) == [[], []]


class TestShardedFlatIndex:
    @pytest.fixture
    def mesh(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        return Mesh(np.array(jax.devices()[:8]), ("shard",))

    def test_matches_flat(self, rng, mesh):
        d, n, k = 64, 700, 10
        db, qs = unit(rng, n, d), unit(rng, 5, d)
        ids = [f"m{i}" for i in range(n)]
        flat = FlatIndex(dim=d)
        flat.add(db, ids)
        sharded = ShardedFlatIndex(dim=d, mesh=mesh, capacity_per_shard=2048)
        sharded.add(db, ids)
        assert sharded.count == n
        rf = flat.search(qs, k)
        rs = sharded.search(qs, k)
        for qi in range(5):
            assert [s for s, _ in rf[qi]] == [s for s, _ in rs[qi]]
            np.testing.assert_allclose(
                [v for _, v in rf[qi]], [v for _, v in rs[qi]], atol=1e-2
            )

    def test_delete(self, rng, mesh):
        d = 32
        db = unit(rng, 100, d)
        idx = ShardedFlatIndex(dim=d, mesh=mesh)
        idx.add(db, [f"d{i}" for i in range(100)])
        assert idx.delete(["d0"]) == 1
        got = [s for s, _ in idx.search(db[:1], 5)[0]]
        assert "d0" not in got


class TestIVFIndex:
    def test_recall_vs_oracle(self, rng):
        # Clustered data (mixture of gaussians) — the realistic regime for
        # sentence embeddings; uniform random vectors are IVF's worst case.
        d, n, q_n, k = 48, 4096, 8, 10
        centers = unit(rng, 32, d)
        assign = rng.integers(0, 32, size=n)
        db = centers[assign] + 0.3 * rng.standard_normal((n, d)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        qi_rows = rng.integers(0, n, size=q_n)
        qs = db[qi_rows] + 0.1 * rng.standard_normal((q_n, d)).astype(np.float32)
        qs /= np.linalg.norm(qs, axis=1, keepdims=True)
        ids = [f"p{i}" for i in range(n)]
        idx = IVFIndex(dim=d, n_clusters=64, nprobe=24)
        idx.build(db, ids)
        assert idx.count == n
        expect = oracle_topk(db, qs, k)
        recalls = []
        for qq, hits in enumerate(idx.search(qs, k)):
            got = {s for s, _ in hits}
            want = {f"p{i}" for i in expect[qq]}
            recalls.append(len(got & want) / k)
        assert np.mean(recalls) >= 0.9, recalls

    def test_build_device_matches_host_build_recall(self, rng):
        """All-device int8 build reaches the same recall regime as the
        host-side build and keeps every row reachable (bucket + spill)."""
        import jax.numpy as jnp

        from memex_tpu.ops.fused_topk import quantize_rows_int8

        d, n, q_n, k = 48, 4096, 8, 10
        centers = unit(rng, 32, d)
        assign = rng.integers(0, 32, size=n)
        db = centers[assign] + 0.3 * rng.standard_normal((n, d)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        qs = unit(rng, q_n, d)
        ids = [f"p{i}" for i in range(n)]
        vq, sc = quantize_rows_int8(jnp.asarray(db))

        dev = IVFIndex(dim=d, n_clusters=64, nprobe=24, dtype="int8",
                       use_fused=False)
        dev.build_device(vq, sc, ids)
        assert dev.count == n
        assert int(np.asarray(dev.sizes).sum()) + dev.spill.count == n
        # Every id is reachable exactly once (bucket or spill).
        seen = set()
        sizes = np.asarray(dev.sizes)
        rowids = dev._rowids_host()  # device-resident table, lazy host fetch
        for c in range(dev.C):
            for m in range(int(sizes[c])):
                r = rowids[c, m]
                assert r >= 0
                seen.add(dev.ids[r])
        seen |= set(dev.spill.ids)
        assert seen == set(ids)

        host = IVFIndex(dim=d, n_clusters=64, nprobe=24, dtype="int8",
                        use_fused=False)
        host.build(db, ids)
        expect = oracle_topk(db, qs, k)
        for idx in (dev, host):
            recalls = []
            for qq, hits in enumerate(idx.search(qs, k)):
                got = {s for s, _ in hits}
                want = {f"p{i}" for i in expect[qq]}
                recalls.append(len(got & want) / k)
            assert np.mean(recalls) >= 0.85, (type(idx), recalls)

    def test_nprobe_full_is_exact(self, rng):
        d, n, k = 32, 1024, 5
        db, qs = unit(rng, n, d), unit(rng, 4, d)
        idx = IVFIndex(dim=d, n_clusters=16, nprobe=16)  # probe everything
        idx.build(db, [f"e{i}" for i in range(n)])
        expect = oracle_topk(db, qs, k)
        for qi, hits in enumerate(idx.search(qs, k)):
            assert [s for s, _ in hits] == [f"e{i}" for i in expect[qi]]

    def test_streaming_add_and_rebuild(self, rng):
        d = 32
        db = unit(rng, 1024, d)
        idx = IVFIndex(dim=d, n_clusters=16, nprobe=8)
        idx.build(db[:1000], [f"a{i}" for i in range(1000)])
        idx.add(db[1000:], [f"b{i}" for i in range(24)])
        hits = idx.search(db[1010:1011], 1)[0]
        assert hits[0][0] == "b10" and hits[0][1] > 0.999
        idx.rebuild()
        assert idx.count == 1024
        hits = idx.search(db[1010:1011], 1)[0]
        assert hits[0][0] == "b10"

    def test_delete(self, rng):
        d = 32
        db = unit(rng, 1024, d)
        idx = IVFIndex(dim=d, n_clusters=16, nprobe=16)
        idx.build(db, [f"x{i}" for i in range(1024)])
        assert idx.delete(["x5"]) == 1
        got = [s for s, _ in idx.search(db[5:6], 5)[0]]
        assert "x5" not in got
        assert idx.count == 1023


class TestFlatIndexDtypes:
    @pytest.mark.parametrize("dtype", ["bfloat16", "int8", "int4"])
    def test_recall_vs_f32(self, rng, dtype):
        d, n, q_n, k = 64, 2000, 8, 10
        db, qs = unit(rng, n, d), unit(rng, q_n, d)
        ids = [f"q{i}" for i in range(n)]
        exact = FlatIndex(dim=d, dtype="float32")
        exact.add(db, ids)
        quant = FlatIndex(dim=d, dtype=dtype)
        quant.add(db, ids)
        re_, rq = exact.search(qs, k), quant.search(qs, k)
        recalls = [
            len({s for s, _ in re_[i]} & {s for s, _ in rq[i]}) / k
            for i in range(q_n)
        ]
        assert np.mean(recalls) >= 0.9, (dtype, recalls)

    @pytest.mark.parametrize("dtype", ["bfloat16", "int8", "int4"])
    def test_roundtrip_and_compact(self, rng, dtype, tmp_path):
        d = 32
        db = unit(rng, 120, d)
        idx = FlatIndex(dim=d, dtype=dtype)
        idx.add(db, [f"r{i}" for i in range(120)])
        idx.delete([f"r{i}" for i in range(60)])  # force compaction path
        hit = idx.search(db[100:101], 1)[0][0]
        assert hit[0] == "r100" and hit[1] > 0.99
        path = str(tmp_path / f"col-{dtype}")
        idx.save(path)
        idx2 = FlatIndex.load(path)
        assert idx2.dtype == dtype
        assert idx2.search(db[100:101], 1)[0][0][0] == "r100"


def test_flat_index_int4_fused_interpret(rng):
    """int4 FlatIndex through the fused coarse+rerank path (interpret mode)
    matches the XLA fallback's results."""
    d, n, k = 64, 2048, 5
    db = unit(rng, n, d)
    qs = unit(rng, 4, d)
    ids = [f"v{i}" for i in range(n)]
    from memex_tpu.index import flat as flat_mod

    idx = FlatIndex(dim=d, dtype="int4", use_fused=False)
    idx.add(db, ids)
    xla = idx.search(qs, k)
    fused = flat_mod._search_masked_fused_int4(
        idx.buf, idx.scales, idx.buf8, idx.alive, idx.count,
        np.asarray(qs, np.float32), k, block_n=512, rerank=64, interpret=True,
    )
    fvals, fidx = np.asarray(fused[0]), np.asarray(fused[1])
    for qi in range(4):
        x_ids = [s for s, _ in xla[qi]]
        f_ids = [idx.ids[r] for r in fidx[qi] if fvals[qi][0] > -1e29]
        # top-1 agrees; overlap is high (rerank is int8-exact on candidates)
        assert x_ids[0] == f_ids[0]
        assert len(set(x_ids) & set(f_ids)) >= k - 1


class TestAdversarialDeletes:
    """Deletes concentrated in the true top-k can crowd any bounded fused
    over-fetch; the widened bank + exact-path shortfall fallback must keep
    k live, exactly-ranked results (round-1 VERDICT weak #4)."""

    @pytest.mark.parametrize("dtype", ["float32", "int8", "int4"])
    def test_flat_fused_recall_with_topk_deleted(self, rng, dtype):
        d, n, k = 64, 2048, 10
        db, q = unit(rng, n, d), unit(rng, 1, d)
        idx = FlatIndex(dim=d, dtype=dtype, use_fused=True)
        idx._interpret = True  # fused kernels run hermetically
        idx.add(db, [f"v{i}" for i in range(n)])
        # Tombstone the query's ENTIRE top-130 (beyond the 128-wide bank)
        # plus scattered extras: ~17% dead, below the 25% compaction bar.
        order = np.argsort(-(q @ db.T))[0]
        dead_rows = set(order[:130].tolist())
        dead_rows.update(rng.choice(n, 220, replace=False).tolist())
        dead_rows = list(dead_rows)[:500]
        idx.delete([f"v{r}" for r in dead_rows])
        assert idx.dead * 4 <= idx.count  # no compaction happened
        hits = idx.search(q, k)[0]
        assert len(hits) == k
        live = np.setdiff1d(np.arange(n), np.asarray(dead_rows))
        want = live[np.argsort(-(q @ db[live].T))[0][:k]]
        got = {int(s[1:]) for s, _ in hits}
        # in-kernel masking: every returned row is live, and overlap with
        # the live-row oracle matches the NO-DELETE fused recall (bf16 dot
        # + slot-bank approximation only — deletes add no loss)
        assert not got & set(dead_rows)
        assert len(got & set(want.tolist())) >= k - (1 if dtype == "float32" else 2)

    def test_sharded_fused_recall_with_topk_deleted(self, rng):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = Mesh(np.array(jax.devices()[:8]), ("shard",))
        d, n, k = 64, 2048, 10
        db, q = unit(rng, n, d), unit(rng, 1, d)
        idx = ShardedFlatIndex(dim=d, mesh=mesh, capacity_per_shard=512,
                               dtype="int8", use_fused=True)
        idx._interpret = True
        idx.add(db, [f"v{i}" for i in range(n)])
        order = np.argsort(-(q @ db.T))[0]
        dead_rows = order[:140].tolist()
        idx.delete([f"v{r}" for r in dead_rows])
        hits = idx.search(q, k)[0]
        assert len(hits) == k
        got = {int(s[1:]) for s, _ in hits}
        assert not got & set(dead_rows)
        live = np.setdiff1d(np.arange(n), np.asarray(dead_rows))
        want = set(live[np.argsort(-(q @ db[live].T))[0][:k]].tolist())
        assert len(got & want) >= k - 2  # int8 rounding at the margin


def test_flat_index_thread_safety(rng):
    """Concurrent adds + searches through the store layer (lock held) keep
    results consistent — the reference serializes via Arc<Mutex>
    (storage/mod.rs:68-93)."""
    import threading

    from memex_tpu.store.tpu_store import TpuFlatStore
    from memex_tpu.store.base import VectorData

    store = TpuFlatStore(None, "stress", dim=32)
    db = unit(rng, 400, 32)
    errs = []

    def add(lo, hi):
        try:
            store.add_vectors([
                VectorData(id=f"t{i}", document_id="d", text="", vector=db[i])
                for i in range(lo, hi)
            ])
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    def query():
        try:
            for _ in range(10):
                store.search(db[0], 3)
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    threads = [threading.Thread(target=add, args=(i * 100, (i + 1) * 100)) for i in range(4)]
    threads += [threading.Thread(target=query) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert store.count == 400
    hits = store.search(db[123], 1)
    assert hits[0].id == "t123"


class TestShardedDtypes:
    @pytest.fixture
    def mesh(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        return Mesh(np.array(jax.devices()[:8]), ("shard",))

    @pytest.mark.parametrize("dtype", ["bfloat16", "int8", "int4"])
    def test_recall_vs_f32(self, rng, mesh, dtype):
        d, n, k = 64, 600, 10
        db, qs = unit(rng, n, d), unit(rng, 6, d)
        ids = [f"sd{i}" for i in range(n)]
        exact = ShardedFlatIndex(dim=d, mesh=mesh)
        exact.add(db, ids)
        quant = ShardedFlatIndex(dim=d, mesh=mesh, dtype=dtype)
        quant.add(db, ids)
        re_, rq = exact.search(qs, k), quant.search(qs, k)
        recalls = [
            len({s for s, _ in re_[i]} & {s for s, _ in rq[i]}) / k for i in range(6)
        ]
        assert np.mean(recalls) >= 0.9, (dtype, recalls)
        top = quant.search(db[42:43], 1)[0][0]
        assert top[0] == "sd42" and top[1] > 0.98


class TestIVFPersistence:
    """VERDICT round-1 weak #5: TpuIVFStore.checkpoint was a no-op."""

    def test_save_load_roundtrip(self, rng, tmp_path):
        d, n, k = 32, 1024, 5
        db = unit(rng, n, d)
        ids = [f"r{i}" for i in range(n)]
        idx = IVFIndex(dim=d, n_clusters=16, nprobe=16)
        idx.build(db[:1000], ids[:1000])
        idx.add(db[1000:], ids[1000:])      # spill rows
        idx.delete(["r7", "r1005"])          # deletions compact on save
        path = str(tmp_path / "ivf")
        idx.save(path)

        assert IVFIndex.exists(path)
        idx2 = IVFIndex.load(path)
        assert idx2.count == idx.count == n - 2
        # Same trained centroids (no k-means rerun on load).
        np.testing.assert_array_equal(
            np.asarray(idx.centroids), np.asarray(idx2.centroids)
        )
        qs = unit(rng, 4, d)
        before, after = idx.search(qs, k), idx2.search(qs, k)
        for b, a in zip(before, after):
            assert [s for s, _ in b] == [s for s, _ in a]
            np.testing.assert_allclose(
                [v for _, v in b], [v for _, v in a], atol=1e-5
            )
        got = {s for s, _ in idx2.search(db[7:8], 3)[0]}
        assert "r7" not in got

    def test_store_checkpoint_restores(self, rng, tmp_path):
        from memex_tpu.store.base import VectorData
        from memex_tpu.store.tpu_store import TpuIVFStore

        d, n = 32, 600
        db = unit(rng, n, d)
        data = [
            VectorData(id=f"s{i}", document_id="d", text=f"t{i}", vector=db[i], segment_id=i)
            for i in range(n)
        ]
        s1 = TpuIVFStore(str(tmp_path), "ivfcol", dim=d, n_clusters=8, nprobe=8)
        s1.build(data)
        before = s1.search(db[3], 3)
        s1.checkpoint()

        s2 = TpuIVFStore(str(tmp_path), "ivfcol", dim=d, n_clusters=8, nprobe=8)
        assert s2.count == n
        after = s2.search(db[3], 3)
        assert [h.id for h in after] == [h.id for h in before]


class TestIVFDtypes:
    @pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
    def test_quantized_clusters_recall(self, rng, dtype):
        d, n, k = 48, 4096, 10
        centers = unit(rng, 32, d)
        assign = rng.integers(0, 32, size=n)
        db = centers[assign] + 0.04 * rng.standard_normal((n, d)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        ids = [f"z{i}" for i in range(n)]
        a = IVFIndex(dim=d, n_clusters=64, nprobe=24)
        b = IVFIndex(dim=d, n_clusters=64, nprobe=24, dtype=dtype)
        a.build(db, ids)
        b.build(db, ids)
        qs = unit(rng, 8, d) * 0 + db[rng.integers(0, n, 8)]  # exact-row queries
        ra, rb = a.search(qs, k), b.search(qs, k)
        overlap = np.mean([
            len({s for s, _ in ra[i]} & {s for s, _ in rb[i]}) / k
            for i in range(8)
        ])
        assert overlap >= 0.85, overlap
        # scores dequantize to ~the f32 values
        assert abs(ra[0][0][1] - rb[0][0][1]) < 0.02

    def test_quantized_save_load(self, rng, tmp_path):
        d, n = 32, 800
        db = unit(rng, n, d)
        idx = IVFIndex(dim=d, n_clusters=16, nprobe=16, dtype="int8")
        idx.build(db, [f"p{i}" for i in range(n)])
        path = str(tmp_path / "ivf8")
        idx.save(path)
        idx2 = IVFIndex.load(path)
        assert idx2.dtype == "int8" and idx2.count == n
        assert [s for s, _ in idx2.search(db[5:6], 3)[0]] == \
               [s for s, _ in idx.search(db[5:6], 3)[0]]


def test_sharded_compaction(rng):
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:4]), ("shard",))
    d, n = 32, 200
    db = unit(rng, n, d)
    ids = [f"c{i}" for i in range(n)]
    idx = ShardedFlatIndex(dim=d, mesh=mesh, capacity_per_shard=1024, use_fused=False)
    idx.add(db, ids)
    fill_before = sum(idx.counts)
    idx.delete(ids[:120])  # >25% dead -> auto-compact
    assert idx.dead == 0, "compaction should have run"
    assert sum(idx.counts) == 80 < fill_before
    hits = idx.search(db[150:151], 1)
    assert hits[0][0][0] == "c150"
    assert not any(idx.search(db[5:6], 3)[0][0][0] == "c5" for _ in [0])
