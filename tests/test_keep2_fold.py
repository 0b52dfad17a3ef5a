"""keep2 slot-fold tests (interpret mode, hermetic).

The single-winner candidate fold loses a true top-k row whenever another
top-k row of the same query occupies the same slot (positions congruent
mod S = banks*128): measured at 1M x 384 the SAME oracle rows were lost
at every bank width (3/320, each ≡ another top-10 row mod S), capping
refine-tier recall at 0.9906 no matter how deep the rerank looked.
keep2 keeps the best TWO rows per slot — exact under the one-candidate-
per-slot-per-chunk structure — so a loss now needs THREE colliding
top-k rows (P ~ C(k,3)/S^2). Covers ops/fused_topk._fold_chunks and the
keep2 plumbing in index/flat.py. Reference recall bar: HNSW scores
original f32 rows (lib/libmemex/src/storage/local.rs:71-91)."""

import jax.numpy as jnp
import numpy as np
import pytest

from memex_tpu.index.flat import _search_rerank_fused
from memex_tpu.ops.fused_topk import (
    fused_score_topk_int4_rerank,
    fused_score_topk_int8q,
    quantize_rows_int4,
    quantize_rows_int8,
    quantize_rows_int8_refine,
)

N, D, BLOCK = 512, 128, 256
S = 128  # banks=1


@pytest.fixture
def rng():
    return np.random.default_rng(23)


def _collision_corpus(rng):
    """Rows 5 and 5+S are the two best for `q` and collide in slot 5."""
    db = rng.standard_normal((N, D)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = rng.standard_normal((1, D)).astype(np.float32)
    q /= np.linalg.norm(q)
    db[5] = 0.99 * q[0] + np.sqrt(1 - 0.99**2) * db[5]
    db[5 + S] = 0.98 * q[0] + np.sqrt(1 - 0.98**2) * db[5 + S]
    db[5] /= np.linalg.norm(db[5])
    db[5 + S] /= np.linalg.norm(db[5 + S])
    return jnp.asarray(db), jnp.asarray(q)


class TestKeep2Int8q:
    def test_single_winner_fold_loses_collided_row(self, rng):
        db, q = _collision_corpus(rng)
        db8, sc = quantize_rows_int8(db)
        _, idx = fused_score_topk_int8q(
            db8, sc, q, 10, count=N, block_n=BLOCK, banks=1,
            keep2=False, interpret=True)
        ids = set(np.asarray(idx)[0].tolist())
        assert 5 in ids and (5 + S) not in ids  # the shadow loss, by design

    def test_keep2_recovers_both(self, rng):
        db, q = _collision_corpus(rng)
        db8, sc = quantize_rows_int8(db)
        _, idx = fused_score_topk_int8q(
            db8, sc, q, 10, count=N, block_n=BLOCK, banks=1,
            keep2=True, interpret=True)
        ids = set(np.asarray(idx)[0].tolist())
        assert {5, 5 + S} <= ids

    def test_keep2_matches_keep1_top1_and_scores(self, rng):
        db = rng.standard_normal((N, D)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        q = jnp.asarray(db[:3])  # self-queries: unambiguous winners
        db8, sc = quantize_rows_int8(jnp.asarray(db))
        v1, i1 = fused_score_topk_int8q(
            db8, sc, q, 5, count=N, block_n=BLOCK, banks=1,
            keep2=False, interpret=True)
        v2, i2 = fused_score_topk_int8q(
            db8, sc, q, 5, count=N, block_n=BLOCK, banks=1,
            keep2=True, interpret=True)
        np.testing.assert_array_equal(np.asarray(i1)[:, 0], np.asarray(i2)[:, 0])
        np.testing.assert_allclose(np.asarray(v1)[:, 0], np.asarray(v2)[:, 0],
                                   rtol=1e-6)
        # keep2's k-th value can only be >= keep1's (superset bank)
        assert np.all(np.asarray(v2)[:, -1] >= np.asarray(v1)[:, -1] - 1e-6)

    def test_keep2_no_duplicate_candidates(self, rng):
        db = rng.standard_normal((N, D)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        q = jnp.asarray(db[:2])
        db8, sc = quantize_rows_int8(jnp.asarray(db))
        _, idx = fused_score_topk_int8q(
            db8, sc, q, 10, count=N, block_n=BLOCK, banks=1,
            keep2=True, interpret=True)
        for row in np.asarray(idx):
            assert len(set(row.tolist())) == len(row)


class TestKeep2Int4:
    def test_keep2_recovers_collided_row(self, rng):
        db, q = _collision_corpus(rng)
        db8, sc = quantize_rows_int8(db)
        db4t, _ = quantize_rows_int4(db)
        _, i1 = fused_score_topk_int4_rerank(
            db4t, sc, db8, q, 10, count=N, rerank=64, block_n=BLOCK,
            banks=1, keep2=False, interpret=True)
        _, i2 = fused_score_topk_int4_rerank(
            db4t, sc, db8, q, 10, count=N, rerank=64, block_n=BLOCK,
            banks=1, keep2=True, interpret=True)
        assert (5 + S) not in set(np.asarray(i1)[0].tolist())
        assert {5, 5 + S} <= set(np.asarray(i2)[0].tolist())


class TestKeep2RerankFused:
    def test_refine_path_recovers_collided_row(self, rng):
        db, q = _collision_corpus(rng)
        db8, sc, rq8, rsc2 = quantize_rows_int8_refine(db)
        # block_n=128 -> the int8q branch clamps banks to 1 (S=128),
        # matching the fixture's mod-128 collision.
        vals, idx = _search_rerank_fused(
            db8, sc, None, rq8, rsc2, None, N, q, 10, 64, 64, 128,
            True, False, "int8", True, False, 16, True)
        ids = set(np.asarray(idx)[0].tolist())
        assert {5, 5 + S} <= ids
        # refined scores reconstruct ~14-bit: top-2 within 2e-3 of truth
        truth = np.asarray(jnp.einsum("qd,nd->qn", q, db))[0]
        got = np.asarray(vals)[0]
        order = np.argsort(-truth)[:2]
        np.testing.assert_allclose(got[:2], truth[order], atol=2e-3)

    def test_int4_refine_path_keep2(self, rng):
        db, q = _collision_corpus(rng)
        db8, sc, rq8, rsc2 = quantize_rows_int8_refine(db)
        db4t, _ = quantize_rows_int4(db)
        _, idx = _search_rerank_fused(
            db4t, sc, db8, rq8, rsc2, None, N, q, 10, 64, 128, BLOCK,
            True, True, "int4", True, False, 1, True)
        assert {5, 5 + S} <= set(np.asarray(idx)[0].tolist())


class TestKeep2IVFBatch:
    def _table(self, rng, C=4, M=256, D=128):
        import jax

        data = rng.standard_normal((C, M, D)).astype(np.float32)
        data /= np.linalg.norm(data, axis=2, keepdims=True)
        q = rng.standard_normal((1, D)).astype(np.float32)
        q /= np.linalg.norm(q)
        # two best rows in cluster 1 at slots 5 and 5+S (S=128, banks=1)
        data[1, 5] = 0.99 * q[0] + np.sqrt(1 - 0.99**2) * data[1, 5]
        data[1, 5 + 128] = 0.98 * q[0] + np.sqrt(1 - 0.98**2) * data[1, 5 + 128]
        data[1, 5] /= np.linalg.norm(data[1, 5])
        data[1, 5 + 128] /= np.linalg.norm(data[1, 5 + 128])
        codes = np.clip(np.round(data / (np.abs(data).max(axis=2,
                        keepdims=True) / 127.0)), -127, 127).astype(np.int8)
        rscales = (np.abs(data).max(axis=2) / 127.0).astype(np.float32)
        sizes = np.full((C,), M, np.int32)
        clist = jnp.asarray(np.arange(C, dtype=np.int32))
        nact = jnp.asarray([C], dtype=np.int32)
        del jax
        return (jnp.asarray(codes), jnp.asarray(rscales),
                jnp.asarray(sizes), clist, nact, jnp.asarray(q))

    def test_ivf_keep2_recovers_collided_row(self, rng):
        from memex_tpu.ops.ivf_batch import ivf_batch_topk

        data, rscales, sizes, clist, nact, q = self._table(rng)
        M = data.shape[1]
        _, cl1, sl1 = ivf_batch_topk(data, rscales, sizes, clist, nact, q,
                                     10, banks=1, interpret=True)
        got1 = {(int(c), int(s)) for c, s in zip(np.asarray(cl1)[0],
                                                 np.asarray(sl1)[0])}
        assert (1, 5) in got1 and (1, 5 + 128) not in got1
        _, cl2, sl2 = ivf_batch_topk(data, rscales, sizes, clist, nact, q,
                                     10, banks=1, interpret=True, keep2=True)
        got2 = {(int(c), int(s)) for c, s in zip(np.asarray(cl2)[0],
                                                 np.asarray(sl2)[0])}
        assert {(1, 5), (1, 5 + 128)} <= got2
        assert M  # silence unused

    def test_ivf4_keep2_recovers_collided_row(self, rng):
        from memex_tpu.ops.ivf_batch4 import ivf_batch_topk4, pack_int4_buckets

        data, rscales, sizes, clist, nact, q = self._table(rng)
        data4, rsc4 = pack_int4_buckets(data, rscales, banks=1)
        _, cl1, sl1 = ivf_batch_topk4(data4, rsc4, sizes, clist, nact, q,
                                      10, banks=1, interpret=True)
        got1 = {(int(c), int(s)) for c, s in zip(np.asarray(cl1)[0],
                                                 np.asarray(sl1)[0])}
        assert (1, 5 + 128) not in got1
        _, cl2, sl2 = ivf_batch_topk4(data4, rsc4, sizes, clist, nact, q,
                                      10, banks=1, interpret=True, keep2=True)
        got2 = {(int(c), int(s)) for c, s in zip(np.asarray(cl2)[0],
                                                 np.asarray(sl2)[0])}
        assert {(1, 5), (1, 5 + 128)} <= got2


class TestKeep2F32Exact:
    def test_exact_keep2_is_exact_end_to_end(self, rng):
        from memex_tpu.ops.fused_topk import fused_score_topk

        db, q = _collision_corpus(rng)
        _, i1 = fused_score_topk(db, q, 10, count=N, block_n=BLOCK, banks=1,
                                 exact=True, keep2=False, interpret=True)
        assert (5 + S) not in set(np.asarray(i1)[0].tolist())
        v2, i2 = fused_score_topk(db, q, 10, count=N, block_n=BLOCK, banks=1,
                                  exact=True, keep2=True, interpret=True)
        truth = np.asarray(jnp.einsum("qd,nd->qn", q, db))[0]
        order = np.argsort(-truth)[:10]
        np.testing.assert_array_equal(np.asarray(i2)[0], order)
        np.testing.assert_allclose(np.asarray(v2)[0], truth[order], rtol=1e-6)
