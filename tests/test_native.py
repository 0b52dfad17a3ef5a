"""Native C++ component tests: HNSW store recall + persistence, WordPiece
tokenizer parity with the pure-Python implementation."""

import ctypes

import numpy as np
import pytest

from memex_tpu import native_lib
from memex_tpu.store.base import VectorData

pytestmark = pytest.mark.skipif(
    not native_lib.available(), reason="native toolchain unavailable"
)


def unit(rng, n, d):
    v = rng.standard_normal((n, d), dtype=np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


class TestHnswStore:
    def make(self, tmp_path, collection="t"):
        from memex_tpu.store.hnsw_store import HnswStore

        return HnswStore(str(tmp_path), collection, dim=64)

    def test_recall_vs_oracle(self, rng, tmp_path):
        store = self.make(tmp_path)
        n, k = 2000, 10
        db = unit(rng, n, 64)
        store.add_vectors(
            [VectorData(id=f"h{i}", document_id="d", text="", vector=db[i]) for i in range(n)]
        )
        assert store.count == n
        qs = unit(rng, 20, 64)
        expect = np.argsort(-(qs @ db.T), axis=1)[:, :k]
        recalls = []
        for qi, hits in enumerate(store.search_batch(qs, k)):
            got = {h.id for h in hits}
            want = {f"h{i}" for i in expect[qi]}
            recalls.append(len(got & want) / k)
        # ef_search=32 HNSW should be well above 0.8 at this scale
        assert np.mean(recalls) >= 0.8, np.mean(recalls)

    def test_self_query_top1(self, rng, tmp_path):
        store = self.make(tmp_path)
        db = unit(rng, 500, 64)
        store.add_vectors(
            [VectorData(id=f"s{i}", document_id="d", text="", vector=db[i]) for i in range(500)]
        )
        hits = store.search(db[42], 1)
        assert hits[0].id == "s42" and hits[0].score > 0.999

    def test_save_load_roundtrip(self, rng, tmp_path):
        from memex_tpu.store.hnsw_store import HnswStore

        store = self.make(tmp_path)
        db = unit(rng, 300, 64)
        store.add_vectors(
            [VectorData(id=f"r{i}", document_id="doc9", text="", vector=db[i]) for i in range(300)]
        )
        store.checkpoint()
        store2 = HnswStore(str(tmp_path), "t", dim=64)
        assert store2.count == 300
        hits = store2.search(db[7], 3)
        assert hits[0].id == "r7"
        assert hits[0].document_id == "doc9"

    def test_delete(self, rng, tmp_path):
        store = self.make(tmp_path)
        db = unit(rng, 100, 64)
        store.add_vectors(
            [VectorData(id=f"x{i}", document_id="d", text="", vector=db[i]) for i in range(100)]
        )
        assert store.delete(["x3"]) == 1
        assert all(h.id != "x3" for h in store.search(db[3], 5))


class TestNativeWordPiece:
    def encode_native(self, vocab: list[str], text: str) -> list[int]:
        lib = native_lib.text_lib()
        blob = "\n".join(vocab).encode("utf-8")
        h = lib.wp_new(blob, len(blob), 1)
        out = (ctypes.c_int32 * 4096)()
        n = lib.wp_encode(h, text.encode("utf-8"), len(text.encode("utf-8")), out, 4096)
        lib.wp_free(h)
        return list(out[: min(n, 4096)])

    def test_parity_with_python(self):
        from memex_tpu.text import WordPieceTokenizer

        tok = WordPieceTokenizer()
        for text in [
            "Hello, World! This is a TEST.",
            "naive cafe resume",          # ascii
            "naïve café résumé",           # accents strip to the same
            "punctuation... splits; right?",
            "numbers 12345 and mixed a1b2",
        ]:
            py = tok.encode(text, add_special_tokens=False)
            nat = self.encode_native(tok.vocab, text)
            assert nat == py, (text, nat, py)

    def test_accent_strip_matches(self):
        from memex_tpu.text import WordPieceTokenizer

        tok = WordPieceTokenizer()
        a = self.encode_native(tok.vocab, "naïve café")
        b = self.encode_native(tok.vocab, "naive cafe")
        assert a == b


class TestNativeFastPath:
    def test_encode_matches_pure_python(self, monkeypatch):
        from memex_tpu.text import WordPieceTokenizer

        texts = [
            "Hello, World! This is a TEST.",
            "punctuation... splits; right?",
            "numbers 12345 and mixed a1b2",
            "naïve café résumé",
        ]
        fast = WordPieceTokenizer()
        for t in texts:
            ids_fast = fast.encode(t)
            # force the pure-python path on a fresh instance
            slow = WordPieceTokenizer()
            slow._native = False
            ids_slow = slow.encode(t)
            assert ids_fast == ids_slow, t

    def test_env_disable(self, monkeypatch):
        monkeypatch.setenv("MEMEX_NO_NATIVE", "1")
        from memex_tpu.text import WordPieceTokenizer

        tok = WordPieceTokenizer()
        assert tok.encode("hello") and tok._native is False


class TestQuantLib:
    def test_quantize_matches_numpy(self):
        import numpy as np

        from memex_tpu.native_lib import np_quantize_rows_int8

        rng = np.random.default_rng(0)
        v = rng.standard_normal((512, 96)).astype(np.float32)
        q, s = np_quantize_rows_int8(v)
        absmax = np.maximum(np.abs(v).max(axis=1), 1e-12)
        s_ref = (absmax / 127.0).astype(np.float32)
        q_ref = np.clip(np.round(v / s_ref[:, None]), -127, 127).astype(np.int8)
        np.testing.assert_allclose(s, s_ref, rtol=1e-6)
        assert np.mean(q == q_ref) > 0.9999  # FP assoc. may flip rare ties
        np.testing.assert_allclose(
            q.astype(np.float32) * s[:, None], v, atol=float(s.max()) * 0.51
        )

    def test_normalize_matches_numpy(self):
        import numpy as np

        from memex_tpu.native_lib import np_normalize_rows

        rng = np.random.default_rng(1)
        v = rng.standard_normal((256, 64)).astype(np.float32) * 3
        v[7] = 0.0  # zero row stays zero
        out = np_normalize_rows(v)
        ref = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        np.testing.assert_allclose(out, ref, atol=1e-5)
        assert np.all(out[7] == 0.0)
        assert np.any(v[0] != out[0])  # caller's array not mutated
