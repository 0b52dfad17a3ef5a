"""Store abstraction tests: URI factory, registry caching, backend parity."""

import numpy as np
import pytest

from memex_tpu.store import StoreRegistry, VectorData, get_vector_storage


def unit(rng, n, d):
    v = rng.standard_normal((n, d), dtype=np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def make_data(db, prefix="v"):
    return [
        VectorData(id=f"{prefix}{i}", document_id=f"doc-{i//10}", text=f"t{i}", vector=db[i])
        for i in range(db.shape[0])
    ]


@pytest.mark.parametrize("scheme", ["memory://", "tpu://{tmp}", "hnsw://{tmp}"])
def test_backend_surface(scheme, rng, tmp_path):
    uri = scheme.format(tmp=tmp_path)
    reg = StoreRegistry()
    store = reg.get(uri, "col1", dim=32)
    db = unit(rng, 200, 32)
    store.add_vectors(make_data(db))
    assert store.count == 200
    hits = store.search(db[5], 3)
    assert hits[0].id == "v5"
    assert hits[0].score > 0.999
    assert hits[0].document_id == "doc-0"
    assert store.delete(["v5"]) == 1
    assert all(h.id != "v5" for h in store.search(db[5], 3))
    store.delete_all()
    assert store.count == 0
    assert store.search(db[0], 3) == []


def test_registry_returns_live_handle(tmp_path, rng):
    uri = f"tpu://{tmp_path}"
    reg = StoreRegistry()
    a = reg.get(uri, "c", dim=16)
    b = reg.get(uri, "c", dim=16)
    assert a is b  # no per-call reload (reference reloads per query)
    c = reg.get(uri, "other", dim=16)
    assert c is not a


def test_checkpoint_restore(tmp_path, rng):
    uri = f"tpu://{tmp_path}"
    db = unit(rng, 50, 16)
    reg = StoreRegistry()
    store = reg.get(uri, "persist", dim=16)
    store.add_vectors(make_data(db))
    store.checkpoint()
    reg2 = StoreRegistry()  # fresh process simulation
    store2 = reg2.get(uri, "persist", dim=16)
    assert store2.count == 50
    assert store2.search(db[9], 1)[0].id == "v9"


def test_unknown_scheme():
    reg = StoreRegistry()
    with pytest.raises(ValueError):
        reg.get("bogus://x", "c")


def test_module_level_factory(tmp_path, rng):
    store = get_vector_storage("memory://", "modlevel", dim=8)
    db = unit(rng, 4, 8)
    store.add_vectors(make_data(db))
    again = get_vector_storage("memory://", "modlevel", dim=8)
    assert again.count == 4


def test_mesh_store_surface(rng, tmp_path):
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device")
    reg = StoreRegistry()
    store = reg.get(f"tpu+mesh://{tmp_path}", "meshcol", dim=32)
    db = unit(rng, 100, 32)
    store.add_vectors(make_data(db, prefix="m"))
    assert store.count == 100
    hits = store.search(db[7], 3)
    assert hits[0].id == "m7" and hits[0].score > 0.999
    store.checkpoint()
    reg2 = StoreRegistry()
    store2 = reg2.get(f"tpu+mesh://{tmp_path}", "meshcol", dim=32)
    assert store2.count == 100
    assert store2.search(db[7], 1)[0].id == "m7"


def test_uri_query_options(rng, tmp_path):
    reg = StoreRegistry()
    store = reg.get(f"tpu://{tmp_path}?dtype=int8&capacity=4096", "qopts", dim=16)
    assert store.index.dtype == "int8"
    assert store.index.capacity == 4096
    h = reg.get(f"hnsw://{tmp_path}?ef_search=64&M=8", "qopts2", dim=16)
    assert h.ef_search == 64


def test_bool_uri_options(tmp_path, rng):
    from memex_tpu.store.registry import _build_store

    s = _build_store(f"tpu://{tmp_path}?dtype=int8&query_quantize=0", "boolcol", 32)
    assert s.index.query_quantize is False
    s2 = _build_store(f"tpu://{tmp_path}?query_quantize=true", "boolcol2", 32)
    assert s2.index.query_quantize is True
