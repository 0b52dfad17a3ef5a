"""ops/host.fetch and the runtime store-add microbatcher."""

import numpy as np


def test_fetch_overlaps_and_converts():
    import jax.numpy as jnp

    from memex_tpu.ops.host import fetch

    a = jnp.arange(6).reshape(2, 3)
    b = jnp.ones((4,), jnp.float32)
    na, nb = fetch(a, b)
    assert isinstance(na, np.ndarray) and isinstance(nb, np.ndarray)
    np.testing.assert_array_equal(na, np.arange(6).reshape(2, 3))
    np.testing.assert_array_equal(nb, np.ones((4,), np.float32))


def test_fetch_passes_plain_arrays():
    from memex_tpu.ops.host import fetch

    (out,) = fetch(np.zeros((3,)))
    np.testing.assert_array_equal(out, np.zeros((3,)))


def test_runtime_add_vectors_batches_across_threads(tmp_path):
    """Concurrent add_vectors calls on one collection merge into shared
    store writes and every vector lands exactly once."""
    import threading

    from memex_tpu.config import Settings
    from memex_tpu.runtime import Runtime
    from memex_tpu.store.base import VectorData

    settings = Settings.from_env(
        db_uri=f"sqlite://{tmp_path}/t.db",
        vector_uri=f"tpu://{tmp_path}/vec",
        embedding_model="random",
    )
    rt = Runtime(settings)
    dim = settings.embedding_dim
    rng = np.random.default_rng(0)

    def add(i):
        v = rng.standard_normal((1, dim)).astype(np.float32)
        v /= np.linalg.norm(v)
        rt.add_vectors("c", [VectorData(id=f"v{i}", document_id="d", text="t",
                                        vector=v[0], segment_id=0)])

    threads = [threading.Thread(target=add, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    store = rt.store("c")
    assert store.count == 8
