"""Mixed-operation concurrency stress: threads hammer one collection with
ingest/search/delete while invariants are checked.

This round's review fixed several races on these paths (fused-dispatch vs
buffer donation, compaction renumbering under the id mapping, per-thread
SQL connections, per-collection recovery locks, batcher collect windows) —
this test drives them all together the way a loaded service would.
Hermetic: CPU backend, tiny engine, small corpus, bounded runtime.
"""

import threading

import numpy as np
import pytest

from memex_tpu.config import Settings
from memex_tpu.runtime import Runtime
from memex_tpu.store.base import VectorData

from test_encoder import tiny_engine


def unit(rng, n, d):
    v = rng.standard_normal((n, d), dtype=np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


@pytest.fixture
def rt(tmp_path):
    settings = Settings.from_env(
        db_uri=f"sqlite://{tmp_path}/stress.db",
        vector_uri=f"tpu://{tmp_path}/vec",
        embedding_model="random",
    )
    settings.embedding_dim = 64
    r = Runtime(settings)
    r._engine = tiny_engine()
    return r


def test_concurrent_add_search_delete_flat_store(rt, rng=None):
    rng = np.random.default_rng(9)
    d = 64
    store = rt.store("stress")
    base = unit(rng, 256, d)
    store.add_vectors([
        VectorData(id=f"base{i}", document_id="doc", text="", vector=base[i],
                   segment_id=i) for i in range(256)
    ])

    errors: list[BaseException] = []
    stop = threading.Event()
    added_batches = []

    def adder(tid):
        r = np.random.default_rng(100 + tid)
        for b in range(6):
            vecs = unit(r, 40, d)
            ids = [f"t{tid}b{b}i{i}" for i in range(40)]
            try:
                store.add_vectors([
                    VectorData(id=ids[i], document_id="doc", text="",
                               vector=vecs[i], segment_id=i)
                    for i in range(40)
                ])
                added_batches.append((ids, vecs))
            except BaseException as exc:  # noqa: BLE001
                errors.append(exc)
                return

    def searcher(tid):
        r = np.random.default_rng(200 + tid)
        while not stop.is_set():
            q = unit(r, 4, d)
            try:
                hits = store.search_batch(q, 5)
                for h in hits:
                    for item in h:
                        # ids must be real (never a renumbered/ghost row)
                        assert isinstance(item.id, str) and item.id
            except BaseException as exc:  # noqa: BLE001
                errors.append(exc)
                return

    def deleter():
        # Delete enough of the base to cross the 25% compaction threshold
        # WHILE searches and adds run (compaction renumbers rows).
        try:
            for s in range(0, 200, 25):
                store.delete([f"base{i}" for i in range(s, s + 25)])
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    threads = (
        [threading.Thread(target=adder, args=(t,)) for t in range(3)]
        + [threading.Thread(target=searcher, args=(t,)) for t in range(3)]
        + [threading.Thread(target=deleter)]
    )
    for t in threads:
        t.start()
    for t in threads[:3] + [threads[-1]]:  # adders + deleter
        t.join(timeout=120)
    stop.set()
    for t in threads[3:6]:
        t.join(timeout=30)

    assert not errors, errors[:3]
    # Invariants after the dust settles:
    assert store.count == 256 - 200 + 3 * 6 * 40
    # Deleted rows are gone.
    hits = store.search(unit(np.random.default_rng(9), 257, 64)[0], 10)
    assert all(not h.id.startswith("base1") or int(h.id[4:]) >= 200
               for h in hits if h.id.startswith("base"))
    # Every added row is findable by its own vector (exact top-1).
    r = np.random.default_rng(3)
    for ids, vecs in [added_batches[i] for i in
                      r.choice(len(added_batches), 4, replace=False)]:
        for j in (0, 17, 39):
            top = store.search(vecs[j], 1)[0]
            assert top.id == ids[j], (top.id, ids[j])


def test_concurrent_first_touch_and_writes_distinct_collections(rt):
    """Per-collection recovery locks: concurrent first touches of DIFFERENT
    collections must not serialize behind one global lock (correctness side
    only here — each collection ends consistent)."""
    rng = np.random.default_rng(4)
    d = 64
    errors: list[BaseException] = []

    def worker(cid):
        try:
            vecs = unit(np.random.default_rng(cid), 64, d)
            store = rt.store(f"col{cid}")
            store.add_vectors([
                VectorData(id=f"c{cid}v{i}", document_id="d", text="",
                           vector=vecs[i], segment_id=i) for i in range(64)
            ])
            hits = store.search(vecs[5], 1)
            assert hits[0].id == f"c{cid}v5"
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(c,)) for c in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors[:3]
    for c in range(6):
        assert rt.store(f"col{c}").count == 64
