"""Crash-recovery tests: index rebuild from SQL, lease reaping, retries."""

from memex_tpu.config import Settings
from memex_tpu.db import queue
from memex_tpu.runtime import Runtime
from memex_tpu.worker import Worker

from test_encoder import tiny_engine


def make_rt(tmp_path, name="r"):
    settings = Settings.from_env(
        db_uri=f"sqlite://{tmp_path}/{name}.db",
        vector_uri="memory://",
        embedding_model="random",
    )
    settings.embedding_dim = 64
    rt = Runtime(settings)
    rt._engine = tiny_engine()
    return rt


def test_rebuild_from_sql(tmp_path):
    rt = make_rt(tmp_path)
    worker = Worker(rt, poll_interval=0.01)
    queue.enqueue(rt.db, "col", "alpha beta gamma delta content", queue.TaskType.Ingest)
    assert worker.drain(timeout=60)
    assert rt.store("col").count > 0

    # Simulate a process restart: fresh runtime, same DB, empty memory store.
    rt2 = make_rt(tmp_path)
    rt2.settings.db_uri = rt.settings.db_uri

    rt2._rebuilt = set()
    # Clear the shared memory store to simulate loss of device state.
    rt.store("col").delete_all()
    assert rt.store("col").count == 0
    # First touch through the fresh runtime lazily rebuilds from SQL.
    store2 = rt2.store("col")
    assert store2.count > 0
    q = rt.engine.encode_single("alpha beta")
    hits = store2.search(q, 1)
    assert hits and hits[0].score > 0
    # Explicit rebuild is a no-op once populated.
    from memex_tpu import recovery

    assert recovery.rebuild_collection(rt2, "col") == 0


def test_lease_reap_requeues_orphans(tmp_path):
    rt = make_rt(tmp_path, "lease")
    task = queue.enqueue(rt.db, "c", "content", queue.TaskType.Ingest)
    claimed = queue.check_for_jobs(rt.db, lease_s=-1.0)  # lease already expired
    assert claimed.id == task.id
    assert claimed.status == queue.JobStatus.Processing
    assert queue.reap_expired(rt.db) == 1
    again = queue.get_task(rt.db, task.id)
    assert again.status == queue.JobStatus.Queued


def test_failed_task_retries_then_parks(tmp_path):
    rt = make_rt(tmp_path, "retry")
    task = queue.enqueue(rt.db, "c", "content", queue.TaskType.Ingest)
    for _ in range(queue.MAX_RETRIES + 2):
        claimed = queue.check_for_jobs(rt.db)
        if claimed is None:
            break
        queue.mark_failed(rt.db, claimed.id, retry=True, error={"error": "boom"})
    final = queue.get_task(rt.db, task.id)
    assert final.status == queue.JobStatus.Failed
    assert final.error == {"error": "boom"}


def test_device_built_ivf_base_skipped_then_recovered(tmp_path):
    """A device-built IVF base (no host shadow) is NOT fetched at
    checkpoint time (the device->host link makes multi-GB fetches take
    ~an hour on remote TPUs); load flags the index and runtime.store()
    re-streams the rows from SQL, folding them back into partitions."""
    import numpy as np
    import jax.numpy as jnp

    from memex_tpu.index import IVFIndex
    from memex_tpu.ops.fused_topk import quantize_rows_int8

    rng = np.random.default_rng(3)
    n, d = 2048, 32
    db = rng.standard_normal((n, d)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    codes, scales = quantize_rows_int8(jnp.asarray(db))
    idx = IVFIndex(dim=d, n_clusters=8, nprobe=8, dtype="int8",
                   use_fused=False)
    idx.build_device(codes, scales, [f"v{i}" for i in range(n)])
    idx.add(db[:5] * 0.99, [f"s{i}" for i in range(5)])
    path = str(tmp_path / "dev.ivf")
    idx.save(path)
    import json
    import os

    meta = json.load(open(path + ".meta.json"))
    assert meta["base_skipped"] is True
    assert not os.path.exists(path + ".npz")
    idx2 = IVFIndex.load(path, use_fused=False)
    assert idx2.needs_recovery and idx2.data is None
    assert idx2.spill.count == 5  # spill segment log restored

    # With MEMEX_CKPT_DEVICE_BASE=1 the fetch happens and load is complete.
    os.environ["MEMEX_CKPT_DEVICE_BASE"] = "1"
    try:
        path2 = str(tmp_path / "dev2.ivf")
        idx.save(path2)
        idx3 = IVFIndex.load(path2, use_fused=False)
        assert not idx3.needs_recovery and idx3.count == idx.count
    finally:
        del os.environ["MEMEX_CKPT_DEVICE_BASE"]


def test_forced_recovery_restreams_partial_store(tmp_path):
    """needs_recovery stores get force-rebuilt even though count > 0
    (restored spill); idempotent adds dedupe the overlap."""
    from memex_tpu import recovery
    from memex_tpu.store.base import VectorData
    from memex_tpu.store.tpu_store import TpuIVFStore
    import numpy as np

    rt = make_rt(tmp_path, name="f")
    worker = Worker(rt, poll_interval=0.01)
    queue.enqueue(rt.db, "colf", "one two three four five content words",
                  queue.TaskType.Ingest)
    assert worker.drain(timeout=60)
    sql_rows = len(rt.db.query(
        "SELECT uuid FROM embeddings WHERE collection='colf'"))
    assert sql_rows > 0

    # Build a partial IVF store: one row already present + recovery flag.
    store = TpuIVFStore(str(tmp_path / "vecf"), "colf", dim=64,
                        n_clusters=4, nprobe=4, use_fused=False)
    row = rt.db.query("SELECT * FROM embeddings WHERE collection='colf'")[0]
    from memex_tpu.db.models import iter_collection_embeddings

    first = next(iter_collection_embeddings(rt.db, "colf"))
    store.add_vectors([VectorData(
        id=first.uuid, document_id=first.document_id, text=first.content,
        vector=np.asarray(first.vector, np.float32))])
    store.index.needs_recovery = True
    assert store.count == 1

    rt._rebuilt = set()
    orig_store = rt.store

    def patched(collection):
        if collection == "colf" and collection not in rt._rebuilt:
            # inject our partial store into the registry path
            pass
        return orig_store(collection)

    restored = recovery.rebuild_collection(
        rt_for_store(rt, store), "colf", force=True)
    assert restored == sql_rows
    assert store.count == sql_rows  # overlap deduped by idempotent add
    assert not store.needs_recovery


def rt_for_store(rt, store):
    """Tiny runtime facade: same db, fixed store (keeps the test off the
    registry plumbing)."""

    class _RT:
        db = rt.db

        @staticmethod
        def store(collection):
            return store

    return _RT()
