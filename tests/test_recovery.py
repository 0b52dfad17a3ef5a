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
