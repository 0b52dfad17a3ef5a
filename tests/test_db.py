"""DB layer tests — mirrors the reference's hermetic queue test
(lib/libmemex/src/db/queue.rs:208-243) plus lease-reaping and entity tests."""

import numpy as np
import pytest

from memex_tpu.db import create_connection_by_uri, models, queue


@pytest.fixture
def db():
    return create_connection_by_uri("sqlite::memory:", run_migrations=True)


def test_enqueue_and_dequeue(db):
    task = queue.enqueue(db, "job-id", "this is the content", queue.TaskType.Ingest)
    assert task.id > 0
    assert task.status == queue.JobStatus.Queued
    assert task.content == "this is the content"

    job = queue.check_for_jobs(db)
    assert job is not None
    assert job.id == task.id

    model = queue.get_task(db, job.id)
    assert model.status == queue.JobStatus.Processing

    # No second job to claim
    assert queue.check_for_jobs(db) is None


def test_claim_order_is_fifo(db):
    t1 = queue.enqueue(db, "c", "first", queue.TaskType.Ingest)
    # ensure created_at differs
    db.execute("UPDATE queue SET created_at = '2000-01-01T00:00:00.000000Z' WHERE id = ?", (t1.id,))
    queue.enqueue(db, "c", "second", queue.TaskType.Summarize)
    job = queue.check_for_jobs(db)
    assert job.id == t1.id


def test_mark_done_with_output(db):
    task = queue.enqueue(db, "tasks", "text", queue.TaskType.Summarize)
    queue.check_for_jobs(db)
    queue.mark_done(db, task.id, task_output={"bullets": "- a\n- b"})
    done = queue.get_task(db, task.id)
    assert done.status == queue.JobStatus.Completed
    assert done.task_output == {"bullets": "- a\n- b"}


def test_mark_failed_retries_then_fails(db):
    task = queue.enqueue(db, "c", "x", queue.TaskType.Ingest)
    for _ in range(queue.MAX_RETRIES + 1):
        claimed = queue.check_for_jobs(db)
        assert claimed is not None
        queue.mark_failed(db, task.id, retry=True, error={"error_type": "boom", "msg": "err"})
        t = queue.get_task(db, task.id)
        assert t.status == queue.JobStatus.Queued
    # retries exhausted
    queue.check_for_jobs(db)
    queue.mark_failed(db, task.id, retry=False, error={"error_type": "boom", "msg": "err"})
    t = queue.get_task(db, task.id)
    assert t.status == queue.JobStatus.Failed
    assert t.error["error_type"] == "boom"


def test_reap_expired_lease(db):
    task = queue.enqueue(db, "c", "x", queue.TaskType.Ingest)
    claimed = queue.check_for_jobs(db, lease_s=-1.0)  # already expired
    assert claimed is not None
    assert queue.get_task(db, task.id).status == queue.JobStatus.Processing
    reaped = queue.reap_expired(db)
    assert reaped == 1
    assert queue.get_task(db, task.id).status == queue.JobStatus.Queued


def test_document_and_embeddings_roundtrip(db):
    task = queue.enqueue(db, "col", "full doc content", queue.TaskType.Ingest)
    doc = models.insert_document_from_task(db, task)
    assert doc.uuid == models.document_uuid_for_task(task.id)

    segments = ["seg one", "seg two", "seg three"]
    vectors = np.random.RandomState(0).randn(3, 8).astype(np.float32)
    uuids = models.insert_embeddings(db, doc.uuid, "col", segments, vectors)
    assert len(set(uuids)) == 3

    hydrated = models.get_embeddings_by_uuids(db, uuids)
    assert set(hydrated) == set(uuids)
    row = hydrated[uuids[1]]
    assert row.content == "seg two"
    assert row.segment == 1
    assert row.document_id == doc.uuid
    np.testing.assert_allclose(row.vector, vectors[1])

    streamed = list(models.iter_collection_embeddings(db, "col", batch=2))
    assert len(streamed) == 3

    deleted = models.delete_collection_embeddings(db, "col")
    assert deleted == 3


def test_uuid5_parity_shape():
    # Deterministic and stable across runs/processes.
    a = models.document_uuid_for_task(1)
    b = models.document_uuid_for_task(1)
    assert a == b
    assert models.segment_uuid(a, 0) != models.segment_uuid(a, 1)


def test_enqueue_many(db):
    queue.enqueue_many(
        db,
        [("c1", "a", queue.TaskType.Ingest), ("c2", "b", queue.TaskType.Extract)],
    )
    rows = db.query("SELECT * FROM queue ORDER BY id")
    assert len(rows) == 2
    assert rows[1]["task_type"] == "Extract"


def test_two_process_claims_do_not_collide(tmp_path):
    """API/Worker split across processes shares the queue through SQLite;
    atomic claims must never double-assign (reference's only cluster
    mechanism, db/queue.rs:167-206). Simulated with two Database handles
    (separate connections) against one file."""
    from memex_tpu.db.connection import create_connection_by_uri
    from memex_tpu.db import queue

    uri = f"sqlite://{tmp_path}/shared.db"
    a = create_connection_by_uri(uri, run_migrations=True)
    b = create_connection_by_uri(uri, run_migrations=False)
    for i in range(20):
        queue.enqueue(a, "c", f"doc {i}", queue.TaskType.Ingest)
    claimed = []
    import threading

    def drain(db):
        while True:
            t = queue.check_for_jobs(db)
            if t is None:
                return
            claimed.append(t.id)

    t1 = threading.Thread(target=drain, args=(a,))
    t2 = threading.Thread(target=drain, args=(b,))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert sorted(claimed) == sorted(set(claimed))  # no double-claims
    assert len(claimed) == 20
