"""SQL-backed task queue.

Parity with the reference queue (lib/libmemex/src/db/queue.rs):
  - JobStatus {Queued, Processing, Completed, Failed} (queue.rs:9-20)
  - TaskType {Ingest, Extract, Summarize} (queue.rs:22-34)
  - atomic claim via UPDATE ... WHERE id IN (SELECT ... LIMIT 1) RETURNING
    (queue.rs:167-206)
  - mark_done / mark_failed with retry requeue up to MAX_RETRIES=5
    (queue.rs:103-130)

New vs reference: claims take a lease (lease_expires_at); `reap_expired`
returns orphaned Processing rows to Queued, fixing the crash-recovery gap
noted in SURVEY.md §5.
"""

from __future__ import annotations

import enum
import json
from dataclasses import dataclass

from .connection import Database, utcnow

MAX_RETRIES = 5


class JobStatus(str, enum.Enum):
    Queued = "Queued"
    Processing = "Processing"
    Completed = "Completed"
    Failed = "Failed"


class TaskType(str, enum.Enum):
    Ingest = "Ingest"
    Extract = "Extract"
    Summarize = "Summarize"
    # New vs reference: background index maintenance (fold/retrain). The
    # query path never rebuilds in-request — it schedules one of these and
    # serves the bounded exact fallback until the worker lands it.
    Maintain = "Maintain"


@dataclass
class Task:
    id: int
    collection: str
    content: str
    task_type: TaskType
    status: JobStatus
    task_output: dict | list | str | None
    error: dict | None
    num_retries: int
    created_at: str
    updated_at: str

    @classmethod
    def from_row(cls, row) -> "Task":
        payload = json.loads(row["payload"]) if row["payload"] else {}
        return cls(
            id=row["id"],
            collection=row["collection"],
            content=payload.get("content", ""),
            task_type=TaskType(row["task_type"]),
            status=JobStatus(row["status"]),
            task_output=json.loads(row["task_output"]) if row["task_output"] else None,
            error=json.loads(row["error"]) if row["error"] else None,
            num_retries=row["num_retries"],
            created_at=row["created_at"],
            updated_at=row["updated_at"],
        )


def enqueue(db: Database, collection: str, content: str, task_type: TaskType) -> Task:
    """Insert a Queued task and return it (queue.rs:132-149)."""
    now = utcnow()
    cur = db.execute(
        "INSERT INTO queue (collection, payload, task_type, status, created_at, updated_at)"
        " VALUES (?, ?, ?, ?, ?, ?)",
        (collection, json.dumps({"content": content}), task_type.value, JobStatus.Queued.value, now, now),
    )
    return get_task(db, cur.lastrowid)


def enqueue_many(db: Database, items: list[tuple[str, str, TaskType]]) -> None:
    """Bulk insert (queue.rs:151-159). items = [(collection, content, type)]."""
    now = utcnow()
    db.executemany(
        "INSERT INTO queue (collection, payload, task_type, status, created_at, updated_at)"
        " VALUES (?, ?, ?, ?, ?, ?)",
        [
            (c, json.dumps({"content": content}), t.value, JobStatus.Queued.value, now, now)
            for (c, content, t) in items
        ],
    )


def has_pending(db: Database, collection: str, task_type: TaskType) -> bool:
    """True if a Queued/Processing task of this type exists for the
    collection — the dedup gate for maintenance scheduling (one rebuild
    services any number of shortfall queries)."""
    row = db.query_one(
        "SELECT COUNT(*) AS n FROM queue WHERE collection = ? AND task_type = ?"
        " AND status IN ('Queued', 'Processing')",
        (collection, task_type.value),
    )
    return bool(row and row["n"])


def get_task(db: Database, task_id: int) -> Task | None:
    row = db.query_one("SELECT * FROM queue WHERE id = ?", (task_id,))
    return Task.from_row(row) if row else None


def check_for_jobs(db: Database, lease_s: float = 300.0) -> Task | None:
    """Atomically claim the oldest Queued task (queue.rs:167-206).

    sqlite: the claim and the status flip happen in one UPDATE..RETURNING
    statement under the connection lock, so two workers in this process (or
    two processes via the sqlite write lock) never claim the same row.
    postgres: the subselect takes `FOR UPDATE SKIP LOCKED` (reference
    queue.rs:185-200 uses FOR UPDATE), so concurrent claims from many
    worker PROCESSES on many hosts skip each other's locked rows instead
    of serializing or double-claiming.
    """
    now = utcnow()
    import datetime as _dt

    lease = (
        _dt.datetime.now(_dt.timezone.utc) + _dt.timedelta(seconds=lease_s)
    ).strftime("%Y-%m-%dT%H:%M:%S.%fZ")
    if getattr(db, "dialect", "sqlite") == "postgres":
        sql = """
            UPDATE queue
            SET status = 'Processing', updated_at = ?, lease_expires_at = ?
            WHERE queue.id IN (
                SELECT id FROM queue
                WHERE status = 'Queued'
                ORDER BY queue.created_at ASC
                LIMIT 1
                FOR UPDATE SKIP LOCKED
            )
            RETURNING *
            """
    else:
        sql = """
            UPDATE queue
            SET status = 'Processing', updated_at = ?, lease_expires_at = ?
            WHERE queue.id IN (
                SELECT id FROM queue
                WHERE status = 'Queued'
                ORDER BY queue.created_at ASC
                LIMIT 1
            )
            RETURNING *
            """
    with db.transaction() as conn:
        row = conn.execute(sql, (now, lease)).fetchone()
    return Task.from_row(row) if row else None


def reap_expired(db: Database) -> int:
    """Return orphaned Processing tasks (expired lease) to the queue."""
    now = utcnow()
    cur = db.execute(
        """
        UPDATE queue
        SET status = 'Queued', updated_at = ?, lease_expires_at = NULL
        WHERE status = 'Processing'
          AND lease_expires_at IS NOT NULL
          AND lease_expires_at < ?
        """,
        (now, now),
    )
    return cur.rowcount


def requeue(db: Database, task_id: int) -> None:
    """Return a claimed task to Queued WITHOUT burning a retry — for cases
    where the worker never attempted it (e.g. the pool closed between the
    claim and the submit during shutdown)."""
    db.execute(
        "UPDATE queue SET status='Queued', updated_at=?, lease_expires_at=NULL"
        " WHERE id=? AND status='Processing'",
        (utcnow(), task_id),
    )


def mark_done(db: Database, task_id: int, task_output=None) -> None:
    """Flip to Completed (queue.rs:103-112); optionally store task_output
    (worker lib.rs:224-230 stores summarize output)."""
    if task_output is not None:
        db.execute(
            "UPDATE queue SET status='Completed', task_output=?, updated_at=?, lease_expires_at=NULL WHERE id=?",
            (json.dumps(task_output), utcnow(), task_id),
        )
    else:
        db.execute(
            "UPDATE queue SET status='Completed', updated_at=?, lease_expires_at=NULL WHERE id=?",
            (utcnow(), task_id),
        )


def set_task_output(db: Database, task_id: int, task_output) -> None:
    db.execute(
        "UPDATE queue SET task_output=?, updated_at=? WHERE id=?",
        (json.dumps(task_output), utcnow(), task_id),
    )


def mark_failed(db: Database, task_id: int, retry: bool = True, error: dict | None = None) -> None:
    """Requeue with a retry bump up to MAX_RETRIES, else terminal Failed
    (queue.rs:114-130)."""
    row = db.query_one("SELECT num_retries FROM queue WHERE id=?", (task_id,))
    if row is None:
        return
    err_json = json.dumps(error) if error is not None else None
    if retry and row["num_retries"] <= MAX_RETRIES:
        db.execute(
            "UPDATE queue SET status='Queued', num_retries=num_retries+1, error=?,"
            " updated_at=?, lease_expires_at=NULL WHERE id=?",
            (err_json, utcnow(), task_id),
        )
    else:
        db.execute(
            "UPDATE queue SET status='Failed', error=?, updated_at=?, lease_expires_at=NULL WHERE id=?",
            (err_json, utcnow(), task_id),
        )
