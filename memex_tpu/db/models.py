"""Documents + embeddings entities.

Parity with the reference entities (lib/libmemex/src/db/document.rs,
db/embedding.rs) including deterministic UUIDv5 ids: document uuid from the
task id (document.rs:72-85), segment uuid from "{doc_uuid}-{idx}"
(lib/worker/src/tasks.rs:35-40), both under the shared NAMESPACE.

Vectors are stored as little-endian float32 BLOBs (+dim) instead of the
reference's JSON arrays (embedding.rs:22) — ~6x smaller and zero-copy into
numpy for index rebuilds. Hydration after search is a single batched
SELECT ... WHERE uuid IN (...) instead of the reference's N sequential
queries (lib/api/src/endpoints/collections/handlers.rs:87-102).
"""

from __future__ import annotations

import json
import uuid as _uuid
from dataclasses import dataclass

import numpy as np

from .. import NAMESPACE
from .connection import Database, utcnow
from .queue import Task


@dataclass
class Document:
    id: int
    uuid: str
    task_id: int
    content: str
    metadata: dict | None
    created_at: str
    updated_at: str


@dataclass
class EmbeddingRow:
    id: int
    document_id: str
    uuid: str
    segment: int
    content: str
    vector: np.ndarray
    collection: str
    metadata: dict | None


def document_uuid_for_task(task_id: int) -> str:
    return str(_uuid.uuid5(NAMESPACE, str(task_id)))


def segment_uuid(doc_uuid: str, idx: int) -> str:
    return str(_uuid.uuid5(NAMESPACE, f"{doc_uuid}-{idx}"))


def insert_document_from_task(db: Database, task: Task) -> Document:
    """document::ActiveModel::from_task (document.rs:72-85).

    Idempotent on task RETRY: the document uuid is uuid5(task.id), so a
    re-run after a partial failure (e.g. the store write raised after this
    insert committed) must return the existing row instead of tripping the
    documents.uuid UNIQUE constraint forever and parking the task Failed."""
    now = utcnow()
    doc_uuid = document_uuid_for_task(task.id)
    # One atomic upsert (sqlite >= 3.24 and postgres share the syntax):
    # a SELECT-then-INSERT would re-open the UNIQUE race under a
    # double-claim (lease expiry + a still-running worker).
    cur = db.execute(
        "INSERT INTO documents (uuid, task_id, content, created_at, updated_at)"
        " VALUES (?, ?, ?, ?, ?)"
        " ON CONFLICT(uuid) DO UPDATE SET content=excluded.content,"
        " updated_at=excluded.updated_at"
        " RETURNING id",
        (doc_uuid, task.id, task.content, now, now),
    )
    row = cur.fetchone()
    return Document(
        id=row["id"] if row is not None else cur.lastrowid,
        uuid=doc_uuid,
        task_id=task.id,
        content=task.content,
        metadata=None,
        created_at=now,
        updated_at=now,
    )


def insert_embeddings(
    db: Database,
    doc_uuid: str,
    collection: str,
    segments: list[str],
    vectors: np.ndarray,
) -> list[str]:
    """Insert one row per segment in a single transaction
    (lib/worker/src/tasks.rs:31-57). Returns the segment uuids.

    Idempotent on task retry: segment uuids are deterministic
    (uuid5(doc_uuid-idx)), so a replay first clears the document's prior
    rows in the same transaction — otherwise every retry would duplicate
    the embeddings in SQL and bloat recovery."""
    assert len(segments) == vectors.shape[0], "# embeddings must match # segments"
    vectors = np.ascontiguousarray(vectors, dtype=np.float32)
    now = utcnow()
    uuids = [segment_uuid(doc_uuid, idx) for idx in range(len(segments))]
    with db.transaction() as conn:
        conn.execute("DELETE FROM embeddings WHERE document_id = ?", (doc_uuid,))
        conn.executemany(
            "INSERT INTO embeddings (document_id, uuid, segment, content, vector, dim,"
            " collection, created_at, updated_at) VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?)",
            [
                (
                    doc_uuid,
                    uuids[idx],
                    idx,
                    segments[idx],
                    vectors[idx].tobytes(),
                    int(vectors.shape[1]),
                    collection,
                    now,
                    now,
                )
                for idx in range(len(segments))
            ],
        )
    return uuids


def _row_to_embedding(row) -> EmbeddingRow:
    vec = np.frombuffer(row["vector"], dtype=np.float32).copy()
    return EmbeddingRow(
        id=row["id"],
        document_id=row["document_id"],
        uuid=row["uuid"],
        segment=row["segment"],
        content=row["content"],
        vector=vec,
        collection=row["collection"],
        metadata=json.loads(row["metadata"]) if row["metadata"] else None,
    )


def get_embeddings_by_uuids(db: Database, uuids: list[str]) -> dict[str, EmbeddingRow]:
    """Batched hydration for search results (replaces the reference's N+1
    loop, collections/handlers.rs:87-102)."""
    if not uuids:
        return {}
    out: dict[str, EmbeddingRow] = {}
    CHUNK = 512  # stay under sqlite's bound-parameter limit
    for i in range(0, len(uuids), CHUNK):
        chunk = uuids[i : i + CHUNK]
        placeholders = ",".join("?" * len(chunk))
        rows = db.query(
            f"SELECT * FROM embeddings WHERE uuid IN ({placeholders})", tuple(chunk)
        )
        for row in rows:
            out[row["uuid"]] = _row_to_embedding(row)
    return out


def iter_collection_embeddings(db: Database, collection: str, batch: int = 4096):
    """Stream a collection's embeddings for index rebuild (checkpoint/resume
    via SQL source of truth, SURVEY.md §5)."""
    last_id = 0
    while True:
        rows = db.query(
            "SELECT * FROM embeddings WHERE collection = ? AND id > ?"
            " ORDER BY id ASC LIMIT ?",
            (collection, last_id, batch),
        )
        if not rows:
            return
        for row in rows:
            last_id = row["id"]
            yield _row_to_embedding(row)


def delete_collection_embeddings(db: Database, collection: str) -> int:
    cur = db.execute("DELETE FROM embeddings WHERE collection = ?", (collection,))
    return cur.rowcount
