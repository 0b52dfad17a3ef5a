"""Recovery: rebuild device-resident indexes from the SQL source of truth.

SURVEY.md §5 (checkpoint/resume): every vector is durable in the SQL
`embeddings` table (vector BLOBs), so the device index is a rebuildable
cache. The reference gets this implicitly by re-loading its HNSW files per
query; here recovery is explicit and batched:

  - on collection access, if the store is empty but SQL has rows,
    `rebuild_collection` streams vectors back onto the device in 4k batches;
  - a full `rebuild_all` covers process restarts without checkpoints.
"""

from __future__ import annotations

import time

import numpy as np

from .db.models import iter_collection_embeddings
from .log import get_logger
from .runtime import Runtime
from .store.base import VectorData

logger = get_logger(__name__)


def list_collections(rt: Runtime) -> list[str]:
    rows = rt.db.query("SELECT DISTINCT collection FROM embeddings")
    return [r["collection"] for r in rows]


def rebuild_collection(rt: Runtime, collection: str, batch: int = 4096,
                       force: bool = False) -> int:
    """Stream a collection's vectors from SQL into its store. Returns rows
    restored. No-op if the store already has content (e.g. restored from a
    checkpoint file) unless force=True (partial restore: a checkpoint that
    skipped its device-built base — adds are idempotent, so re-streaming
    over the restored spill is safe)."""
    store = rt.store(collection)
    if store.count > 0 and not force:
        return 0
    t0 = time.perf_counter()
    total = 0
    pending: list[VectorData] = []
    store._recovering = True  # suppress per-batch auto-rebuilds
    try:
        for row in iter_collection_embeddings(rt.db, collection, batch=batch):
            pending.append(
                VectorData(
                    id=row.uuid,
                    document_id=row.document_id,
                    text=row.content,
                    vector=np.asarray(row.vector, np.float32),
                    segment_id=row.segment,
                )
            )
            if len(pending) >= batch:
                store.add_vectors(pending)
                total += len(pending)
                pending = []
        if pending:
            store.add_vectors(pending)
            total += len(pending)
    except BaseException:
        # Restore the "empty or complete" invariant: a partially-populated
        # store would make every later retry a no-op (the count>0 gate
        # above) and silently serve a partial index forever. SQL holds
        # everything, so dropping the partial restore loses nothing.
        if not force:
            try:
                store.delete_all()
            except Exception:
                logger.exception("cleanup of partial rebuild failed for %r",
                                 collection)
        raise
    finally:
        store._recovering = False
    if getattr(store, "needs_recovery", False):
        store.recovered()
        if hasattr(store, "rebuild") and store.count > 0:
            store.rebuild()  # fold the recovered spill into partitions once
    if total:
        logger.info(
            "rebuilt collection %s from SQL: %d vectors in %.1fms",
            collection, total, (time.perf_counter() - t0) * 1000,
        )
    return total


def rebuild_all(rt: Runtime) -> dict[str, int]:
    return {c: rebuild_collection(rt, c) for c in list_collections(rt)}
