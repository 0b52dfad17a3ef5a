"""Request microbatching.

TPU throughput comes from batch: one encode+scan over Q=32 queries costs
barely more than Q=1 (the corpus read dominates). The batcher collects
concurrent requests for up to `max_wait_ms` (or until `max_batch`) and
executes them as one device call — queries to the same collection share a
single fused-kernel scan.

Latency math: +max_wait_ms p50 cost buys ~Qx throughput under load; with
no concurrency the queue drains immediately after one wait window.
"""

from __future__ import annotations

import threading
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Callable

from ..log import get_logger
from ..metrics import METRICS

logger = get_logger(__name__)


@dataclass
class _Pending:
    item: Any
    future: Future = field(default_factory=Future)


class Microbatcher:
    """Generic batcher: `run_batch(items) -> results` executed on a worker
    thread over batches collected within the wait window."""

    def __init__(self, run_batch: Callable[[list], list], max_batch: int = 32,
                 max_wait_ms: float = 3.0, name: str = "batch"):
        self.run_batch = run_batch
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self.name = name
        self._pending: list[_Pending] = []
        self._lock = threading.Lock()
        self._wake = threading.Condition(self._lock)
        self._shutdown = False
        self._thread = threading.Thread(target=self._loop, name=f"memex-{name}", daemon=True)
        self._thread.start()

    def submit(self, item: Any) -> Future:
        p = _Pending(item)
        with self._lock:
            if self._shutdown:
                raise RuntimeError("batcher is shut down")
            self._pending.append(p)
            self._wake.notify()
        return p.future

    def __call__(self, item: Any, timeout: float = 120.0):
        return self.submit(item).result(timeout=timeout)

    def close(self) -> None:
        with self._lock:
            self._shutdown = True
            self._wake.notify()
        self._thread.join(timeout=5)

    def _loop(self) -> None:
        import time as _time

        while True:
            with self._lock:
                while not self._pending and not self._shutdown:
                    self._wake.wait()
                if self._shutdown and not self._pending:
                    return
                # Collect until the window closes or the batch fills. A
                # single wait() would end on the FIRST notify (one more
                # submit), degenerating steady-load batches to ~2 items;
                # and when a backlog is already >= max_batch there is
                # nothing to wait for at all.
                deadline = _time.monotonic() + self.max_wait
                while (len(self._pending) < self.max_batch
                       and not self._shutdown):
                    remaining = deadline - _time.monotonic()
                    if remaining <= 0:
                        break
                    self._wake.wait(remaining)
                batch = self._pending[: self.max_batch]
                self._pending = self._pending[self.max_batch :]
            METRICS.inc(f"batcher.{self.name}.batches")
            METRICS.inc(f"batcher.{self.name}.items", len(batch))
            try:
                from ..metrics import profile_trace

                with METRICS.timer(f"batcher.{self.name}"), \
                        profile_trace(f"batch.{self.name}"):
                    results = self.run_batch([p.item for p in batch])
                if len(results) != len(batch):
                    raise RuntimeError(
                        f"run_batch returned {len(results)} results for {len(batch)} items"
                    )
                for p, r in zip(batch, results):
                    p.future.set_result(r)
            except Exception as exc:
                logger.exception("batch %s failed", self.name)
                for p in batch:
                    if not p.future.done():
                        p.future.set_exception(exc)


class SearchBatcher:
    """Batches (collection, query_text, limit) search requests: one encoder
    call for all queries in the window, one index scan per collection."""

    def __init__(self, runtime, max_batch: int = 32, max_wait_ms: float = 3.0):
        self.rt = runtime
        self._fused = None
        self._mb = Microbatcher(
            self._run, max_batch=max_batch, max_wait_ms=max_wait_ms, name="search"
        )

    def search(self, collection: str, query: str, limit: int, timeout: float = 120.0):
        return self._mb((collection, query, limit), timeout=timeout)

    def close(self) -> None:
        self._mb.close()

    def _run(self, items: list[tuple[str, str, int]]) -> list:
        import numpy as np

        from ..store.base import SearchHit
        from .query_path import FusedQueryPath

        if self._fused is None:
            self._fused = FusedQueryPath(self.rt.engine)
        # Group by collection; one device call per collection.
        by_col: dict[str, list[int]] = {}
        for i, (col, _, _) in enumerate(items):
            by_col.setdefault(col, []).append(i)
        results: list = [None] * len(items)
        vectors = None
        for col, idxs in by_col.items():
            store = self.rt.store(col)
            max_limit = max(items[i][2] for i in idxs)
            if self._fused.supports(store):
                # Fused path: encode + scan in ONE dispatch, ONE fetch
                # (halves tunnel round-trips vs encode-then-search).
                raw = self._fused.search_texts(
                    store, [items[i][1] for i in idxs], max_limit
                )
                doc_of = getattr(store, "_doc_of", {})
                batch_hits = [
                    [SearchHit(id=sid, score=s, document_id=doc_of.get(sid))
                     for sid, s in hits]
                    for hits in raw
                ]
            else:
                if vectors is None:
                    vectors = self.rt.engine.encode_batch([q for (_, q, _) in items])
                batch_hits = store.search_batch(
                    np.stack([vectors[i] for i in idxs]), max_limit
                )
            for j, i in enumerate(idxs):
                results[i] = batch_hits[j][: items[i][2]]
        return results
