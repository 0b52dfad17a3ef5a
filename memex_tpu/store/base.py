"""VectorStore protocol + data types.

Reference: trait VectorStore {delete, delete_all, bulk_insert, insert,
search} and VectorData{_id, document_id, text, vector, segment_id}
(lib/libmemex/src/storage/mod.rs:16-28, 54-66).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Protocol, runtime_checkable

import numpy as np


@dataclass
class VectorData:
    id: str
    document_id: str
    text: str
    vector: np.ndarray
    segment_id: int = 0


@dataclass
class SearchHit:
    id: str
    score: float
    document_id: str | None = None
    text: str | None = None
    metadata: dict = field(default_factory=dict)


@runtime_checkable
class VectorStore(Protocol):
    """All mutation is batched; single insert is bulk of one."""

    def add_vectors(self, data: list[VectorData]) -> None: ...

    def search(self, vector: np.ndarray, limit: int) -> list[SearchHit]: ...

    def search_batch(self, vectors: np.ndarray, limit: int) -> list[list[SearchHit]]: ...

    def delete(self, ids: list[str]) -> int: ...

    def delete_all(self) -> None: ...

    def checkpoint(self) -> None: ...

    @property
    def count(self) -> int: ...
