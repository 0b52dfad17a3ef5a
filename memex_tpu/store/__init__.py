"""Pluggable vector storage.

Parity with the reference VectorStore trait + URI-scheme factory
(lib/libmemex/src/storage/mod.rs:54-66, 95-139), redesigned around
process-resident indexes:

  - `tpu://<dir>`      device-resident FlatIndex per collection (default)
  - `tpu+ivf://<dir>`  IVF-tier index per collection
  - `tpu+mesh://<dir>` mesh-sharded flat index (set mesh via runtime)
  - `hnsw://<dir>`     native C++ HNSW store (CPU parity/oracle backend)
  - `memory://`        plain numpy store (hermetic tests)

Unlike the reference — which constructs a store, loads the whole index from
disk per request, and drops it (storage/mod.rs:107-121) — the factory here
returns live handles from a process-wide registry; persistence is explicit
checkpointing plus SQL as the source of truth (SURVEY.md §5).
"""

from .base import VectorData, VectorStore, SearchHit
from .registry import get_vector_storage, StoreRegistry

__all__ = [
    "VectorData",
    "VectorStore",
    "SearchHit",
    "get_vector_storage",
    "StoreRegistry",
]
