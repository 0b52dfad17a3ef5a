"""Device->host fetch that overlaps transfers.

Through the remote-TPU tunnel every blocking host fetch pays a ~30ms RPC
round-trip; fetching a jit call's outputs one `np.asarray` at a time pays
it once PER ARRAY (measured: the serving path's (vals, rows) pair doubled
query p50 from ~31ms to ~58ms). `fetch` starts non-blocking
copy_to_host_async transfers for every array first, then materializes
them — all transfers ride one round-trip window.

Parity note: the reference has no device, so its analogue is simply "don't
do N+1 fetches" (it makes the same class of mistake with SQL hydration,
lib/api/src/endpoints/collections/handlers.rs:87-102).
"""

from __future__ import annotations

import numpy as np


def fetch(*arrays) -> tuple[np.ndarray, ...]:
    """Fetch device arrays to host numpy, overlapping the transfers."""
    for a in arrays:
        if hasattr(a, "copy_to_host_async"):
            a.copy_to_host_async()
    return tuple(np.asarray(a) for a in arrays)
