"""Host-side persistence: SQLite metadata + task queue.

Rebuilds the reference's db layer (lib/libmemex/src/db/, migration/) on
stdlib sqlite3. The queue keeps the reference's atomic-claim semantics
(lib/libmemex/src/db/queue.rs:167-206) and retry policy (MAX_RETRIES=5,
queue.rs:7,114-130), and adds a lease timeout so tasks stuck in Processing
after a crash are reaped (a gap in the reference — SURVEY.md §5).
"""

from .connection import Database, create_connection_by_uri
from . import queue, models

__all__ = ["Database", "create_connection_by_uri", "queue", "models"]
