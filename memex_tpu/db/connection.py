"""SQLite connection + migrations (postgres lives in db/pg.py).

URI-scheme backend selection mirrors the reference
(lib/libmemex/src/db/mod.rs:9-28): `sqlite://<path>`, `sqlite::memory:`,
or `postgres://...` / `postgresql://...` (requires a postgres driver —
psycopg/psycopg2/pg8000 — to be installed; none is bundled here).

Migrations are an ordered list applied inside one transaction each and
recorded in `schema_migrations`, mirroring the reference's migration crate
(migration/src/lib.rs:10-20).
"""

from __future__ import annotations

import datetime as _dt
import sqlite3
import threading

from .migrations import MIGRATIONS


def utcnow() -> str:
    """ISO-8601 UTC timestamp with Z suffix (serde-chrono compatible)."""
    return _dt.datetime.now(_dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.%fZ")


class Database:
    """A process-wide SQLite handle.

    A single connection guarded by an RLock: the SQL layer is the control
    plane (enqueue/claim/hydrate), not the data plane, so serialized access
    is simpler and plenty fast; WAL mode keeps readers cheap.
    """

    dialect = "sqlite"

    def __init__(self, path: str):
        self.path = path
        self._lock = threading.RLock()
        self._conn = sqlite3.connect(path, check_same_thread=False)
        self._conn.row_factory = sqlite3.Row
        with self._lock:
            if path != ":memory:":
                self._conn.execute("PRAGMA journal_mode=WAL")
            self._conn.execute("PRAGMA busy_timeout=5000")
            self._conn.execute("PRAGMA foreign_keys=ON")

    # -- low-level helpers -------------------------------------------------
    def execute(self, sql: str, params: tuple = ()) -> sqlite3.Cursor:
        with self._lock:
            cur = self._conn.execute(sql, params)
            self._conn.commit()
            return cur

    def executemany(self, sql: str, rows: list[tuple]) -> None:
        with self._lock:
            self._conn.executemany(sql, rows)
            self._conn.commit()

    def query(self, sql: str, params: tuple = ()) -> list[sqlite3.Row]:
        with self._lock:
            return self._conn.execute(sql, params).fetchall()

    def query_one(self, sql: str, params: tuple = ()) -> sqlite3.Row | None:
        with self._lock:
            return self._conn.execute(sql, params).fetchone()

    class _Txn:
        def __init__(self, db: "Database"):
            self.db = db

        def __enter__(self):
            self.db._lock.acquire()
            return self.db._conn

        def __exit__(self, exc_type, exc, tb):
            try:
                if exc_type is None:
                    self.db._conn.commit()
                else:
                    self.db._conn.rollback()
            finally:
                self.db._lock.release()
            return False

    def transaction(self) -> "_Txn":
        """Context manager yielding the raw connection under the lock;
        commits on success, rolls back on error (mirrors sea-orm txn usage
        in lib/worker/src/tasks.rs:31-64)."""
        return Database._Txn(self)

    def close(self) -> None:
        with self._lock:
            self._conn.close()

    # -- migrations --------------------------------------------------------
    def run_migrations(self) -> None:
        with self._lock:
            self._conn.execute(
                "CREATE TABLE IF NOT EXISTS schema_migrations ("
                "  name TEXT PRIMARY KEY, applied_at TEXT NOT NULL)"
            )
            applied = {
                r["name"] for r in self._conn.execute("SELECT name FROM schema_migrations")
            }
            for name, statements in MIGRATIONS:
                if name in applied:
                    continue
                for stmt in statements:
                    self._conn.execute(stmt)
                self._conn.execute(
                    "INSERT INTO schema_migrations(name, applied_at) VALUES (?, ?)",
                    (name, utcnow()),
                )
                self._conn.commit()


def create_connection_by_uri(uri: str, run_migrations: bool = True) -> Database:
    """Open a database by connection URI (reference db/mod.rs:9-28)."""
    if uri in ("sqlite::memory:", "sqlite://:memory:"):
        path = ":memory:"
    elif uri.startswith("sqlite://"):
        path = uri[len("sqlite://") :]
    elif uri.startswith("sqlite:"):
        path = uri[len("sqlite:") :]
    elif uri.startswith(("postgres://", "postgresql://")):
        from .pg import PgDatabase

        pdb = PgDatabase(uri)
        if run_migrations:
            pdb.run_migrations()
        return pdb
    else:
        raise ValueError(f"Unsupported database URI: {uri}")
    db = Database(path)
    if run_migrations:
        db.run_migrations()
    return db
