"""PostgreSQL control-plane backend.

Reference parity: lib/libmemex/src/db/mod.rs:9-28 accepts sqlite AND
postgres URIs (pool 2-10); the postgres claim SQL uses `FOR UPDATE` row
locking (lib/libmemex/src/db/queue.rs:185-200). This adapter gives the
memex_tpu db layer the same dual-backend story: many worker PROCESSES on
many hosts can share one queue — the reference's only multi-node
mechanism — instead of being limited to one shared SQLite file per host.

Driver-agnostic: psycopg (3) > psycopg2 > pg8000, whichever imports (none
is bundled in the hermetic image; deployments install one). The rest of
the db layer speaks the sqlite3 API shape — qmark params, row["col"],
cur.lastrowid, db.transaction() — so this adapter converts:

  - `?` placeholders -> `%s` (all three drivers use format-style);
  - INSERTs gain `RETURNING id` to synthesize `lastrowid`;
  - rows are wrapped for by-name access;
  - sqlite DDL tokens are transformed (AUTOINCREMENT ints -> BIGSERIAL,
    BLOB -> BYTEA) so one migration list serves both dialects.
"""

from __future__ import annotations

import re
import threading

from .migrations import MIGRATIONS


def load_pg_driver():
    """Return (name, module) for the first importable postgres driver, or
    (None, None)."""
    for name in ("psycopg", "psycopg2", "pg8000.dbapi"):
        try:
            mod = __import__(name, fromlist=["connect"])
            return name.split(".")[0], mod
        except ImportError:
            continue
    return None, None


def pg_transform_ddl(sql: str) -> str:
    """sqlite DDL -> postgres DDL for the shared migration list."""
    sql = sql.replace("INTEGER PRIMARY KEY AUTOINCREMENT", "BIGSERIAL PRIMARY KEY")
    sql = sql.replace("BLOB", "BYTEA")
    return sql


_QMARK = re.compile(r"\?")


def _to_format_style(sql: str) -> str:
    # The db layer's SQL never contains a literal '?' outside placeholders.
    return _QMARK.sub("%s", sql)


class PgRow:
    """Minimal sqlite3.Row stand-in: by-name and by-index access."""

    __slots__ = ("_cols", "_vals")

    def __init__(self, cols: list[str], vals: tuple):
        self._cols = cols
        self._vals = vals

    def __getitem__(self, key):
        if isinstance(key, int):
            return self._vals[key]
        return self._vals[self._cols.index(key)]

    def keys(self):
        return list(self._cols)

    def __repr__(self) -> str:  # debugging aid
        return f"PgRow({dict(zip(self._cols, self._vals))})"


class _PgCursorResult:
    """What Database.execute returns: lastrowid/rowcount + wrapped rows."""

    def __init__(self, rows: list[PgRow], lastrowid, rowcount: int):
        self._rows = rows
        self.lastrowid = lastrowid
        self.rowcount = rowcount

    def fetchone(self):
        return self._rows[0] if self._rows else None

    def fetchall(self):
        return list(self._rows)


class PgDatabase:
    """Process-wide postgres handle with the Database interface
    (db/connection.py), backed by a CONNECTION POOL (min 2 / max 10 —
    reference parity: sea-orm pool, lib/libmemex/src/db/mod.rs:9-28).
    Each execute/transaction checks a connection out, so concurrent
    worker threads and API handlers don't serialize on one socket;
    concurrency across PROCESSES comes from postgres itself
    (FOR UPDATE SKIP LOCKED claims), which is the point of this backend."""

    dialect = "postgres"
    POOL_MIN = 2
    POOL_MAX = 10

    def __init__(self, uri: str, pool_min: int | None = None,
                 pool_max: int | None = None):
        name, driver = load_pg_driver()
        if driver is None:
            raise ValueError(
                "postgres URI given but no driver available — install one of "
                "psycopg, psycopg2, pg8000"
            )
        self.path = uri
        self._driver_name = name
        self._driver = driver
        self._uri = uri
        import queue as _q

        self._idle: "_q.LifoQueue" = _q.LifoQueue()
        self._size_lock = threading.Lock()
        self._total = 0
        self._min = pool_min if pool_min is not None else self.POOL_MIN
        self._max = pool_max if pool_max is not None else self.POOL_MAX
        self._closed = False
        for _ in range(self._min):
            self._idle.put(self._connect())

    def _connect(self):
        if self._driver_name == "pg8000":
            from urllib.parse import urlparse

            p = urlparse(self._uri)
            conn = self._driver.connect(
                user=p.username or "postgres",
                password=p.password,
                host=p.hostname or "localhost",
                port=p.port or 5432,
                database=(p.path or "/postgres").lstrip("/") or "postgres",
            )
        else:
            # psycopg / psycopg2 accept libpq conninfo URIs directly.
            conn = self._driver.connect(self._uri)
        with self._size_lock:
            self._total += 1
        return conn

    def _acquire(self):
        import queue as _q

        try:
            return self._idle.get_nowait()
        except _q.Empty:
            pass
        with self._size_lock:
            can_grow = self._total < self._max
        if can_grow:
            return self._connect()
        # At capacity: wait for a checkout to come back.
        return self._idle.get(timeout=60.0)

    def _release(self, conn, broken: bool = False) -> None:
        if broken or self._closed:
            with self._size_lock:
                self._total -= 1
            try:
                conn.close()
            except Exception:
                pass
            return
        self._idle.put(conn)

    # -- low-level helpers -------------------------------------------------

    def _run(self, cur, sql: str, params: tuple):
        sql_s = sql.strip()
        returning_id = False
        if sql_s[:6].upper() == "INSERT" and "RETURNING" not in sql_s.upper():
            sql_s += " RETURNING id"
            returning_id = True
        cur.execute(_to_format_style(sql_s), params)
        rows: list[PgRow] = []
        lastrowid = None
        if cur.description is not None:
            cols = [d[0] for d in cur.description]
            fetched = cur.fetchall()
            if returning_id:
                lastrowid = fetched[0][0] if fetched else None
            else:
                rows = [PgRow(cols, tuple(r)) for r in fetched]
        return _PgCursorResult(rows, lastrowid, cur.rowcount)

    def _with_conn(self, fn):
        conn = self._acquire()
        broken = False
        try:
            cur = conn.cursor()
            try:
                res = fn(cur)
                conn.commit()
                return res
            except Exception:
                try:
                    conn.rollback()
                except Exception:
                    broken = True  # dead socket: drop from the pool
                raise
            finally:
                try:
                    cur.close()
                except Exception:
                    broken = True
        finally:
            self._release(conn, broken=broken)

    def execute(self, sql: str, params: tuple = ()) -> _PgCursorResult:
        return self._with_conn(lambda cur: self._run(cur, sql, params))

    def executemany(self, sql: str, rows: list[tuple]) -> None:
        self._with_conn(
            lambda cur: cur.executemany(_to_format_style(sql), rows))

    def query(self, sql: str, params: tuple = ()) -> list[PgRow]:
        return self.execute(sql, params).fetchall()

    def query_one(self, sql: str, params: tuple = ()) -> PgRow | None:
        return self.execute(sql, params).fetchone()

    class _Txn:
        """Context manager yielding an executor proxy (the sqlite backend
        yields the raw connection; callers only use `.execute`). Holds one
        pooled connection for the transaction's duration."""

        def __init__(self, db: "PgDatabase"):
            self.db = db
            self._conn = None
            self._cur = None

        def __enter__(self):
            self._conn = self.db._acquire()
            self._cur = self._conn.cursor()
            return self

        def execute(self, sql: str, params: tuple = ()) -> _PgCursorResult:
            return self.db._run(self._cur, sql, params)

        def executemany(self, sql: str, rows: list[tuple]) -> None:
            # insert_embeddings batches its per-segment rows through the
            # txn handle; the sqlite txn yields a raw connection that has
            # this natively.
            self._cur.executemany(_to_format_style(sql), rows)

        def __exit__(self, exc_type, exc, tb):
            broken = False
            try:
                self._cur.close()
                if exc_type is None:
                    self._conn.commit()
                else:
                    self._conn.rollback()
            except Exception:
                broken = True
                if exc_type is None:
                    raise
            finally:
                self.db._release(self._conn, broken=broken)
            return False

    def transaction(self) -> "_Txn":
        return PgDatabase._Txn(self)

    def close(self) -> None:
        import queue as _q

        self._closed = True
        while True:
            try:
                conn = self._idle.get_nowait()
            except _q.Empty:
                return
            with self._size_lock:
                self._total -= 1
            try:
                conn.close()
            except Exception:
                pass

    # -- migrations --------------------------------------------------------

    def run_migrations(self) -> None:
        from .connection import utcnow

        conn = self._acquire()
        cur = conn.cursor()
        broken = False
        try:
            cur.execute(
                "CREATE TABLE IF NOT EXISTS schema_migrations ("
                "  name TEXT PRIMARY KEY, applied_at TEXT NOT NULL)"
            )
            conn.commit()
            # Concurrent migrators (several workers booting at once)
            # serialize on an advisory lock instead of racing the DDL.
            cur.execute("SELECT pg_advisory_lock(588231)")
            try:
                cur.execute("SELECT name FROM schema_migrations")
                applied = {r[0] for r in cur.fetchall()}
                for name, statements in MIGRATIONS:
                    if name in applied:
                        continue
                    for stmt in statements:
                        cur.execute(pg_transform_ddl(stmt))
                    cur.execute(
                        "INSERT INTO schema_migrations(name, applied_at)"
                        " VALUES (%s, %s)",
                        (name, utcnow()),
                    )
                    conn.commit()
            finally:
                # A failed migration statement leaves the transaction
                # aborted; unlocking on it would itself raise ("current
                # transaction is aborted") and the session-level advisory
                # lock would ride the pooled connection forever, blocking
                # every other booting process. Roll back first, and if the
                # unlock still fails, poison the connection so _release
                # closes it (dropping the lock with the session).
                conn.rollback()
                try:
                    cur.execute("SELECT pg_advisory_unlock(588231)")
                    conn.commit()
                except Exception:
                    broken = True
        except Exception:
            conn.rollback()
            raise
        finally:
            cur.close()
            self._release(conn, broken=broken)
