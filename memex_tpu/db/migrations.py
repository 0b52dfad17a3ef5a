"""Ordered schema migrations.

Shape-parity with the reference's 4 migrations (migration/src/lib.rs:12-19):
queue + documents, embeddings (+FK indices), task_type column, task_output
column — collapsed here into explicit CREATEs plus additive migrations for
the new columns this framework introduces (lease_expires_at for crash
recovery; vector stored as a float32 BLOB + dim instead of JSON for
efficiency, see lib/libmemex/src/db/embedding.rs:22 for the reference's
JSON-blob approach).
"""

MIGRATIONS: list[tuple[str, list[str]]] = [
    (
        "m0001_create_queue_and_documents",
        [
            """
            CREATE TABLE IF NOT EXISTS queue (
                id INTEGER PRIMARY KEY AUTOINCREMENT,
                collection TEXT NOT NULL,
                payload TEXT NOT NULL,            -- JSON {"content": ...}
                task_output TEXT,                 -- JSON
                task_type TEXT NOT NULL,          -- Ingest | Extract | Summarize
                status TEXT NOT NULL DEFAULT 'Queued',
                error TEXT,                       -- JSON {"error_type","msg"}
                num_retries INTEGER NOT NULL DEFAULT 0,
                created_at TEXT NOT NULL,
                updated_at TEXT NOT NULL
            )
            """,
            "CREATE INDEX IF NOT EXISTS idx_queue_status ON queue(status, created_at)",
            """
            CREATE TABLE IF NOT EXISTS documents (
                id INTEGER PRIMARY KEY AUTOINCREMENT,
                uuid TEXT NOT NULL UNIQUE,
                task_id INTEGER NOT NULL,
                content TEXT NOT NULL,
                metadata TEXT,
                created_at TEXT NOT NULL,
                updated_at TEXT NOT NULL
            )
            """,
            "CREATE INDEX IF NOT EXISTS idx_documents_task ON documents(task_id)",
        ],
    ),
    (
        "m0002_create_embeddings",
        [
            """
            CREATE TABLE IF NOT EXISTS embeddings (
                id INTEGER PRIMARY KEY AUTOINCREMENT,
                document_id TEXT NOT NULL,
                uuid TEXT NOT NULL,
                segment INTEGER NOT NULL,
                content TEXT NOT NULL,
                vector BLOB NOT NULL,             -- little-endian float32
                dim INTEGER NOT NULL,
                metadata TEXT,
                created_at TEXT NOT NULL,
                updated_at TEXT NOT NULL
            )
            """,
            "CREATE INDEX IF NOT EXISTS idx_embeddings_uuid ON embeddings(uuid)",
            "CREATE INDEX IF NOT EXISTS idx_embeddings_document ON embeddings(document_id)",
        ],
    ),
    (
        "m0003_add_task_lease",
        [
            # New vs reference: lease expiry lets a restarted worker reclaim
            # tasks orphaned in 'Processing' (SURVEY.md §5 failure-detection gap).
            "ALTER TABLE queue ADD COLUMN lease_expires_at TEXT",
        ],
    ),
    (
        "m0004_add_collection_to_embeddings",
        [
            # Collection tag so a device index can be rebuilt from SQL
            # (checkpoint/resume story, SURVEY.md §5).
            "ALTER TABLE embeddings ADD COLUMN collection TEXT NOT NULL DEFAULT ''",
            "CREATE INDEX IF NOT EXISTS idx_embeddings_collection ON embeddings(collection)",
        ],
    ),
]
