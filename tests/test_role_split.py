"""Two-PROCESS role split: a real `memex_tpu serve --roles Worker`
subprocess drains tasks enqueued by this process through the shared SQL
queue — the reference's only distribution mechanism (bin/memex/src/
main.rs:113-130: Api and Worker share no memory, only the DB)."""

import os
import subprocess
import sys
import time

from memex_tpu.config import Settings
from memex_tpu.db import queue
from memex_tpu.runtime import Runtime

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_worker_subprocess_drains_queue(tmp_path):
    db_uri = f"sqlite://{tmp_path}/split.db"
    settings = Settings.from_env(db_uri=db_uri, vector_uri=f"tpu://{tmp_path}/vec")
    settings.embedding_dim = 64
    rt = Runtime(settings)  # the "API" side: enqueue only
    task = queue.enqueue(rt.db, "splitcol", "one two three four five", queue.TaskType.Ingest)

    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        DATABASE_CONNECTION=db_uri,
        VECTOR_CONNECTION=f"tpu://{tmp_path}/vec",
        EMBEDDING_MODEL="random",
        PYTHONPATH=REPO,
    )
    proc = subprocess.Popen(
        [sys.executable, "-m", "memex_tpu", "serve", "--roles", "Worker"],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        deadline = time.monotonic() + 240
        status = None
        while time.monotonic() < deadline:
            row = queue.get_task(rt.db, task.id)
            status = row.status.value if row else None
            if status in ("Completed", "Failed"):
                break
            time.sleep(0.5)
        assert status == "Completed", status
        # the worker's device index checkpointed? SQL rows are the source
        # of truth either way:
        n = rt.db.query_one(
            "SELECT COUNT(*) AS n FROM embeddings WHERE collection='splitcol'"
        )["n"]
        assert n >= 1
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
