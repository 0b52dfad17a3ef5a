"""Background worker: scheduler + task executors.

Reference: lib/worker — 100ms poll loop with a 5-concurrent-job cap
(lib/worker/src/lib.rs:118-166, :27-45), executors for Ingest/Summarize/
Extract (:168-247), per-job timing + mark_done/mark_failed (:249-273).

Differences by design:
  - the embedding engine is shared and persistent (the reference reloads
    the model per job, tasks.rs:17 — its ingest hot spot);
  - expired-lease reaping returns orphaned Processing tasks to the queue
    (the reference never reaps — SURVEY.md §5 failure-detection gap);
  - Extract tasks actually execute (the reference stubs them,
    lib/worker/src/lib.rs:203-208).
"""

from .loop import Worker, start

__all__ = ["Worker", "start"]
