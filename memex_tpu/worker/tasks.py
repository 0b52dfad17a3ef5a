"""Task executors.

Reference: lib/worker/src/tasks.rs — process_embeddings (:9-66) and
generate_summary (:68-89). Each executor takes the shared runtime and a
claimed Task and returns the value to store in `task_output` (or None).
"""

from __future__ import annotations

import json
import time

from ..db import models, queue
from ..log import get_logger
from ..runtime import Runtime
from ..store.base import VectorData

logger = get_logger(__name__)


def process_ingest(rt: Runtime, task: queue.Task) -> None:
    """Ingest pipeline (tasks.rs:9-66): segment+embed -> documents row ->
    embeddings rows (one txn) -> vector store add."""
    t0 = time.perf_counter()
    segments, vectors = rt.encode_doc(task.content)  # microbatched encode
    embed_ms = (time.perf_counter() - t0) * 1000
    logger.info(
        "task %d: generated %d embeddings in %.1fms", task.id, len(segments), embed_ms
    )

    # Resolve the store FIRST: first touch may rebuild the device index from
    # SQL, and that rebuild must not see this task's rows (it would duplicate
    # every vector once add_vectors also ran).
    store = rt.store(task.collection)

    doc = models.insert_document_from_task(rt.db, task)
    seg_uuids = models.insert_embeddings(rt.db, doc.uuid, task.collection, segments, vectors)

    rt.add_vectors(
        task.collection,
        [
            VectorData(
                id=seg_uuids[i],
                document_id=doc.uuid,
                text=segments[i],
                vector=vectors[i],
                segment_id=i,
            )
            for i in range(len(segments))
        ],
    )
    # Periodic, not per-task: SQL is the durable source of truth and
    # recovery.py rebuilds; a per-task checkpoint would re-introduce the
    # reference's save-everything-per-insert cost (local.rs:62-69).
    # Best-effort: the ingest is already durable (SQL committed, store
    # written) — a checkpoint failure (disk full, transient FS error) must
    # not fail the task and burn retries on committed work.
    try:
        rt.maybe_checkpoint(task.collection, store)
    except Exception:
        logger.exception("task %d: checkpoint failed (ingest unaffected)", task.id)


def process_maintain(rt: Runtime, task: queue.Task):
    """Index maintenance executor (new vs reference): fold the spill /
    retrain partitions OFF the query path. Scheduled by the stores'
    request_maintenance() (search shortfalls, spill growth, delete churn);
    the query that hit the condition already returned via a bounded
    fallback, this task restores the fast path."""
    store = rt.store(task.collection)
    rebuild = getattr(store, "rebuild", None)
    if rebuild is None:
        logger.info("task %d: store for %r has no maintenance surface",
                    task.id, task.collection)
        return {"rebuilt": False}
    t0 = time.perf_counter()
    rebuild()
    logger.info("task %d: maintained %r (%d rows) in %.0fms", task.id,
                task.collection, store.count, (time.perf_counter() - t0) * 1e3)
    return {"rebuilt": True, "count": store.count}


def process_summarize(rt: Runtime, task: queue.Task):
    """Map-reduce summarize (tasks.rs:68-89): budget-split the text, LLM
    summarize each chunk, concatenate the bullet summaries."""
    llm = rt.llm
    from ..llm import prompter

    chunks, model = llm.segment_text(task.content)
    summaries: list[str] = []
    for i, chunk in enumerate(chunks):
        t0 = time.perf_counter()
        result = llm.chat_completion(model, prompter.summarize(chunk))
        logger.info(
            "task %d: summarized segment %d/%d in %.1fms",
            task.id, i + 1, len(chunks), (time.perf_counter() - t0) * 1000,
        )
        summaries.append(result.strip())
    return {"summary": "\n".join(summaries)}


def process_extract(rt: Runtime, task: queue.Task):
    """Extract executor. The reference declares LLMExtract but never
    implements it (lib/worker/src/lib.rs:203-208 fetches the task and does
    nothing); here the task payload carries {text, query, jsonSchema?} and
    runs the same flow as the synchronous /api/action/ask."""
    llm = rt.llm
    from ..llm import prompter

    try:
        payload = json.loads(task.content)
    except json.JSONDecodeError:
        payload = None
    if not isinstance(payload, dict):
        # Valid non-object JSON (bare number/string/array) is plain text
        # too — only a JSON OBJECT carries the {text, query, jsonSchema}
        # payload shape.
        payload = {"text": task.content, "query": "Extract the key facts."}
    text = payload.get("text", "")
    user_query = payload.get("query", "")
    json_schema = payload.get("jsonSchema")
    content, model = llm.truncate_text(text)
    if json_schema is not None:
        prompt = prompter.json_schema_extraction(content, user_query, json_schema)
    else:
        prompt = prompter.quick_question(f"{user_query}\n\nContent:\n{content}")
    response = llm.chat_completion(model, prompt)
    try:
        return {"jsonResponse": json.loads(response)}
    except json.JSONDecodeError:
        return {"response": response}
