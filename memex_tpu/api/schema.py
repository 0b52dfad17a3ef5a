"""API response/request shapes.

JSON field names match the reference exactly so clients can switch without
changes (lib/api/src/schema.rs):
  ApiResponse: {"time": f32 seconds, "status": "ok"|"error", "result": ...}
  TaskResult (camelCase): {"taskId", "collection", "status", "createdAt",
                           "result"?}
  SearchResult: {"results": [{"_id", "document_id", "segment", "content",
                              "score"}]}  (snake_case per DocumentSegment)
  ErrorMessage: {"code", "message"}
"""

from __future__ import annotations

import time
from typing import Any

from ..db.queue import Task

DEFAULT_SEARCH_LIMIT = 10  # reference schema.rs:27-30
MAX_SEARCH_LIMIT = 100     # request validation (reference passes limit raw)


def api_response(start_time: float, result: Any) -> dict:
    return {
        "time": round(time.perf_counter() - start_time, 6),
        "status": "ok",
        "result": result,
    }


def api_error(code: int, message: str) -> dict:
    return {
        "time": 0.0,
        "status": "error",
        "result": {"code": code, "message": message},
    }


def task_result(task: Task) -> dict:
    out = {
        "taskId": task.id,
        "collection": task.collection,
        "status": task.status.value,
        "createdAt": task.created_at,
    }
    if task.task_output is not None:
        out["result"] = task.task_output
    return out


def document_segment(seg_id: str, document_id: str, segment: int, content: str, score: float) -> dict:
    return {
        "_id": seg_id,
        "document_id": document_id,
        "segment": segment,
        "content": content,
        "score": score,
    }
