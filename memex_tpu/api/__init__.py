"""HTTP API server (reference: lib/api warp server).

Route tree parity (lib/api/src/endpoints/mod.rs:27-35):
  GET    /api/health
  POST   /api/collections/{collection}
  DELETE /api/collections/{collection}
  GET    /api/collections/{collection}/search
  GET    /api/tasks/{task_id}
  POST   /api/action/ask
  POST   /api/action/summarize/task
  GET    /api/fetch?url=...
  POST   /api/fetch/parse            (multipart PDF -> text)
"""

from .server import create_app, start

__all__ = ["create_app", "start"]
