"""Structured logging setup.

Reference uses tracing-subscriber with per-crate env-filter directives and
span-close timing events (bin/memex/src/main.rs:54-71). Here: stdlib logging
with an env-filter-style `MEMEX_LOG` variable ("memex_tpu=DEBUG,jax=WARN")
plus a timing helper used by API handlers and the worker.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

_FORMAT = "%(asctime)s %(levelname)s %(name)s: %(message)s"
_configured = False


def init_logging(default_level: str = "INFO") -> None:
    global _configured
    if _configured:
        return
    _configured = True
    logging.basicConfig(level=getattr(logging, default_level, logging.INFO), format=_FORMAT)
    spec = os.environ.get("MEMEX_LOG", "")
    for directive in spec.split(","):
        directive = directive.strip()
        if not directive:
            continue
        if "=" in directive:
            name, _, lvl = directive.partition("=")
            logging.getLogger(name.strip()).setLevel(getattr(logging, lvl.strip().upper(), logging.INFO))
        else:
            logging.getLogger().setLevel(getattr(logging, directive.upper(), logging.INFO))


def get_logger(name: str) -> logging.Logger:
    return logging.getLogger(name)


@contextlib.contextmanager
def timed(logger: logging.Logger, msg: str, *args):
    """Log wall-time of a block, like the reference's per-job timing
    (lib/worker/src/lib.rs:259-266)."""
    start = time.perf_counter()
    try:
        yield
    finally:
        elapsed_ms = (time.perf_counter() - start) * 1000.0
        logger.info(msg + " finished in %.1fms", *args, elapsed_ms)
