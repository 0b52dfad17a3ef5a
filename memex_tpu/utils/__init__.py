"""Shared utilities (logging, metrics, config re-exports)."""

from ..config import Settings, load_dotenv
from ..log import get_logger, init_logging, timed
from ..metrics import METRICS, profile_trace

__all__ = [
    "Settings",
    "load_dotenv",
    "get_logger",
    "init_logging",
    "timed",
    "METRICS",
    "profile_trace",
]
