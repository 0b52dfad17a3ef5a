"""Persistent XLA compile-cache policy, shared by serve/bench/entry.

Pallas compiles through the remote-TPU tunnel cost 3-5 minutes each;
cached reruns load in seconds (verified on the axon v5e). TPU-only: on
the CPU backend, XLA AOT entries can reload with machine-feature
mismatches ("prefer-no-gather is not supported on the host machine")
that silently degrade every cached op ~20x with SIGILL risk — so the
cache is NEVER enabled when default_backend() is cpu. One implementation
so the policy cannot drift between call sites.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = "/root/.cache/jaxpc"


def enable_compile_cache() -> bool:
    """Configure the persistent cache (no-op on the CPU backend).
    Returns True when enabled. Safe to call repeatedly."""
    import jax

    if jax.default_backend() == "cpu":
        return False
    cache = os.environ.get("JAX_COMPILE_CACHE", DEFAULT_CACHE_DIR)
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        return True
    except Exception:
        return False
