"""Mesh construction + sharding helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def local_mesh(axis: str = "shard", n: int | None = None) -> Mesh:
    """1-D mesh over local devices (the common memex topology: one axis,
    used as DP for the encoder and shard-parallel for the index)."""
    devices = jax.devices()
    if n is not None:
        devices = devices[:n]
    return Mesh(np.array(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh, axis: str = "shard") -> NamedSharding:
    """Shard dim 0 (corpus rows / batch) over `axis`, replicate the rest."""
    return NamedSharding(mesh, P(axis, None))
