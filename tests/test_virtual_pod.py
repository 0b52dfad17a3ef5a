"""Virtual-pod end-to-end rehearsal (round-2 verdict item 8).

The tiny-shape sharded tests prove semantics; this proves the 100M-tier
LIFECYCLE at a few-GB geometry on the 8-device virtual CPU mesh — the
shapes where SPMD layout mistakes (replicated materialization, eager
scatter blowups) and fetch-path regressions actually surface:

  build_device (2M int8 rows) -> search -> streaming add -> fold_spill ->
  incremental save -> restore into a fresh index -> search equivalence.

Marked slow (minutes on one CPU core): excluded from the default run,
executed explicitly via `pytest -m slow`.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

N = 2 << 20          # 2M rows — ~800MB codes + ~1GB bucket table
D = 384
C = 512
QN = 8


@pytest.fixture(scope="module")
def mesh():
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), ("shard",))


def _hits_map(out):
    return [{sid: round(v, 5) for sid, v in row} for row in out]


def test_pod_lifecycle_2m(mesh, tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from memex_tpu.index.sharded_ivf import ShardedIVFIndex

    rng = np.random.default_rng(0)
    # int8 codes directly (no 3GB f32 corpus on the host): the lifecycle
    # under test is layout/packing/persistence, not recall.
    codes = rng.integers(-127, 128, size=(N, D), dtype=np.int8)
    scales = (rng.random(N, dtype=np.float32) * 0.005 + 0.005)

    idx = ShardedIVFIndex(dim=D, mesh=mesh, n_clusters=C, nprobe=16,
                          bucket_factor=1.2, use_fused=False)
    idx.build_device(
        jax.device_put(jnp.asarray(codes), idx._row_sh),
        jax.device_put(jnp.asarray(scales), idx._vec_sh),
        [f"r{i}" for i in range(N)],
    )
    assert idx.count == N
    assert idx.data.shape[0] == C and idx.data.shape[2] == D
    # Sharded layout really is sharded: per-device bytes ~= total/8.
    shard_bytes = [
        np.prod(s.data.shape) for s in idx.data.addressable_shards
    ]
    assert len(shard_bytes) == 8
    assert max(shard_bytes) <= idx.data.size // 8

    qs = rng.standard_normal((QN, D)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    out1 = idx.search(qs, 10)
    assert all(len(r) == 10 for r in out1)

    # Streaming adds -> sharded spill -> fold back into the partitions.
    extra = rng.standard_normal((4096, D)).astype(np.float32)
    extra /= np.linalg.norm(extra, axis=1, keepdims=True)
    idx.add(extra, [f"s{i}" for i in range(4096)])
    assert idx.spill.count == 4096
    out2 = idx.search(qs, 10)
    assert all(len(r) == 10 for r in out2)
    folded = idx.fold_spill()
    assert folded > 0
    assert idx.count == N + 4096

    # Deletes + the bounded shortfall machinery stay consistent at scale.
    victims = [f"r{i}" for i in range(0, 1024)]
    assert idx.delete(victims) == 1024
    out3 = idx.search(qs, 10)
    assert all(len(r) == 10 for r in out3)
    assert all(sid not in set(victims) for row in out3 for sid, _ in row)

    # Incremental checkpoint -> restore -> search equivalence.
    ck = str(tmp_path_factory.mktemp("pod") / "pod.sivf")
    idx.save(ck)
    fresh = ShardedIVFIndex(dim=D, mesh=mesh, n_clusters=C, nprobe=16,
                            bucket_factor=1.2, use_fused=False)
    n_restored = fresh.restore(ck)
    assert n_restored == idx.count
    out4 = fresh.search(qs, 10)
    assert _hits_map(out4) == _hits_map(idx.search(qs, 10))
