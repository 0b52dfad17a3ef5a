"""Contrastive fine-tune tests: loss decreases; DP-sharded step == single."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from memex_tpu.models.minilm import MiniLMConfig, init_params
from memex_tpu.train import TrainConfig, init_train_state, make_train_step


def tiny_cfg():
    return MiniLMConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, compute_dtype="float32",
    )


def make_batch(rng, b, l=16):
    return {
        "q_ids": jnp.asarray(rng.integers(5, 128, (b, l)), jnp.int32),
        "q_mask": jnp.ones((b, l), jnp.int32),
        "d_ids": jnp.asarray(rng.integers(5, 128, (b, l)), jnp.int32),
        "d_mask": jnp.ones((b, l), jnp.int32),
    }


def test_loss_decreases():
    cfg, tc = tiny_cfg(), TrainConfig(learning_rate=1e-3)
    params = init_params(cfg, seed=0)
    state = init_train_state(cfg, params, tc)
    step = jax.jit(make_train_step(cfg, tc))
    rng = np.random.default_rng(0)
    batch = make_batch(rng, 8)
    _, m0 = step(state, batch)
    for _ in range(10):
        state, metrics = step(state, batch)
    assert float(metrics["loss"]) < float(m0["loss"])
    assert float(metrics["accuracy"]) >= float(m0["accuracy"])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_sharded_step_matches_single():
    cfg, tc = tiny_cfg(), TrainConfig(learning_rate=1e-3)
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(1)
    batch = make_batch(rng, 16)

    state1 = init_train_state(cfg, params, tc)
    step1 = jax.jit(make_train_step(cfg, tc))
    state1, m1 = step1(state1, batch)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data", None))
    state2 = jax.device_put(init_train_state(cfg, params, tc), rep)
    batch_dp = jax.device_put(batch, dp)
    step2 = jax.jit(
        make_train_step(cfg, tc),
        in_shardings=(rep, dp),
        out_shardings=(rep, rep),
    )
    state2, m2 = step2(state2, batch_dp)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), atol=1e-5)
    l1 = np.asarray(state1["params"]["layers"][0]["q_w"])
    l2 = np.asarray(state2["params"]["layers"][0]["q_w"])
    np.testing.assert_allclose(l1, l2, atol=1e-5)
