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


class TestTrainLoop:
    def _rt(self, tmp_path):
        from memex_tpu.config import Settings
        from memex_tpu.db import queue
        from memex_tpu.runtime import Runtime
        from memex_tpu.worker import Worker

        from test_encoder import tiny_engine

        settings = Settings.from_env(
            db_uri=f"sqlite://{tmp_path}/t.db", vector_uri="memory://",
            embedding_model="random",
        )
        settings.embedding_dim = 64
        rt = Runtime(settings)
        rt._engine = tiny_engine()
        # long doc -> several overlapping windows -> adjacent-window pairs
        doc = "alpha beta gamma delta epsilon zeta eta theta " * 60
        queue.enqueue(rt.db, "traincol", doc, queue.TaskType.Ingest)
        assert Worker(rt, poll_interval=0.01).drain(timeout=120)
        return rt

    def test_train_checkpoint_resume_export(self, tmp_path):
        import numpy as np

        from memex_tpu.models.minilm import load_params
        from memex_tpu.train import TrainConfig, train_encoder

        rt = self._rt(tmp_path)
        out = str(tmp_path / "ft")
        ckpt = str(tmp_path / "state.npz")
        m1 = train_encoder(
            rt, "traincol", epochs=1, batch_size=8, max_len=32,
            tc=TrainConfig(learning_rate=1e-4), out_dir=out,
            checkpoint_path=ckpt,
        )
        assert m1["pairs"] > 1 and m1["step"] >= 1
        assert np.isfinite(m1["loss"])

        # resume continues the step counter
        m2 = train_encoder(
            rt, "traincol", epochs=1, batch_size=8, max_len=32,
            tc=TrainConfig(learning_rate=1e-4), resume=ckpt,
        )
        assert m2["step"] > m1["step"]

        # exported checkpoint loads through the standard HF path and encodes
        cfg, params = load_params(out)
        assert cfg.hidden_size == 64
        from memex_tpu.embed import EmbeddingEngine

        engine = EmbeddingEngine(model_dir=out, max_seq_length=32)
        v = engine.encode_single("alpha beta gamma")
        assert np.isfinite(v).all() and abs(float(np.linalg.norm(v)) - 1.0) < 1e-3

    def test_export_roundtrip_exact(self, tmp_path):
        import numpy as np

        from memex_tpu.models.minilm import MiniLMConfig, init_params, load_params, save_params

        cfg = MiniLMConfig(vocab_size=300, hidden_size=32, num_layers=2,
                           num_heads=4, intermediate_size=64)
        params = init_params(cfg, seed=3)
        d = str(tmp_path / "rt")
        save_params(d, cfg, params)
        cfg2, params2 = load_params(d)
        assert cfg2.num_layers == 2
        for a, b in zip(jax_leaves(params), jax_leaves(params2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def jax_leaves(tree):
    import jax

    return jax.tree.leaves(tree)
