"""Golden parity for the Llama loader/forward against HF transformers.

Same method as test_golden_parity.py: build a seeded LlamaForCausalLM in
torch, export the real HF checkpoint format, load through
llm/local/model.load_params, and require logits/next-token parity. Any
transpose, RoPE, GQA-repeat, or norm bug fails here; real Llama-family
checkpoints load through the identical path.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from memex_tpu.llm.local.model import LlamaConfig, forward, init_cache, load_params


@pytest.fixture(scope="module")
def hf_llama(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf_llama")
    cfg = transformers.LlamaConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=176,
        num_hidden_layers=3,
        num_attention_heads=8,
        num_key_value_heads=4,   # GQA
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval()
    model.save_pretrained(str(d), safe_serialization=True)
    # save_pretrained writes config.json; our loader reads the same file
    with open(os.path.join(d, "config.json")) as fh:
        assert json.load(fh)["num_key_value_heads"] == 4
    return str(d), model


def test_forward_logits_match_hf(hf_llama):
    model_dir, hf = hf_llama
    cfg, params = load_params(model_dir)
    cfg = LlamaConfig(**{**cfg.__dict__, "compute_dtype": "float32"})
    assert cfg.num_kv_heads == 4 and cfg.num_layers == 3

    rng = np.random.default_rng(0)
    T = 12
    ids = rng.integers(3, 250, size=(1, T)).astype(np.int32)
    with torch.no_grad():
        golden = hf(input_ids=torch.tensor(ids, dtype=torch.long)).logits.numpy()

    import jax.numpy as jnp

    cache = init_cache(cfg, batch=1)
    positions = jnp.arange(T)[None, :]
    logits, _ = forward(cfg, params, jnp.asarray(ids), positions, cache, 0)
    logits = np.asarray(logits)

    assert logits.shape == golden.shape
    # same argmax everywhere + tight numeric agreement
    assert np.array_equal(logits.argmax(-1), golden.argmax(-1))
    np.testing.assert_allclose(logits, golden, atol=2e-3, rtol=2e-3)


def test_incremental_decode_matches_full_forward(hf_llama):
    """KV-cached step-by-step decode == one full forward (cache math)."""
    model_dir, _ = hf_llama
    cfg, params = load_params(model_dir)
    cfg = LlamaConfig(**{**cfg.__dict__, "compute_dtype": "float32"})

    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    T = 10
    ids = rng.integers(3, 250, size=(1, T)).astype(np.int32)
    cache = init_cache(cfg, batch=1)
    full_logits, _ = forward(
        cfg, params, jnp.asarray(ids), jnp.arange(T)[None, :], cache, 0
    )

    cache = init_cache(cfg, batch=1)
    step_logits = []
    for t in range(T):
        lg, cache = forward(
            cfg, params, jnp.asarray(ids[:, t : t + 1]),
            jnp.asarray([[t]]), cache, t,
        )
        step_logits.append(np.asarray(lg)[0, 0])
    np.testing.assert_allclose(
        np.asarray(full_logits)[0], np.stack(step_logits), atol=1e-4, rtol=1e-4
    )
