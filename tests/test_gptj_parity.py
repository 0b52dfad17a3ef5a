"""GPT-J golden parity vs HF transformers + end-to-end generation.

The reference's local LLM supports two GGML families, llama and gptj
(lib/libmemex/src/llm/local/schema.rs); gptj.py is the second family here.
Same method as the Llama/MiniLM golden tests: seeded GPTJForCausalLM in
torch, exported HF checkpoint, loaded through our loader, logits compared.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from memex_tpu.llm.local.gptj import GptJConfig, forward, init_params, load_params
from memex_tpu.llm.local.model import init_cache


@pytest.fixture(scope="module")
def hf_gptj(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf_gptj")
    cfg = transformers.GPTJConfig(
        vocab_size=256,
        n_positions=128,
        n_embd=64,
        n_layer=3,
        n_head=4,
        rotary_dim=8,
        n_inner=176,
        activation_function="gelu_new",
        layer_norm_epsilon=1e-5,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.GPTJForCausalLM(cfg).eval()
    model.save_pretrained(str(d), safe_serialization=True)
    return str(d), model


def test_forward_logits_match_hf(hf_gptj):
    model_dir, hf = hf_gptj
    cfg, params = load_params(model_dir)
    cfg = GptJConfig(**{**cfg.__dict__, "compute_dtype": "float32"})
    assert cfg.rotary_dim == 8 and cfg.num_layers == 3

    rng = np.random.default_rng(0)
    T = 12
    ids = rng.integers(3, 250, size=(1, T)).astype(np.int32)
    with torch.no_grad():
        golden = hf(input_ids=torch.tensor(ids, dtype=torch.long)).logits.numpy()

    import jax.numpy as jnp

    cache = init_cache(cfg, batch=1)
    logits, _ = forward(cfg, params, jnp.asarray(ids), jnp.arange(T)[None, :], cache, 0)
    logits = np.asarray(logits)
    assert logits.shape == golden.shape
    assert np.array_equal(logits.argmax(-1), golden.argmax(-1))
    np.testing.assert_allclose(logits, golden, atol=2e-3, rtol=2e-3)


def test_incremental_decode_matches_full_forward(hf_gptj):
    model_dir, _ = hf_gptj
    cfg, params = load_params(model_dir)
    cfg = GptJConfig(**{**cfg.__dict__, "compute_dtype": "float32"})

    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    T = 9
    ids = rng.integers(3, 250, size=(1, T)).astype(np.int32)
    cache = init_cache(cfg, batch=1)
    full, _ = forward(cfg, params, jnp.asarray(ids), jnp.arange(T)[None, :], cache, 0)

    cache = init_cache(cfg, batch=1)
    steps = []
    for t in range(T):
        lg, cache = forward(cfg, params, jnp.asarray(ids[:, t : t + 1]),
                            jnp.asarray([[t]]), cache, t)
        steps.append(np.asarray(lg)[0, 0])
    np.testing.assert_allclose(np.asarray(full)[0], np.stack(steps),
                               atol=1e-4, rtol=1e-4)


class TestGptJGeneration:
    def test_generates_and_streams(self):
        from memex_tpu.llm.base import ChatMessage, ChatRole
        from memex_tpu.llm.local import LocalLLM

        llm = LocalLLM.tiny_gptj(seed=2)
        pieces = []
        out = llm.chat_completion(
            "tiny-gptj", [ChatMessage(ChatRole.User, "hello")],
            on_token=pieces.append, max_new=12,
        )
        assert isinstance(out, str)
        assert "".join(pieces) == out

    def test_from_toml_config(self, tmp_path):
        from memex_tpu.llm.local import LocalLLM

        cfg_path = tmp_path / "gptj.toml"
        cfg_path.write_text('[model]\npath = "tiny-gptj"\ntype = "gptj"\n')
        llm = LocalLLM.from_config(str(cfg_path))
        assert llm.cfg.model_family == "gptj"
