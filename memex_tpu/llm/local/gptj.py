"""GPT-J family decoder — the reference's second local-LLM family
(lib/libmemex/src/llm/local/schema.rs model_type llama|gptj; the llm crate
loads either GGML architecture).

Architecture differences vs Llama (model.py):
  - LayerNorm (with bias) instead of RMSNorm; ONE ln per block;
  - parallel residual: x += attn(ln(x)) + mlp(ln(x));
  - rotary on the first `rotary_dim` head dims only, with the GPT-J
    "rotate every two" (interleaved) convention — NOT Llama's half-split;
  - MHA (no GQA), no qkv/out biases, mlp fc biases, gelu_new (tanh);
  - lm_head has a bias.

Same layer-stacked param layout and scanned forward as model.py, and the
same (cache, logits) interface, so generate/prefill/decode_chunk drive
either family.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .model import _embed_lookup, _mm


@dataclass(frozen=True)
class GptJConfig:
    vocab_size: int = 50400
    hidden_size: int = 4096
    num_layers: int = 28
    num_heads: int = 16
    rotary_dim: int = 64
    intermediate_size: int = 16384
    max_context: int = 2048
    ln_eps: float = 1e-5
    compute_dtype: str = "bfloat16"
    model_family: str = "gptj"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def num_kv_heads(self) -> int:  # MHA; lets init_cache treat both families alike
        return self.num_heads

    @classmethod
    def tiny(cls, vocab_size: int = 512) -> "GptJConfig":
        return cls(vocab_size=vocab_size, hidden_size=128, num_layers=2,
                   num_heads=4, rotary_dim=16, intermediate_size=256,
                   max_context=256, compute_dtype="float32")

    @classmethod
    def from_model_dir(cls, model_dir: str) -> "GptJConfig":
        with open(os.path.join(model_dir, "config.json"), "r", encoding="utf-8") as fh:
            cfg = json.load(fh)
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["n_embd"],
            num_layers=cfg["n_layer"],
            num_heads=cfg["n_head"],
            rotary_dim=cfg.get("rotary_dim") or cfg["n_embd"] // cfg["n_head"],
            intermediate_size=cfg.get("n_inner") or 4 * cfg["n_embd"],
            max_context=min(cfg.get("n_positions", 2048), 4096),
            ln_eps=cfg.get("layer_norm_epsilon", 1e-5),
        )


def init_params(cfg: GptJConfig, seed: int = 0) -> dict:
    key = jax.random.PRNGKey(seed)
    L, H, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    keys = iter(jax.random.split(key, 8 + L * 8))

    def w(shape):
        return (0.02 * jax.random.normal(next(keys), shape)).astype(jnp.float32)

    def lw(shape):
        return jnp.stack([w(shape) for _ in range(L)])

    return {
        "embed": w((cfg.vocab_size, H)),
        "ln_f_scale": jnp.ones((H,), jnp.float32),
        "ln_f_bias": jnp.zeros((H,), jnp.float32),
        "lm_head": w((H, cfg.vocab_size)),
        "lm_head_bias": jnp.zeros((cfg.vocab_size,), jnp.float32),
        "layers": {
            "ln_scale": jnp.ones((L, H), jnp.float32),
            "ln_bias": jnp.zeros((L, H), jnp.float32),
            "q": lw((H, H)),
            "k": lw((H, H)),
            "v": lw((H, H)),
            "o": lw((H, H)),
            "fc_in": lw((H, I)),
            "fc_in_b": jnp.zeros((L, I), jnp.float32),
            "fc_out": lw((I, H)),
            "fc_out_b": jnp.zeros((L, H), jnp.float32),
        },
    }


def load_params(model_dir: str, cfg: GptJConfig | None = None) -> tuple[GptJConfig, dict]:
    """Load HF GPT-J safetensors (transformer.h.* naming)."""
    if cfg is None:
        cfg = GptJConfig.from_model_dir(model_dir)
    from safetensors import safe_open

    tensors: dict[str, np.ndarray] = {}
    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    files = ["model.safetensors"]
    if os.path.exists(index_path):
        with open(index_path) as fh:
            files = sorted(set(json.load(fh)["weight_map"].values()))
    for fname in files:
        with safe_open(os.path.join(model_dir, fname), framework="numpy") as f:
            for name in f.keys():
                tensors[name] = f.get_tensor(name)

    def t(name, transpose=False):
        arr = tensors[name]
        if transpose:
            arr = arr.T
        return jnp.asarray(arr, jnp.float32)

    _HF = {
        "ln_scale": ("ln_1.weight", False),
        "ln_bias": ("ln_1.bias", False),
        "q": ("attn.q_proj.weight", True),
        "k": ("attn.k_proj.weight", True),
        "v": ("attn.v_proj.weight", True),
        "o": ("attn.out_proj.weight", True),
        "fc_in": ("mlp.fc_in.weight", True),
        "fc_in_b": ("mlp.fc_in.bias", False),
        "fc_out": ("mlp.fc_out.weight", True),
        "fc_out_b": ("mlp.fc_out.bias", False),
    }
    layers = {
        ours: jnp.stack([
            t(f"transformer.h.{i}.{hf}", transpose=tr)
            for i in range(cfg.num_layers)
        ])
        for ours, (hf, tr) in _HF.items()
    }
    return cfg, {
        "embed": t("transformer.wte.weight"),
        "ln_f_scale": t("transformer.ln_f.weight"),
        "ln_f_bias": t("transformer.ln_f.bias"),
        "lm_head": t("lm_head.weight", transpose=True),
        "lm_head_bias": (t("lm_head.bias") if "lm_head.bias" in tensors
                         else jnp.zeros((cfg.vocab_size,), jnp.float32)),
        "layers": layers,
    }


def _layer_norm(x, scale, bias, eps):
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _rotary_every_two(x, positions, rotary_dim):
    """GPT-J interleaved rotary on the first rotary_dim head dims.
    x: [B, T, n, hd]; positions: [B, T]."""
    half = rotary_dim // 2
    freqs = 1.0 / (10000.0 ** (jnp.arange(0, half, dtype=jnp.float32) * 2 / rotary_dim))
    angles = positions[..., None].astype(jnp.float32) * freqs  # [B, T, half]
    cos = jnp.cos(angles)[:, :, None, :]  # [B, T, 1, half]
    sin = jnp.sin(angles)[:, :, None, :]
    rot = x[..., :rotary_dim]
    rest = x[..., rotary_dim:]
    x1 = rot[..., 0::2]  # even dims
    x2 = rot[..., 1::2]  # odd dims
    r1 = x1 * cos - x2 * sin
    r2 = x2 * cos + x1 * sin
    # interleave back: [..., half, 2] -> [..., rotary_dim]
    rot_out = jnp.stack([r1, r2], axis=-1).reshape(rot.shape)
    return jnp.concatenate([rot_out, rest], axis=-1)


def forward(cfg: GptJConfig, params: dict, tokens: jnp.ndarray,
            positions: jnp.ndarray, cache: dict, cache_len) -> tuple[jnp.ndarray, dict]:
    """Same contract as model.forward: (logits [B, T, V] f32, cache')."""
    cdt = jnp.dtype(cfg.compute_dtype)
    B, T = tokens.shape
    nh, hd, rd = cfg.num_heads, cfg.head_dim, cfg.rotary_dim
    prefill_local = T > 1
    x = _embed_lookup(params["embed"], tokens)  # residual stream f32

    def layer(x, per):
        lp, ck_in, cv_in = per
        h = _layer_norm(x, lp["ln_scale"], lp["ln_bias"], cfg.ln_eps).astype(cdt)
        q = _mm(h, lp["q"], cdt).reshape(B, T, nh, hd)
        k = _mm(h, lp["k"], cdt).reshape(B, T, nh, hd)
        v = _mm(h, lp["v"], cdt).reshape(B, T, nh, hd)
        q = _rotary_every_two(q.astype(jnp.float32), positions, rd).astype(cdt)
        k = _rotary_every_two(k.astype(jnp.float32), positions, rd).astype(cdt)

        ck = jax.lax.dynamic_update_slice(
            ck_in, k.astype(jnp.bfloat16), (0, cache_len, 0, 0)
        )
        cv = jax.lax.dynamic_update_slice(
            cv_in, v.astype(jnp.bfloat16), (0, cache_len, 0, 0)
        )
        if prefill_local:  # cache empty: attend over the new tokens only
            keys = k.astype(jnp.bfloat16).astype(cdt)
            vals_ = v.astype(jnp.bfloat16).astype(cdt)
            kpos = positions[:, None, None, :]            # [B,1,1,T]
        else:
            keys, vals_ = ck.astype(cdt), cv.astype(cdt)
            kpos = jnp.arange(cfg.max_context)[None, None, None, :]
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, keys,
                            preferred_element_type=jnp.float32)
        scores = scores / np.sqrt(hd)
        qpos = positions[:, None, :, None]
        scores = jnp.where(kpos <= qpos, scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(cdt)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, vals_,
                         preferred_element_type=jnp.float32)
        attn_out = _mm(ctx.reshape(B, T, nh * hd).astype(cdt), lp["o"], cdt)

        # parallel residual: mlp runs on the SAME ln output as attention
        m = jax.nn.gelu((_mm(h, lp["fc_in"], cdt)
                         + lp["fc_in_b"].astype(cdt)).astype(jnp.float32),
                        approximate=True).astype(cdt)
        mlp_out = _mm(m, lp["fc_out"], cdt) + lp["fc_out_b"].astype(cdt)
        x = x + attn_out.astype(jnp.float32) + mlp_out.astype(jnp.float32)
        return x, (ck, cv)

    x, (new_k, new_v) = jax.lax.scan(
        layer, x, (params["layers"], cache["k"], cache["v"])
    )
    x = _layer_norm(x, params["ln_f_scale"], params["ln_f_bias"], cfg.ln_eps)
    logits = _mm(x.astype(cdt), params["lm_head"], cdt) + params["lm_head_bias"]
    return logits.astype(jnp.float32), {"k": new_k, "v": new_v}
