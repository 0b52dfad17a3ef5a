"""Device-side model zoo.

- `minilm`: BERT-family sentence encoder (all-MiniLM-L12-v2 architecture,
  384-d) — replaces the reference's libtorch/rust-bert backend
  (lib/libmemex/src/llm/embedding.rs:98-100).
- `llama`: decoder-only LLM for local chat/summarize actions — replaces the
  reference's GGML backend (lib/libmemex/src/llm/local/mod.rs:55-137).
"""

from .minilm import MiniLMConfig, MiniLMEncoder, init_params, load_params

__all__ = ["MiniLMConfig", "MiniLMEncoder", "init_params", "load_params"]
