"""Encoder fine-tuning driver: SQL corpus -> contrastive pairs -> DP train
loop -> HF-format export servable via EMBEDDING_MODEL.

Pairing is self-supervised from the ingest layout: overlapping windows of
the same document (stride 86 of 256 tokens — reference chunking geometry)
are positives; everything else in the batch is a negative. This is the
standard unsupervised domain-adaptation recipe for sentence encoders when
no labeled query/doc pairs exist.

Checkpointing: the full train state (params + optimizer + step) round-
trips through a single .npz (the pytree structure comes from a fresh
init, so restore needs only the config); the final encoder exports to HF
format (models/minilm.save_params).
"""

from __future__ import annotations

import time

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..log import get_logger
from ..models.minilm import MiniLMConfig, save_params
from .contrastive import TrainConfig, init_train_state, make_train_step

logger = get_logger(__name__)


def save_train_state(state, path: str) -> None:
    leaves = jax.tree.leaves(state)
    np.savez(path, *[np.asarray(leaf) for leaf in leaves])


def load_train_state(template, path: str):
    """Restore into the structure of `template` (a fresh init_train_state)."""
    arrs = np.load(path)
    leaves = [arrs[f"arr_{i}"] for i in range(len(arrs.files))]
    treedef = jax.tree.structure(template)
    assert treedef.num_leaves == len(leaves), "checkpoint/config mismatch"
    return jax.tree.unflatten(treedef, leaves)


def pairs_from_sql(rt, collection: str) -> list[tuple[str, str]]:
    """Adjacent overlapping windows of each document form positive pairs."""
    rows = rt.db.query(
        "SELECT document_id, segment, content FROM embeddings "
        "WHERE collection = ? ORDER BY document_id, segment",
        (collection,),
    )
    pairs: list[tuple[str, str]] = []
    prev = None
    for row in rows:
        cur = (row["document_id"], row["segment"], row["content"])
        if prev is not None and prev[0] == cur[0] and cur[1] == prev[1] + 1:
            pairs.append((prev[2], cur[2]))
        prev = cur
    if not pairs:  # single-window docs: pair each segment with itself
        pairs = [(r["content"], r["content"]) for r in rows]
    return pairs


def _tokenize_pairs(engine, pairs, max_len: int):
    tok = engine.tokenizer
    n = len(pairs)
    q_ids = np.full((n, max_len), tok.pad_id, np.int32)
    q_mask = np.zeros((n, max_len), np.int32)
    d_ids = np.full((n, max_len), tok.pad_id, np.int32)
    d_mask = np.zeros((n, max_len), np.int32)
    for i, (q, d) in enumerate(pairs):
        for ids_arr, mask_arr, text in ((q_ids, q_mask, q), (d_ids, d_mask, d)):
            e = tok.encode(text, add_special_tokens=True)[:max_len]
            ids_arr[i, : len(e)] = e
            mask_arr[i, : len(e)] = 1
    return q_ids, q_mask, d_ids, d_mask


def train_encoder(
    rt,
    collection: str,
    epochs: int = 1,
    batch_size: int = 32,
    max_len: int = 64,
    tc: TrainConfig | None = None,
    out_dir: str | None = None,
    resume: str | None = None,
    checkpoint_path: str | None = None,
    seed: int = 0,
) -> dict:
    """Fine-tune the runtime's encoder on `collection`; returns metrics."""
    tc = tc or TrainConfig()
    engine = rt.engine
    cfg = MiniLMConfig(**{**engine.cfg.__dict__, "compute_dtype": "float32"})
    pairs = pairs_from_sql(rt, collection)
    if not pairs:
        raise ValueError(f"collection {collection!r} has no segments to train on")
    logger.info("training on %d pairs from %r", len(pairs), collection)
    q_ids, q_mask, d_ids, d_mask = _tokenize_pairs(engine, pairs, max_len)

    mesh = Mesh(np.array(jax.devices()), ("data",))
    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data", None))
    n_dev = len(jax.devices())
    batch_size = max(n_dev, (batch_size // n_dev) * n_dev)
    # Small collections: shrink the batch to the largest device multiple
    # that fits — otherwise the epoch loop runs ZERO steps and the
    # unmodified encoder would be exported as if fine-tuned.
    if len(pairs) < batch_size:
        batch_size = max(n_dev, (len(pairs) // n_dev) * n_dev)
        if len(pairs) < batch_size:
            raise ValueError(
                f"collection {collection!r} has only {len(pairs)} pairs — "
                f"fewer than the {n_dev}-device minimum batch")
        logger.info("batch_size reduced to %d (%d pairs)", batch_size, len(pairs))

    # f32 master params for training (engine params may be bf16-cast)
    f32_params = jax.tree.map(lambda a: a.astype(np.float32), engine.params)
    state = init_train_state(cfg, f32_params, tc)
    if resume:
        state = load_train_state(state, resume)
        logger.info("resumed from %s at step %d", resume, int(state["step"]))
    state = jax.device_put(state, rep)
    step_fn = jax.jit(make_train_step(cfg, tc), in_shardings=(rep, dp),
                      out_shardings=(rep, rep), donate_argnums=(0,))

    rng = np.random.default_rng(seed)
    n = len(pairs)
    metrics = {}
    for epoch in range(epochs):
        order = rng.permutation(n)
        t0 = time.perf_counter()
        for s in range(0, n - batch_size + 1, batch_size):
            sel = order[s : s + batch_size]
            batch = {
                "q_ids": jax.device_put(q_ids[sel], dp),
                "q_mask": jax.device_put(q_mask[sel], dp),
                "d_ids": jax.device_put(d_ids[sel], dp),
                "d_mask": jax.device_put(d_mask[sel], dp),
            }
            state, metrics = step_fn(state, batch)
        logger.info(
            "epoch %d: loss %.4f acc %.3f (%.1fs)", epoch,
            float(metrics.get("loss", np.nan)), float(metrics.get("accuracy", np.nan)),
            time.perf_counter() - t0,
        )
        if checkpoint_path:
            save_train_state(state, checkpoint_path)
    if out_dir:
        save_params(out_dir, cfg, jax.device_get(state["params"]),
                    vocab=engine.tokenizer.vocab)
        logger.info("exported fine-tuned encoder to %s (HF format)", out_dir)
    return {k: float(v) for k, v in metrics.items()} | {"pairs": n,
                                                        "step": int(state["step"])}
