"""Embedding regularizer plugin (ref: src/plugin.py EmbeddingRegularizer).

From Liu et al., "Sequence-to-sequence ASR with word-embedding
regularization": project the speller's hidden state into a pretrained
target-embedding space and add a similarity loss against the gold token's
embedding; optionally "fused decoding" mixes the embedding-similarity
distribution into the output softmax. Flag-gated exactly like the
reference (model.emb_reg.enable).

The pretrained table is loaded from a .npy [vocab, dim] file (fasttext
export); rows are L2-normalized once at init for the cosine objective.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from e2e_asr_tpu.config import EmbRegConfig
from e2e_asr_tpu.models import layers as L

Params = Dict[str, object]


def emb_reg_init(key, dec_dim: int, vocab: int, cfg: EmbRegConfig) -> Params:
    if cfg.src:
        table = np.load(cfg.src).astype(np.float32)
        assert table.shape[0] == vocab, f"emb table rows {table.shape[0]} != vocab {vocab}"
    else:
        dim = cfg.dim or dec_dim
        table = np.asarray(
            jax.random.normal(jax.random.fold_in(key, 1), (vocab, dim))
        ) / np.sqrt(dim)
    table = table / (np.linalg.norm(table, axis=1, keepdims=True) + 1e-8)
    k1 = jax.random.fold_in(key, 2)
    p: Params = {
        "proj": L.dense_init(k1, dec_dim, table.shape[1]),
        "table": jnp.asarray(table),  # frozen unless cfg.freeze=False
    }
    return p


def predict_embedding(p: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    """Decoder hidden [.., H] -> unit-norm predicted embedding [.., E]."""
    e = L.dense(p["proj"], hidden)
    return e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-8)


def emb_reg_loss(
    p: Params,
    cfg: EmbRegConfig,
    hidden: jnp.ndarray,  # [B, L, H] speller hiddens
    targets: jnp.ndarray,  # [B, L]
    target_len: jnp.ndarray,  # [B]
) -> jnp.ndarray:
    """Mean (1 - cos-sim) between predicted and gold embeddings
    (ref: plugin.py CosEmb distance), masked over valid tokens."""
    table = p["table"]
    if cfg.freeze:
        table = jax.lax.stop_gradient(table)
    pred = predict_embedding(p, hidden.astype(jnp.float32))  # [B, L, E]
    gold = table[targets]  # [B, L, E] (rows pre-normalized)
    cos = jnp.sum(pred * gold, -1)
    mask = jnp.arange(targets.shape[1])[None, :] < target_len[:, None]
    return jnp.sum((1.0 - cos) * mask) / jnp.maximum(jnp.sum(mask), 1)


def fused_log_probs(
    p: Params, cfg: EmbRegConfig, char_logits: jnp.ndarray, hidden: jnp.ndarray
) -> jnp.ndarray:
    """Fused decoding (ref: plugin.py fuse_prob): mix the embedding-space
    similarity softmax into the char softmax with weight cfg.fuse."""
    lp_char = jax.nn.log_softmax(char_logits.astype(jnp.float32), -1)
    if cfg.fuse <= 0:
        return lp_char
    pred = predict_embedding(p, hidden.astype(jnp.float32))
    sim = pred @ jax.lax.stop_gradient(p["table"]).T / max(cfg.temperature, 1e-6)
    lp_emb = jax.nn.log_softmax(sim, -1)
    return (1.0 - cfg.fuse) * lp_char + cfg.fuse * lp_emb
