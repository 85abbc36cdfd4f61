"""RNN language model (for LM training and shallow fusion in beam search).

Parity with the reference's src/lm.py RNNLM: embedding (optional weight
tying + projection), dropout, n-layer LSTM/GRU, linear output. Exposes both
a full-sequence apply (training/perplexity, recurrence via the masked scans
in ops/rnn.py) and a single-token `step` used inside jitted beam search for
shallow fusion (ref: src/decode.py mixes `lm_weight * lm_log_probs`).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from e2e_asr_tpu.config import LMConfig
from e2e_asr_tpu.models import layers as L
from e2e_asr_tpu.ops import rnn as rnn_ops
from e2e_asr_tpu.ops.rnn import gru_cell, lstm_cell

Params = Dict[str, object]
State = Tuple[jnp.ndarray, jnp.ndarray]  # (h, c) [layers, B, H]


def lm_init(key, vocab: int, cfg: LMConfig) -> Params:
    ks = jax.random.split(key, cfg.n_layers + 3)
    gates = 4 if cfg.module.upper() == "LSTM" else 3
    p: Params = {"embed": L.embedding_init(ks[0], vocab, cfg.emb_dim)}
    cells = []
    d = cfg.emb_dim
    for i in range(cfg.n_layers):
        cells.append(L.lstm_init(ks[i + 1], d, cfg.dim, gates))
        d = cfg.dim
    p["cells"] = cells
    if cfg.emb_tying:
        # project hidden back to emb_dim, output = h @ E^T (tied weights)
        p["out_proj"] = L.dense_init(ks[-2], cfg.dim, cfg.emb_dim)
    else:
        p["out"] = L.dense_init(ks[-1], cfg.dim, vocab)
    return p


def _output(p: Params, cfg: LMConfig, h: jnp.ndarray) -> jnp.ndarray:
    if cfg.emb_tying:
        z = L.dense(p["out_proj"], h)
        return z @ p["embed"]["table"].astype(z.dtype).T
    return L.dense(p["out"], h)


def init_state(b: int, cfg: LMConfig, dtype=jnp.float32) -> State:
    z = jnp.zeros((cfg.n_layers, b, cfg.dim), dtype)
    return (z, z)


def apply_seq(
    params: Params,
    cfg: LMConfig,
    tokens: jnp.ndarray,
    lens: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> jnp.ndarray:
    """[B, L] token ids -> [B, L, V] logits (full-sequence, for training)."""
    x = L.embed(params["embed"], tokens)
    x = L.dropout(x, cfg.dropout, rng, train)
    run = rnn_ops.lstm if cfg.module.upper() == "LSTM" else rnn_ops.gru
    for i, w in enumerate(params["cells"]):
        out = run(x, lens, w)
        x = out[0]
        if train and rng is not None:
            x = L.dropout(x, cfg.dropout, jax.random.fold_in(rng, i), train)
    return _output(params, cfg, x)


def step(
    params: Params, cfg: LMConfig, tok: jnp.ndarray, state: State
) -> Tuple[jnp.ndarray, State]:
    """Single-token step for fusion: [B] ids -> ([B, V] log-probs, state)."""
    x = L.embed(params["embed"], tok)
    h_all, c_all = state
    is_lstm = cfg.module.upper() == "LSTM"
    hs, cs = [], []
    for i, w in enumerate(params["cells"]):
        xw = x @ w.wx.astype(x.dtype) + w.b.astype(x.dtype)
        if is_lstm:
            h, c = lstm_cell(xw, h_all[i], c_all[i], w.wh.astype(x.dtype))
        else:
            h = gru_cell(xw, h_all[i], w.wh.astype(x.dtype))
            c = c_all[i]
        hs.append(h)
        cs.append(c)
        x = h
    logits = _output(params, cfg, x)
    return jax.nn.log_softmax(logits, -1), (jnp.stack(hs), jnp.stack(cs))
