"""Speller decoder: per-step stacked LSTM/GRU cells + character projection.

Parity with the reference's src/asr.py Decoder (per-step nn.LSTM with
init_state/set_state for beam-search state injection, char_trans linear to
vocab logits). Functional redesign: state is an explicit (h, c) pytree of
shape [layers, B, H] that callers thread through `lax.scan` bodies or beam
hypotheses — the reference's set_state/get_state mutation becomes plain
data flow.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from e2e_asr_tpu.config import DecoderConfig
from e2e_asr_tpu.models import layers as L
from e2e_asr_tpu.ops.rnn import gru_cell, lstm_cell

Params = Dict[str, object]
State = Tuple[jnp.ndarray, jnp.ndarray]  # (h, c) each [layers, B, H]; c unused for GRU


def decoder_init(key, in_dim: int, vocab: int, cfg: DecoderConfig) -> Params:
    ks = jax.random.split(key, cfg.layer + 1)
    gates = 4 if cfg.module.upper() == "LSTM" else 3
    cells = []
    d = in_dim
    for i in range(cfg.layer):
        cells.append(L.lstm_init(ks[i], d, cfg.dim, gates))
        d = cfg.dim
    return {"cells": cells, "char": L.dense_init(ks[-1], cfg.dim, vocab)}


def init_state(b: int, cfg: DecoderConfig, dtype=jnp.float32) -> State:
    z = jnp.zeros((cfg.layer, b, cfg.dim), dtype)
    return (z, z)


def query_of(state: State) -> jnp.ndarray:
    """Attention query = top-layer hidden state [B, H].

    (ref: src/asr.py uses decoder.state_list[0]; with the reference's
    default single-layer speller the two conventions coincide.)
    """
    return state[0][-1]


def step(
    params: Params,
    cfg: DecoderConfig,
    state: State,
    x: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, State]:
    """One decode step. x: [B, in_dim] = [char_emb; context].

    Returns (char_logits [B, vocab], hidden [B, H], new_state).
    """
    h_all, c_all = state
    is_lstm = cfg.module.upper() == "LSTM"
    hs, cs = [], []
    inp = x
    for i, w in enumerate(params["cells"]):
        xw = inp @ w.wx.astype(inp.dtype) + w.b.astype(inp.dtype)
        if is_lstm:
            h_new, c_new = lstm_cell(xw, h_all[i], c_all[i], w.wh.astype(inp.dtype))
        else:
            h_new = gru_cell(xw, h_all[i], w.wh.astype(inp.dtype))
            c_new = c_all[i]
        hs.append(h_new)
        cs.append(c_new)
        inp = h_new
        if train and cfg.dropout > 0 and rng is not None:
            inp = L.dropout(inp, cfg.dropout, jax.random.fold_in(rng, i), train)
    hidden = inp
    logits = L.dense(params["char"], hidden)
    return logits, hidden, (jnp.stack(hs), jnp.stack(cs))
