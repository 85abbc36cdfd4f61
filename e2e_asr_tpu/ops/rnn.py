"""Length-masked LSTM/GRU recurrences as `jax.lax.scan` over time.

The reference's encoder/decoder/LM recurrence is cuDNN's fused LSTM behind
``torch.nn.LSTM`` (ref: src/module.py RNNLayer, src/asr.py Decoder,
src/lm.py RNNLM). TPU-native redesign:

- The input projection x_t @ Wx for *all* timesteps is hoisted out of the
  sequential loop into one [B*T, D]x[D, 4H] MXU matmul; the scan body only
  does the [B, H]x[H, 4H] hidden matmul + elementwise gates (VPU).
- Variable length is handled by masking the carry update (h/c freeze past
  each sequence's end), so right-padded batches stay correct without any
  pack/unpack like torch's PackedSequence.
- Backward direction = flip time, scan, flip back; with zero initial state
  and frozen-carry masking the flipped padding prefix is inert.

Weights layout: Wx [D, G*H], Wh [H, G*H], b [G*H] with G=4 (LSTM: i,f,g,o)
or G=3 (GRU: r,z,n — torch gate order/formulation).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class LSTMWeights(NamedTuple):
    wx: jnp.ndarray  # [D, 4H]
    wh: jnp.ndarray  # [H, 4H]
    b: jnp.ndarray  # [4H]


def lstm_cell(
    xw_t: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray, wh: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One LSTM step. xw_t = x_t @ Wx + b precomputed. Returns (h', c')."""
    gates = xw_t + h @ wh
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def gru_cell(xw_t: jnp.ndarray, h: jnp.ndarray, wh: jnp.ndarray) -> jnp.ndarray:
    """One GRU step (torch formulation: n uses r * (h @ Wh_n))."""
    xr, xz, xn = jnp.split(xw_t, 3, axis=-1)
    hr, hz, hn = jnp.split(h @ wh, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def _masked_scan(cell_step, xw: jnp.ndarray, mask: jnp.ndarray, state0, unroll: int = 8):
    """Scan `cell_step` over time with carry freezing where ~mask.

    xw: [T, B, GH] precomputed input projections (time-major for scan).
    mask: [T, B] validity. state0: pytree of [B, H] arrays. `unroll` trades
    code size for fewer loop iterations — ~2x faster on TPU (the per-step
    matmul alone underfills the MXU pipeline).
    Returns (ys [T, B, H], final_state).
    """

    def step(state, inp):
        xw_t, m = inp
        new_state, y = cell_step(xw_t, state)
        m = m[:, None]
        new_state = jax.tree.map(lambda n, o: jnp.where(m, n, o), new_state, state)
        return new_state, jnp.where(m, y, 0.0)

    final, ys = jax.lax.scan(step, state0, (xw, mask), unroll=unroll)
    return ys, final


def _use_pallas(impl: str, cell: str) -> bool:
    """Dispatch rule for the fused Pallas recurrence (ops/rnn_pallas.py):
    'pallas'/'pallas_xw' force it (interpret mode off-TPU, for parity
    tests), 'scan' forces the lax.scan path, 'auto' uses the kernel on real
    TPU for LSTM (GRU stays scan — not the reference's encoder hot path)."""
    import os

    impl = os.environ.get("E2E_RNN_IMPL", impl)  # bisect escape hatch
    if impl in ("pallas", "pallas_xw"):
        return cell == "lstm"
    return impl == "auto" and cell == "lstm" and jax.default_backend() == "tpu"


def lstm(
    x: jnp.ndarray,
    x_len: jnp.ndarray,
    w: LSTMWeights,
    reverse: bool = False,
    h0: Optional[jnp.ndarray] = None,
    c0: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """[B, T, D] -> [B, T, H]; returns (outputs, (h_T, c_T)).

    Stays on the scan path (callers need the final carry, which the fused
    kernel does not emit); the encoder hot loop is `bidir` below."""
    b, t, _ = x.shape
    hdim = w.wh.shape[0]
    compute_dtype = x.dtype
    xw = x @ w.wx.astype(compute_dtype) + w.b.astype(compute_dtype)  # hoisted MXU matmul
    xw = jnp.moveaxis(xw, 0, 1)  # [T, B, 4H]
    tidx = jnp.arange(t)
    mask = tidx[:, None] < x_len[None, :]  # [T, B]
    if reverse:
        xw = jnp.flip(xw, axis=0)
        mask = jnp.flip(mask, axis=0)
    h = jnp.zeros((b, hdim), compute_dtype) if h0 is None else h0
    c = jnp.zeros((b, hdim), compute_dtype) if c0 is None else c0
    wh = w.wh.astype(compute_dtype)

    def cell_step(xw_t, state):
        h, c = state
        h2, c2 = lstm_cell(xw_t, h, c, wh)
        return (h2, c2), h2

    ys, (h_f, c_f) = _masked_scan(cell_step, xw, mask, (h, c))
    if reverse:
        ys = jnp.flip(ys, axis=0)
    return jnp.moveaxis(ys, 0, 1), (h_f, c_f)


def bidir(
    x: jnp.ndarray,
    x_len: jnp.ndarray,
    w_fwd: LSTMWeights,
    w_bwd: LSTMWeights,
    cell: str = "lstm",
    impl: str = "auto",
) -> jnp.ndarray:
    """Bidirectional recurrence in ONE scan: the reversed stream rides the
    batch axis, so the sequential loop runs T steps total (not 2T) and the
    per-step hidden matmul sees 2B rows — twice the MXU sublane
    utilization of two separate scans. Direction-specific weights become a
    leading-axis stack contracted with einsum.

    Returns [B, T, 2H] (fwd ++ bwd), masked to zero past x_len.
    """
    b, t, _ = x.shape
    hdim = w_fwd.wh.shape[0]
    dt = x.dtype
    tidx = jnp.arange(t)
    mask = tidx[:, None] < x_len[None, :]  # [T, B]
    wh = jnp.stack([w_fwd.wh, w_bwd.wh]).astype(dt)  # [2, H, GH]

    in_dim = x.shape[-1]
    # Mosaic rejects the fused kernel's (block, bB, D) -> (block*bB, D)
    # reshape when D is not lane-aligned ("unsupported shape cast", seen at
    # D=80 with prenet='' recipes); auto mode falls back to the scan path
    # for such layers. Explicit impl='pallas' keeps the kernel (tests).
    lane_ok = in_dim % 128 == 0
    gh_lane_ok = wh.shape[-1] % 128 == 0  # GH=4H must be lane-aligned too
    if _use_pallas(impl, cell) and impl == "auto" and not (lane_ok and gh_lane_ok):
        from e2e_asr_tpu.utils.misc import warn_once

        if not gh_lane_ok:
            # v1 kernel needs GH alignment too -> full lax.scan fallback
            warn_once(
                f"rnn_fused_fallback_{in_dim}_{wh.shape[-1]}",
                f"bidir LSTM: gate dim 4H={wh.shape[-1]} not 128-lane-aligned "
                "-> lax.scan path instead of the fused Pallas recurrence "
                "(slower; pick hidden dims that are multiples of 32)",
            )
        else:
            warn_once(
                f"rnn_fusedproj_fallback_{in_dim}",
                f"bidir LSTM: input dim {in_dim} not 128-lane-aligned -> v1 "
                "Pallas recurrence with xw materialized in HBM instead of the "
                "fused-projection kernel (extra HBM traffic)",
            )
    if (
        _use_pallas(impl, cell)
        and impl != "pallas_xw"
        and (impl != "auto" or (lane_ok and gh_lane_ok))
    ):
        # v2 fused-projection kernel: x@Wx runs inside the kernel
        # (block-batched MXU matmuls); xw is never materialized in HBM —
        # on this chip's measured ~85 GB/s that write+read dominated the
        # whole layer (see rnn_pallas.py).
        from e2e_asr_tpu.ops import rnn_pallas

        wx = jnp.stack([w_fwd.wx, w_bwd.wx]).astype(dt)  # [2, D, GH]
        bias = jnp.stack([w_fwd.b, w_bwd.b]).astype(dt)  # [2, GH]
        x_tm = jnp.moveaxis(x, 0, 1)  # [T, B, D]
        ys = rnn_pallas.lstm_seq_fused(x_tm, mask.astype(jnp.float32), wx, wh, bias)
        # ys is [T_pad, 2B, H]; backward rows are in kernel time
        y_f = jnp.moveaxis(ys[:t, :b], 0, 1)
        y_b = jnp.moveaxis(jnp.flip(ys[:, b:], axis=0)[:t], 0, 1)
        return jnp.concatenate([y_f, y_b], axis=-1)

    xw_f = x @ w_fwd.wx.astype(dt) + w_fwd.b.astype(dt)  # [B, T, GH]
    xw_b = x @ w_bwd.wx.astype(dt) + w_bwd.b.astype(dt)
    xw_f = jnp.moveaxis(xw_f, 0, 1)
    xw_b = jnp.flip(jnp.moveaxis(xw_b, 0, 1), axis=0)
    xw = jnp.concatenate([xw_f, xw_b], axis=1)  # [T, 2B, GH]
    mask2 = jnp.concatenate([mask, jnp.flip(mask, axis=0)], axis=1)  # [T, 2B]

    gh_ok = wh.shape[-1] % 128 == 0  # same lane-alignment rule for [.., GH]
    if _use_pallas(impl, cell) and (impl != "auto" or gh_ok):
        from e2e_asr_tpu.ops import rnn_pallas

        ys = rnn_pallas.lstm_seq(xw, mask2.astype(jnp.float32), wh)
        y_f = jnp.moveaxis(ys[:, :b], 0, 1)
        y_b = jnp.moveaxis(jnp.flip(ys[:, b:], axis=0), 0, 1)
        return jnp.concatenate([y_f, y_b], axis=-1)

    is_lstm = cell == "lstm"
    h = jnp.zeros((2 * b, hdim), dt)
    state0 = (h, h) if is_lstm else h

    def hidden_matmul(hcat):
        return jnp.einsum("dbh,dhg->dbg", hcat.reshape(2, b, hdim), wh).reshape(2 * b, -1)

    def cell_step(xw_t, state):
        if is_lstm:
            h_, c_ = state
            gates = xw_t + hidden_matmul(h_)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c2 = jax.nn.sigmoid(f) * c_ + jax.nn.sigmoid(i) * jnp.tanh(g)
            h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
            return (h2, c2), h2
        xr, xz, xn = jnp.split(xw_t, 3, axis=-1)
        hr, hz, hn = jnp.split(hidden_matmul(state), 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h2 = (1.0 - z) * n + z * state
        return h2, h2

    ys, _ = _masked_scan(cell_step, xw, mask2, state0)  # [T, 2B, H]
    y_f = jnp.moveaxis(ys[:, :b], 0, 1)
    y_b = jnp.moveaxis(jnp.flip(ys[:, b:], axis=0), 0, 1)
    return jnp.concatenate([y_f, y_b], axis=-1)


def gru(
    x: jnp.ndarray,
    x_len: jnp.ndarray,
    w: LSTMWeights,
    reverse: bool = False,
    h0: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, T, D] -> [B, T, H]; returns (outputs, h_T). w.wx/[D,3H]."""
    b, t, _ = x.shape
    hdim = w.wh.shape[0]
    xw = x @ w.wx.astype(x.dtype) + w.b.astype(x.dtype)
    xw = jnp.moveaxis(xw, 0, 1)
    tidx = jnp.arange(t)
    mask = tidx[:, None] < x_len[None, :]
    if reverse:
        xw = jnp.flip(xw, axis=0)
        mask = jnp.flip(mask, axis=0)
    h = jnp.zeros((b, hdim), x.dtype) if h0 is None else h0
    wh = w.wh.astype(x.dtype)

    def cell_step(xw_t, state):
        h2 = gru_cell(xw_t, state, wh)
        return h2, h2

    ys, h_f = _masked_scan(cell_step, xw, mask, h)
    if reverse:
        ys = jnp.flip(ys, axis=0)
    return jnp.moveaxis(ys, 0, 1), h_f
