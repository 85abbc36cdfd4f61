"""Pallas TPU kernel: fused masked LSTM recurrence (the encoder hot loop).

Replaces the cuDNN fused LSTM the reference drives via ``torch.nn.LSTM``
(ref: src/module.py RNNLayer) on the sequential half of the computation.
The input projections x@Wx stay outside (one big MXU matmul over all
timesteps — ops/rnn.py); this kernel runs the time loop itself:

    gates_t = xw_t + h_{t-1} @ Wh ;  (i,f,g,o) -> (h_t, c_t)

as ONE `pallas_call` with a sequential grid over time-blocks. Versus the
`lax.scan` formulation this removes the per-step XLA while-loop overhead
(carry tuple DMA, loop bookkeeping) — the hidden state and the recurrent
weights stay resident in VMEM for the whole sequence and each grid step
advances TS timesteps from a streamed xw block.

Layout: both directions of a biLSTM (and in principle any number of
independent row groups) are packed on the row axis — R = D*B rows,
direction d owning rows [d*B, (d+1)*B) with its own Wh slice — matching
ops/rnn.py's single-scan bidir trick, so the per-step matmul sees 2B rows.

The backward pass is a second kernel walking time in reverse: gates are
rematerialized from (xw_t, h_{t-1}) — one extra matmul per step instead of
storing [T, R, 4H] gate residuals — while dWh accumulates in a VMEM f32
buffer across the whole sequence and dxw streams out per block. Grads for
the hoisted input projection (dx, dWx, db) fall out of autodiff on the
matmul outside.

Masking contract (same as ops/rnn._masked_scan): carries freeze where
mask=0 and emitted ys rows are zeroed. The kernel additionally REQUIRES
(a) zero initial state and (b) per-row masks that are a contiguous run
(prefix-true or suffix-true) — both always hold for right-padded /
time-flipped utterance batches — because the backward pass reconstructs
the step-entry carry h_{t-1} from the shifted ys output (equal wherever
mask=1 under exactly these conditions).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# timesteps advanced per grid step (streamed-block sublane size = TS*R)
TS_FWD = 8
TS_BWD = 8


def _hidden_matmul(h, wh, d_dirs, b_rows):
    """h [R, H] x wh [D, H, G] -> [R, G], direction d owning its row band."""
    outs = []
    for d in range(d_dirs):
        rows = h[d * b_rows : (d + 1) * b_rows, :]
        outs.append(
            jax.lax.dot_general(
                rows,
                wh[d],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    return jnp.concatenate(outs, axis=0) if d_dirs > 1 else outs[0]


def _fwd_kernel(xw_ref, mask_ref, wh_ref, ys_ref, c_ref, h_scr, c_scr, *, ts, d_dirs, b_rows, h_dim):
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    wh = wh_ref[:]
    for j in range(ts):
        h, c = h_scr[:], c_scr[:]
        gates = xw_ref[j].astype(jnp.float32) + _hidden_matmul(h, wh, d_dirs, b_rows)
        i = jax.nn.sigmoid(gates[:, :h_dim])
        f = jax.nn.sigmoid(gates[:, h_dim : 2 * h_dim])
        g = jnp.tanh(gates[:, 2 * h_dim : 3 * h_dim])
        o = jax.nn.sigmoid(gates[:, 3 * h_dim :])
        c2 = f * c.astype(jnp.float32) + i * g
        h2 = o * jnp.tanh(c2)
        m = mask_ref[j][:, None] > 0
        h_new = jnp.where(m, h2.astype(h.dtype), h)
        c_new = jnp.where(m, c2.astype(c.dtype), c)
        h_scr[:] = h_new
        c_scr[:] = c_new
        ys_ref[j] = jnp.where(m, h2, 0.0).astype(ys_ref.dtype)
        c_ref[j] = c_new.astype(c_ref.dtype)


def _bwd_kernel(
    xw_ref, mask_ref, wh_ref, hprev_ref, cprev_ref, dy_ref,
    dxw_ref, dwh_ref, dh_scr, dc_scr, *, ts, d_dirs, b_rows, h_dim,
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)

    wh = wh_ref[:]
    for j in range(ts - 1, -1, -1):
        h_prev = hprev_ref[j]
        c_prev = cprev_ref[j].astype(jnp.float32)
        gates = xw_ref[j].astype(jnp.float32) + _hidden_matmul(h_prev, wh, d_dirs, b_rows)
        i = jax.nn.sigmoid(gates[:, :h_dim])
        f = jax.nn.sigmoid(gates[:, h_dim : 2 * h_dim])
        g = jnp.tanh(gates[:, 2 * h_dim : 3 * h_dim])
        o = jax.nn.sigmoid(gates[:, 3 * h_dim :])
        c2 = f * c_prev + i * g
        tc = jnp.tanh(c2)
        m = mask_ref[j][:, None]  # f32 1/0

        dh2 = m * (dy_ref[j].astype(jnp.float32) + dh_scr[:])
        dc2 = m * dc_scr[:] + dh2 * o * (1.0 - tc * tc)
        dgates = jnp.concatenate(
            [
                dc2 * g * i * (1.0 - i),          # di
                dc2 * c_prev * f * (1.0 - f),      # df
                dc2 * i * (1.0 - g * g),           # dg
                dh2 * tc * o * (1.0 - o),          # do
            ],
            axis=-1,
        )
        dxw_ref[j] = dgates.astype(dxw_ref.dtype)

        # accumulate dWh[d] += h_prev_d^T @ dgates_d ; propagate dh through Wh^T
        dh_parts = []
        for d in range(d_dirs):
            rows = slice(d * b_rows, (d + 1) * b_rows)
            dwh_ref[d] += jax.lax.dot_general(
                h_prev[rows, :].astype(jnp.float32),
                dgates[rows, :],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dh_parts.append(
                jax.lax.dot_general(
                    dgates[rows, :],
                    wh[d],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        dh_gate = jnp.concatenate(dh_parts, axis=0) if d_dirs > 1 else dh_parts[0]
        dh_scr[:] = (1.0 - m) * dh_scr[:] + dh_gate
        dc_scr[:] = (1.0 - m) * dc_scr[:] + dc2 * f


def _pad_t(x, t_pad):
    t = x.shape[0]
    if t == t_pad:
        return x
    return jnp.pad(x, ((0, t_pad - t),) + ((0, 0),) * (x.ndim - 1))


def _common(xw, mask, wh, ts):
    t, r, gh = xw.shape
    d_dirs, h_dim, _ = wh.shape
    assert r % d_dirs == 0 and gh == 4 * h_dim
    t_pad = ((t + ts - 1) // ts) * ts
    return t, r, gh, d_dirs, h_dim, r // d_dirs, t_pad


def _lstm_seq_fwd_call(xw, mask, wh) -> Tuple[jnp.ndarray, jnp.ndarray]:
    ts = TS_FWD
    t, r, gh, d_dirs, h_dim, b_rows, t_pad = _common(xw, mask, wh, ts)
    dt = xw.dtype
    interpret = jax.default_backend() != "tpu"
    ys, c_out = pl.pallas_call(
        functools.partial(_fwd_kernel, ts=ts, d_dirs=d_dirs, b_rows=b_rows, h_dim=h_dim),
        grid=(t_pad // ts,),
        in_specs=[
            pl.BlockSpec((ts, r, gh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, r), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_dirs, h_dim, gh), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ts, r, h_dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, r, h_dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, r, h_dim), dt),
            jax.ShapeDtypeStruct((t_pad, r, h_dim), dt),
        ),
        scratch_shapes=[
            pltpu.VMEM((r, h_dim), dt),
            pltpu.VMEM((r, h_dim), dt),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(100e6)),
        interpret=interpret,
    )(
        _pad_t(xw, t_pad),
        _pad_t(mask.astype(jnp.float32), t_pad),
        wh.astype(dt),
    )
    return ys[:t], c_out[:t]


def _lstm_seq_bwd_call(xw, mask, wh, ys, c_out, dy):
    ts = TS_BWD
    t, r, gh, d_dirs, h_dim, b_rows, t_pad = _common(xw, mask, wh, ts)
    dt = xw.dtype
    nb = t_pad // ts
    # step-entry carries: h_{t-1}, c_{t-1} (zero at t=0; see masking contract)
    h_prev = jnp.concatenate([jnp.zeros((1, r, h_dim), ys.dtype), ys[:-1]], axis=0)
    c_prev = jnp.concatenate([jnp.zeros((1, r, h_dim), c_out.dtype), c_out[:-1]], axis=0)
    interpret = jax.default_backend() != "tpu"
    rev = lambda i: (nb - 1 - i, 0, 0)
    rev2 = lambda i: (nb - 1 - i, 0)
    dxw, dwh = pl.pallas_call(
        functools.partial(_bwd_kernel, ts=ts, d_dirs=d_dirs, b_rows=b_rows, h_dim=h_dim),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((ts, r, gh), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, r), rev2, memory_space=pltpu.VMEM),
            pl.BlockSpec((d_dirs, h_dim, gh), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, r, h_dim), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, r, h_dim), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, r, h_dim), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ts, r, gh), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((d_dirs, h_dim, gh), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, r, gh), dt),
            jax.ShapeDtypeStruct((d_dirs, h_dim, gh), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((r, h_dim), jnp.float32),
            pltpu.VMEM((r, h_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(100e6)),
        interpret=interpret,
    )(
        _pad_t(xw, t_pad),
        _pad_t(mask.astype(jnp.float32), t_pad),
        wh.astype(dt),
        _pad_t(h_prev, t_pad),
        _pad_t(c_prev, t_pad),
        _pad_t(dy, t_pad),
    )
    return dxw[:t], dwh


@jax.custom_vjp
def lstm_seq(xw: jnp.ndarray, mask: jnp.ndarray, wh: jnp.ndarray) -> jnp.ndarray:
    """Masked multi-direction LSTM time loop as a fused Pallas kernel.

    xw:   [T, R, 4H] precomputed input projections (+bias), R = D*B rows.
    mask: [T, R] validity (carry freezes where 0; ys zeroed). Per row the
          mask MUST be a contiguous prefix-true or suffix-true run.
    wh:   [D, H, 4H] recurrent weights, direction d owns rows [dB, (d+1)B).
    Zero initial state. Returns ys [T, R, H].
    """
    ys, _ = _lstm_seq_fwd_call(xw, mask, wh)
    return ys


def _vjp_fwd(xw, mask, wh):
    ys, c_out = _lstm_seq_fwd_call(xw, mask, wh)
    return ys, (xw, mask, wh, ys, c_out)


def _vjp_bwd(res, dy):
    xw, mask, wh, ys, c_out = res
    dxw, dwh = _lstm_seq_bwd_call(xw, mask, wh, ys, c_out, dy)
    return dxw, jnp.zeros_like(mask, jnp.float32), dwh.astype(wh.dtype)


lstm_seq.defvjp(_vjp_fwd, _vjp_bwd)
