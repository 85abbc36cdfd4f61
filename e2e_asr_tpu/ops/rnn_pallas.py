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


# ===========================================================================
# v2/v3: fused-projection bidirectional LSTM (the input projection x@Wx
# runs INSIDE the kernel, block-batched on the MXU).
#
# v2 motivation (measured on this chip — see BASELINE.md): the v1 pipeline
# (XLA matmul materializes xw [T, 2B, 4H] = 273 MB/layer, the kernel
# streams it back in) paid HBM write+read of xw; v2 streams x itself and
# projects each TS-step block through one [TS*B, D]x[D, 4H] MXU matmul
# into VMEM scratch.
#
# v3 (round 5): the v2 BACKWARD rematerialized everything — an in-block
# forward sweep recomputed the input projections AND the gate activations
# before the reverse sweep. Measured per-step slopes at the flagship shape
# (tools/exp_rnn_floor.py, rows=256, H=320, D=1280, one v5e): fwd
# 4.8 us/step but fwd+bwd 28.6 us/step — the backward was ~5x the forward,
# and a pure dependent-matmul chain probe showed the serial latency floor
# is ~0 marginal (both T=408 and T=816 run in ~6 ms): the kernel is bound
# by per-step COMPUTE, not serial latency, and the remat sweep's xproj
# (840 MF/step) + hidden matmul (210 MF/step) are a third of the backward
# FLOPs. In a latency/compute-bound kernel the DMA engines are idle, so
# streaming residuals out of the forward pass is free: v3's forward also
# emits the gate activations (i,f,g,o) and the c stream; the backward is a
# single reverse sweep (dgates on the VPU, one serial dh matmul, per-step
# dWh accumulate) plus block-batched dx/dWx/db matmuls.
# ===========================================================================

TS_FUSED = 8


def _pick_ts_fused(b_rows: int, d: int, h_dim: int) -> int:
    """VMEM-aware timesteps-per-block for the fused kernels.

    The v3 BACKWARD is the binding kernel: per grid step it holds
    double-buffered streams (x fwd+rev, acts, ys/ysp/c/cp/dy, dx fwd+rev),
    the dgate scratch, and the fixed weight/grad buffers. At the flagship
    B=128 everything fits at TS=8; the realistic ladder's B=192 buckets
    overflow (measured: 107.7M vs the 95.4M scoped limit), so TS halves
    until the model fits ~88M. fwd and bwd share the picked TS because the
    bwd re-pads its streams to its own T_pad — they must agree.
    E2E_RNN_TS forces a value (experiments)."""
    import os

    forced = os.environ.get("E2E_RNN_TS", "")
    if forced:
        return int(forced)
    gh = 4 * h_dim
    r = 2 * b_rows
    fixed = (2 * d * gh + 2 * h_dim * gh) * 2  # wx+wh bf16
    fixed += (2 * d * gh + 2 * h_dim * gh) * 4  # dwx+dwh f32
    fixed += 2 * r * h_dim * 4 * 2  # dh/dc f32 scratch
    ts = TS_FUSED
    while ts > 1:
        # double-buffered streams: x in (2 views) + dx out (2 views) +
        # acts + ys/ysp/c/cp/dy. Calibrated against the compiler's actual
        # scoped-vmem accounting (round 5): at D=1280, H=320 this model
        # reads 97.6/93.8/86.3 MB for B=152/144/128 vs the compiler's
        # 96.3/~92.6/~85.2 — within ~1.5 MB. Budget 94 MB stays under the
        # 95.37 MB scoped limit with that modeling error.
        streams = (6 * ts * b_rows * d + ts * r * gh + 5 * ts * r * h_dim) * 2 * 2
        scratch = 2 * ts * b_rows * gh * 2
        if fixed + streams + scratch <= 94e6:
            break
        ts //= 2
    return ts


def _cell_f32(xw_cat, h, c, wh, d_dirs, b_rows, h_dim):
    gates = xw_cat + _hidden_matmul(h, wh, d_dirs, b_rows)
    i = jax.nn.sigmoid(gates[:, :h_dim])
    f = jax.nn.sigmoid(gates[:, h_dim : 2 * h_dim])
    g = jnp.tanh(gates[:, 2 * h_dim : 3 * h_dim])
    o = jax.nn.sigmoid(gates[:, 3 * h_dim :])
    c2 = f * c.astype(jnp.float32) + i * g
    h2 = o * jnp.tanh(c2)
    return i, f, g, o, c2, h2


def _fused_fwd_kernel(
    xf_ref, xr_ref, mf_ref, mr_ref, wx_ref, b_ref, wh_ref,
    ys_ref, c_ref, acts_ref, h_scr, c_scr, xwf_scr, xwr_scr, *, ts, b_rows, h_dim,
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    d = xf_ref.shape[-1]
    wx = wx_ref[:]
    b = b_ref[:].astype(jnp.float32)
    # block-batched input projections (the big MXU matmuls)
    xwf_scr[:] = (
        jax.lax.dot_general(
            xf_ref[:].reshape(ts * b_rows, d), wx[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b[0][None]
    ).reshape(ts, b_rows, -1).astype(xwf_scr.dtype)
    xwr_scr[:] = (
        jax.lax.dot_general(
            xr_ref[:].reshape(ts * b_rows, d), wx[1],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b[1][None]
    ).reshape(ts, b_rows, -1).astype(xwr_scr.dtype)

    wh = wh_ref[:]
    for j in range(ts):
        # reversed-direction stream: block (nb-1-i) flipped within the block
        xw_cat = jnp.concatenate(
            [xwf_scr[j], xwr_scr[ts - 1 - j]], axis=0
        ).astype(jnp.float32)
        h, c = h_scr[:], c_scr[:]
        i, f, g, o, c2, h2 = _cell_f32(xw_cat, h, c, wh, 2, b_rows, h_dim)
        m = jnp.concatenate([mf_ref[j], mr_ref[ts - 1 - j]], axis=0) > 0
        h_new = jnp.where(m, h2.astype(h.dtype), h)
        c_new = jnp.where(m, c2.astype(c.dtype), c)
        h_scr[:] = h_new
        c_scr[:] = c_new
        ys_ref[j] = jnp.where(m, h2, 0.0).astype(ys_ref.dtype)
        # v3 residual streams (free DMA under the compute-bound loop):
        # frozen c carry (c_prev/tanh source) + gate activations
        c_ref[j] = c_new.astype(c_ref.dtype)
        acts_ref[j] = jnp.concatenate([i, f, g, o], axis=-1).astype(acts_ref.dtype)


def _fused_bwd_kernel(
    xf_ref, xr_ref, mf_ref, mr_ref, wx_ref, wh_ref,
    ys_ref, ysp_ref, c_ref, cp_ref, acts_ref, dy_ref,
    dxf_ref, dxr_ref, dwx_ref, dwh_ref, db_ref,
    dgf_scr, dgr_scr, dh_scr, dc_scr,
    *, ts, b_rows, h_dim, nb,
):
    ii = pl.program_id(0)  # walks time blocks in REVERSE (i = nb-1-ii)

    @pl.when(ii == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dwx_ref[:] = jnp.zeros_like(dwx_ref)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    d = xf_ref.shape[-1]
    gh = 4 * h_dim
    wx = wx_ref[:]
    wh = wh_ref[:]

    # h_prev / c_prev at step j come straight from the streamed fwd
    # residuals (ys equals the h carry wherever mask=1 under the zero-init
    # + contiguous-mask contract; masked steps contribute zero dgates below
    # so their garbage is inert). Block boundary rows come from the
    # previous time block's last row (ysp/cp views); kernel time 0 is the
    # zero initial state.
    def h_prev_at(j):
        if j == 0:
            return jnp.where(
                ii == nb - 1, jnp.zeros_like(ysp_ref[ts - 1]), ysp_ref[ts - 1]
            )
        return ys_ref[j - 1]

    def c_prev_at(j):
        if j == 0:
            return jnp.where(
                ii == nb - 1,
                jnp.zeros_like(cp_ref[ts - 1]),
                cp_ref[ts - 1],
            ).astype(jnp.float32)
        return c_ref[j - 1].astype(jnp.float32)

    # ---- single reverse sweep: dgates, dwh, carry cotangents (no remat —
    # the v2 in-block forward sweep cost a full extra xproj + hidden matmul
    # per step; see module header)
    for j in range(ts - 1, -1, -1):
        acts = acts_ref[j].astype(jnp.float32)
        i = acts[:, :h_dim]
        f = acts[:, h_dim : 2 * h_dim]
        g = acts[:, 2 * h_dim : 3 * h_dim]
        o = acts[:, 3 * h_dim :]
        # c_ref[j] is the (frozen) carry AFTER step j == c2 wherever mask=1
        tc = jnp.tanh(c_ref[j].astype(jnp.float32))
        c_prev = c_prev_at(j)
        m = jnp.concatenate(
            [mf_ref[j], mr_ref[ts - 1 - j]], axis=0
        ).astype(jnp.float32)

        dh2 = m * (dy_ref[j].astype(jnp.float32) + dh_scr[:])
        dc2 = m * dc_scr[:] + dh2 * o * (1.0 - tc * tc)
        dgates = jnp.concatenate(
            [
                dc2 * g * i * (1.0 - i),
                dc2 * c_prev * f * (1.0 - f),
                dc2 * i * (1.0 - g * g),
                dh2 * tc * o * (1.0 - o),
            ],
            axis=-1,
        )
        dgf_scr[j] = dgates[:b_rows].astype(dgf_scr.dtype)
        dgr_scr[ts - 1 - j] = dgates[b_rows:].astype(dgr_scr.dtype)

        h_prev = h_prev_at(j)
        dh_parts = []
        for dd in range(2):
            rows = slice(dd * b_rows, (dd + 1) * b_rows)
            dwh_ref[dd] += jax.lax.dot_general(
                h_prev[rows, :].astype(jnp.float32), dgates[rows, :],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dh_parts.append(
                jax.lax.dot_general(
                    dgates[rows, :], wh[dd],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        dh_scr[:] = (1.0 - m) * dh_scr[:] + jnp.concatenate(dh_parts, axis=0)
        dc_scr[:] = (1.0 - m) * dc_scr[:] + dc2 * f

    # ---- block-batched weight/input grads (big MXU matmuls)
    dgf = dgf_scr[:].reshape(ts * b_rows, gh)
    dgr = dgr_scr[:].reshape(ts * b_rows, gh)
    dxf_ref[:] = jax.lax.dot_general(
        dgf, wx[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(ts, b_rows, d).astype(dxf_ref.dtype)
    dxr_ref[:] = jax.lax.dot_general(
        dgr, wx[1], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(ts, b_rows, d).astype(dxr_ref.dtype)
    dwx_ref[0] += jax.lax.dot_general(
        xf_ref[:].reshape(ts * b_rows, d), dgf,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwx_ref[1] += jax.lax.dot_general(
        xr_ref[:].reshape(ts * b_rows, d), dgr,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db_ref[0] += jnp.sum(dgf, axis=0)
    db_ref[1] += jnp.sum(dgr, axis=0)


def _fused_common(x, ts):
    t, b_rows, d = x.shape
    t_pad = ((t + ts - 1) // ts) * ts
    return t, b_rows, d, t_pad, t_pad // ts


def _fused_fwd_call(x, mask, wx, wh, b):
    ts = _pick_ts_fused(x.shape[1], x.shape[2], wh.shape[1])
    t, b_rows, d, t_pad, nb = _fused_common(x, ts)
    h_dim = wh.shape[1]
    gh = 4 * h_dim
    dt = x.dtype
    r = 2 * b_rows
    interpret = jax.default_backend() != "tpu"
    rev3 = lambda i: (nb - 1 - i, 0, 0)
    rev2 = lambda i: (nb - 1 - i, 0)
    ys, c_out, acts = pl.pallas_call(
        functools.partial(_fused_fwd_kernel, ts=ts, b_rows=b_rows, h_dim=h_dim),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((ts, b_rows, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, b_rows, d), rev3, memory_space=pltpu.VMEM),
            # masks ride as [T, B, 1] so the Mosaic-checked trailing dims
            # are (B, 1) — legal for any ts (a 2-D (ts, B) block is illegal
            # once the VMEM picker drops ts below 8)
            pl.BlockSpec((ts, b_rows, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, b_rows, 1), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, d, gh), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, gh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h_dim, gh), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ts, r, h_dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, r, h_dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, r, gh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, r, h_dim), dt),
            jax.ShapeDtypeStruct((t_pad, r, h_dim), dt),
            jax.ShapeDtypeStruct((t_pad, r, gh), dt),
        ),
        scratch_shapes=[
            pltpu.VMEM((r, h_dim), dt),
            pltpu.VMEM((r, h_dim), dt),
            pltpu.VMEM((ts, b_rows, gh), dt),
            pltpu.VMEM((ts, b_rows, gh), dt),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(100e6)),
        interpret=interpret,
    )(
        _pad_t(x, t_pad),
        _pad_t(x, t_pad),
        _pad_t(mask.astype(jnp.float32), t_pad)[..., None],
        _pad_t(mask.astype(jnp.float32), t_pad)[..., None],
        wx.astype(dt),
        b.astype(dt),
        wh.astype(dt),
    )
    return ys, c_out, acts


def _fused_bwd_call(x, mask, wx, wh, b, ys, c_out, acts, dy):
    ts = _pick_ts_fused(x.shape[1], x.shape[2], wh.shape[1])
    t, b_rows, d, t_pad, nb = _fused_common(x, ts)
    h_dim = wh.shape[1]
    gh = 4 * h_dim
    dt = x.dtype
    r = 2 * b_rows
    interpret = jax.default_backend() != "tpu"
    # bwd grid step ii processes time block i = nb-1-ii
    rev3 = lambda ii: (nb - 1 - ii, 0, 0)
    rev2 = lambda ii: (nb - 1 - ii, 0)
    idn3 = lambda ii: (ii, 0, 0)
    idn2 = lambda ii: (ii, 0)
    prev3 = lambda ii: (jnp.maximum(nb - 2 - ii, 0), 0, 0)  # block i-1 (clamped)
    dxf, dxr, dwx, dwh, db = pl.pallas_call(
        functools.partial(
            _fused_bwd_kernel, ts=ts, b_rows=b_rows, h_dim=h_dim, nb=nb
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((ts, b_rows, d), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, b_rows, d), idn3, memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, b_rows, 1), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, b_rows, 1), idn3, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, d, gh), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h_dim, gh), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, r, h_dim), rev3, memory_space=pltpu.VMEM),  # ys block i
            pl.BlockSpec((ts, r, h_dim), prev3, memory_space=pltpu.VMEM),  # ys block i-1
            pl.BlockSpec((ts, r, h_dim), rev3, memory_space=pltpu.VMEM),  # c block i
            pl.BlockSpec((ts, r, h_dim), prev3, memory_space=pltpu.VMEM),  # c block i-1
            pl.BlockSpec((ts, r, gh), rev3, memory_space=pltpu.VMEM),  # acts block i
            pl.BlockSpec((ts, r, h_dim), rev3, memory_space=pltpu.VMEM),  # dy
        ],
        out_specs=(
            pl.BlockSpec((ts, b_rows, d), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, b_rows, d), idn3, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, d, gh), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h_dim, gh), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, gh), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, b_rows, d), dt),
            jax.ShapeDtypeStruct((t_pad, b_rows, d), dt),
            jax.ShapeDtypeStruct((2, d, gh), jnp.float32),
            jax.ShapeDtypeStruct((2, h_dim, gh), jnp.float32),
            jax.ShapeDtypeStruct((2, gh), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((ts, b_rows, gh), dt),
            pltpu.VMEM((ts, b_rows, gh), dt),
            pltpu.VMEM((r, h_dim), jnp.float32),
            pltpu.VMEM((r, h_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(100e6)),
        interpret=interpret,
    )(
        _pad_t(x, t_pad),
        _pad_t(x, t_pad),
        _pad_t(mask.astype(jnp.float32), t_pad)[..., None],
        _pad_t(mask.astype(jnp.float32), t_pad)[..., None],
        wx.astype(dt),
        wh.astype(dt),
        ys,
        ys,
        c_out,
        c_out,
        acts,
        dy.astype(dt),
    )
    # dxr rows are already in ORIGINAL time order: the reversed stream's
    # dgates are stored at ts-1-j, undoing the in-block flip, and written
    # at the identity block index (= the x block the reversed stream read).
    dx = (dxf.astype(jnp.float32) + dxr.astype(jnp.float32))[:t]
    return dx, dwx, dwh, db


@jax.custom_vjp
def lstm_seq_fused(
    x: jnp.ndarray, mask: jnp.ndarray, wx: jnp.ndarray, wh: jnp.ndarray, b: jnp.ndarray
) -> jnp.ndarray:
    """Fused-projection bidirectional LSTM time loop.

    x:    [T, B, D] time-major inputs (shared by both directions).
    mask: [T, B] validity (contiguous prefix-true runs; zero initial state).
    wx:   [2, D, 4H], wh: [2, H, 4H], b: [2, 4H] — direction 0 forward,
          direction 1 backward (the kernel streams x a second time through
          a time-reversed index map).
    Returns ys [T_pad, 2B, H]: rows [0,B) = forward stream in original
    time; rows [B,2B) = backward stream in KERNEL time (callers flip over
    T_pad then slice [:T] — see ops/rnn.py bidir).
    """
    ys, _, _ = _fused_fwd_call(x, mask, wx, wh, b)
    return ys


def _fused_vjp_fwd(x, mask, wx, wh, b):
    ys, c_out, acts = _fused_fwd_call(x, mask, wx, wh, b)
    return ys, (x, mask, wx, wh, b, ys, c_out, acts)


def _fused_vjp_bwd(res, dy):
    x, mask, wx, wh, b, ys, c_out, acts = res
    dx, dwx, dwh, db = _fused_bwd_call(x, mask, wx, wh, b, ys, c_out, acts, dy)
    return (
        dx.astype(x.dtype),
        jnp.zeros_like(mask, jnp.float32),
        dwx.astype(wx.dtype),
        dwh.astype(wh.dtype),
        db.astype(b.dtype),
    )


lstm_seq_fused.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


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
