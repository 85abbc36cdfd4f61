"""Pallas TPU kernel: CTC forward-backward over the 2L+1 label lattice.

Replaces torch.nn.CTCLoss's cuDNN/ATen kernel (ref: bin/train_asr.py) with
a TPU-native design:

- The vocab-sized gather (logits -> lattice emissions lp_ext[B,T,S]) and the
  gradient scatter back to [B,T,V] are XLA ops outside the kernel — they're
  memory-layout work XLA already does well.
- The kernel itself is pure lattice recursion, one grid step per utterance:
  alpha rows forward, then beta rows backward *in place over the alpha
  buffer*, leaving gamma = alpha + beta - logZ, from which the analytic
  gradient d nll / d lp_ext = -exp(gamma) follows. Rows are [1, S_pad]
  vectors; the s-1/s-2 (and s+1/s+2) lattice shifts are lane rolls.
- `jax.custom_vjp` wires the analytic gradient so the T-step scan never
  appears in autodiff (no O(T) residual stack beyond the gamma buffer).

Conventions match ops/ctc.py (blank=0, per-utterance nll summed over the
sequence, +inf for infeasible alignments); tests assert parity with the
lax.scan reference and torch.nn.CTCLoss including gradients.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from e2e_asr_tpu.ops.ctc import extend_labels

# scoped-VMEM ceiling passed to the Mosaic compiler for this kernel; the
# batch-chunk heuristic in _ctc_pallas_raw budgets against THIS constant
_VMEM_LIMIT_BYTES = int(100e6)

NEG = -1.0e30
BIG = 1.0e29  # nll threshold meaning "infeasible"


def _lse(*xs):
    m = xs[0]
    for x in xs[1:]:
        m = jnp.maximum(m, x)
    m_safe = jnp.maximum(m, NEG)
    s = sum(jnp.exp(x - m_safe) for x in xs)
    return jnp.where(m > NEG / 2, m_safe + jnp.log(s), NEG)


def _roll_right(row, k, lane_iota):
    """row [1, S]: out[s] = row[s-k], NEG-filled at s < k."""
    return jnp.where(lane_iota >= k, pltpu.roll(row, shift=k, axis=1), NEG)


def _roll_left(row, k, lane_iota, s_pad):
    """row [1, S]: out[s] = row[s+k], NEG-filled at s >= S-k."""
    return jnp.where(lane_iota < s_pad - k, pltpu.roll(row, shift=s_pad - k, axis=1), NEG)


def _kernel(inlen_ref, lablen_ref, lp_ext_ref, skip_ref, nll_ref, gamma_ref, *, t_len, s_pad, bc):
    """One grid step handles a chunk of `bc` utterances: every time-step op
    is a full [bc, S_pad] VPU vector op (batch on sublanes, lattice on
    lanes) — per-utterance length variation is handled by per-row masks,
    not control flow."""
    # length vectors arrive as the FULL [b, 1] arrays (a (bc, 1) block is
    # Mosaic-illegal when bc < 8); slice this grid step's chunk by pid
    pid = pl.program_id(0)
    inlen = inlen_ref[pl.ds(pid * bc, bc), :]  # [bc, 1] i32
    lablen = lablen_ref[pl.ds(pid * bc, bc), :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (bc, s_pad), 1)
    skip = skip_ref[:, 0, :]  # [bc, S] 1.0 where the s-2 skip transition is legal
    neg = jnp.full((bc, s_pad), NEG, jnp.float32)
    end = 2 * lablen  # [bc, 1]

    # ---------------- forward: alpha rows, written into gamma buffer
    lp0 = lp_ext_ref[:, 0, :]
    start_ok = (lane == 0) | ((lane == 1) & (lablen > 0))
    alpha0 = jnp.where(start_ok, lp0, NEG)
    gamma_ref[:, 0, :] = jnp.where(inlen > 0, alpha0, neg)

    def fwd_body(t, alpha):
        lp_t = lp_ext_ref[:, t, :]
        a1 = _roll_right(alpha, 1, lane)
        a2 = jnp.where(skip > 0, _roll_right(alpha, 2, lane), NEG)
        new = _lse(alpha, a1, a2) + lp_t
        live = t < inlen  # [bc, 1] per-row freeze
        gamma_ref[:, t, :] = jnp.where(live, new, neg)
        return jnp.where(live, new, alpha)

    alpha_last = jax.lax.fori_loop(1, t_len, fwd_body, alpha0)

    # ---------------- logZ from alpha at t = inlen-1, s in {2L, 2L-1}
    pick_end = jnp.max(jnp.where(lane == end, alpha_last, NEG), axis=1, keepdims=True)
    pick_pre = jnp.max(
        jnp.where((lane == end - 1) & (lablen > 0), alpha_last, NEG), axis=1, keepdims=True
    )
    log_z = _lse(pick_end, pick_pre)  # [bc, 1]
    nll_ref[pl.ds(pid * bc, bc), :] = -log_z

    # ---------------- backward: beta rows; gamma = alpha + beta - logZ.
    # Absolute-time loop t = T-2 .. 0 for the whole chunk; rows freeze to
    # beta_init until t passes their inlen-1.
    beta_init = jnp.where((lane == end) | ((lane == end - 1) & (lablen > 0)), 0.0, NEG)
    skip_at_s2 = _roll_left(jnp.where(skip > 0, 0.0, NEG), 2, lane, s_pad)

    # rows whose last valid frame IS t_len-1 never enter the loop below
    last = gamma_ref[:, t_len - 1, :]
    gamma_ref[:, t_len - 1, :] = jnp.where(
        inlen == t_len, last + beta_init - log_z, last
    )

    def bwd_body(i, beta):
        t = t_len - 2 - i
        lp_t1 = lp_ext_ref[:, t + 1, :]
        bt = beta + lp_t1  # beta_tilde[s] = beta[t+1, s] + lp[t+1, s]
        b1 = _roll_left(bt, 1, lane, s_pad)
        b2 = _roll_left(bt, 2, lane, s_pad) + skip_at_s2
        new_beta = _lse(bt, b1, b2)
        beta_t = jnp.where(t <= inlen - 2, new_beta, beta_init)
        cur = gamma_ref[:, t, :]  # alpha row (bwd walks t descending)
        gamma_ref[:, t, :] = jnp.where(t <= inlen - 1, cur + beta_t - log_z, cur)
        return beta_t

    jax.lax.fori_loop(0, t_len - 1, bwd_body, beta_init)


def _ctc_pallas_raw(
    lp_ext: jnp.ndarray,
    skip: jnp.ndarray,
    input_len: jnp.ndarray,
    label_len: jnp.ndarray,
    batch_chunk: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """lp_ext [B, T, S_pad], skip [B, 1, S_pad] -> (nll [B], gamma [B, T, S_pad]).

    Batch is processed in chunks of `batch_chunk` rows per grid step (VMEM
    budget: ~2 * chunk*T*S_pad floats); padded rows get inlen=0 => inf nll,
    sliced off by the caller.
    """
    b0 = lp_ext.shape[0]
    bc = batch_chunk
    # VMEM-aware chunk: the lp_ext input block and gamma output block are
    # each double-buffered across grid steps => ~4 * bc * T * S_pad floats
    # of scoped VMEM. The default bc=8 first overflows the ~95 MB scoped
    # limit at the 960h recipe's big bucket (T=768, S_pad=1152: 113 MB);
    # halving bc trades grid steps for fit, which the recursion-bound
    # kernel barely notices.
    per_row = 4 * lp_ext.shape[1] * lp_ext.shape[2] * 4
    # Heuristic budget derived from the kernel's compiler VMEM limit below
    # (single constant, cannot drift): leave ~12% headroom for the lengths
    # blocks + Mosaic bookkeeping. E2E_CTC_VMEM_LIMIT is a TRACE-TIME test
    # hook: the chosen bc is baked into the jit-cached executable (cache key
    # is shapes only), so changing the env var after a shape has compiled
    # in this process has no effect on that shape.
    limit = float(os.environ.get("E2E_CTC_VMEM_LIMIT", _VMEM_LIMIT_BYTES * 0.88))
    while bc > 1 and bc * per_row > limit:
        bc //= 2
    b = ((b0 + bc - 1) // bc) * bc
    if b != b0:
        pad = ((0, b - b0),)
        lp_ext = jnp.pad(lp_ext, pad + ((0, 0), (0, 0)))
        skip = jnp.pad(skip, pad + ((0, 0), (0, 0)))
        input_len = jnp.pad(input_len, pad)
        label_len = jnp.pad(label_len, pad)
    _, t_len, s_pad = lp_ext.shape
    interpret = jax.default_backend() != "tpu"
    nll, gamma = pl.pallas_call(
        functools.partial(_kernel, t_len=t_len, s_pad=s_pad, bc=bc),
        grid=(b // bc,),
        in_specs=[
            # lengths ride as FULL [b, 1] arrays: (bc, 1) blocks violate
            # Mosaic's (8, 128)-divisibility once the VMEM-aware chunk
            # drops below 8; the kernel slices its rows by program_id
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, t_len, s_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, 1, s_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, t_len, s_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, t_len, s_pad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES,
        ),
        interpret=interpret,
    )(
        input_len.astype(jnp.int32).reshape(b, 1),
        label_len.astype(jnp.int32).reshape(b, 1),
        lp_ext.astype(jnp.float32),
        skip.astype(jnp.float32),
    )
    return nll[:b0, 0], gamma[:b0]


def _prepare(log_probs, labels):
    """Lattice emissions + skip mask (XLA side).

    vocab->lattice routing is a one-hot matmul, not a gather/scatter: the
    extended labels repeat blank S/2 times, and TPU scatter-add serializes
    on duplicate indices (~8x the whole kernel's cost when measured); the
    [T,V]x[V,S] einsum is trivial MXU work and its transpose gives the
    gradient routing for free.
    """
    b, t_len, v = log_probs.shape
    ext = extend_labels(labels)  # [B, S]
    s = ext.shape[1]
    s_pad = ((s + 127) // 128) * 128
    ext_p = jnp.pad(ext, ((0, 0), (0, s_pad - s)))
    onehot = (ext_p[:, :, None] == jnp.arange(v)[None, None, :]).astype(jnp.float32)
    lp_ext = jnp.einsum(
        "btv,bsv->bts", log_probs.astype(jnp.float32), onehot,
        precision=jax.lax.Precision.HIGHEST,
    )
    sidx = np.arange(s_pad)[None, :]
    prev2 = jnp.pad(ext_p, ((0, 0), (2, 0)))[:, :s_pad]
    skip = ((sidx >= 2) & (ext_p != 0) & (ext_p != prev2) & (sidx < s)).astype(jnp.float32)
    # pad T to sublane multiple of 8 for clean VMEM blocks
    t_pad = ((t_len + 7) // 8) * 8
    if t_pad != t_len:
        lp_ext = jnp.pad(lp_ext, ((0, 0), (0, t_pad - t_len), (0, 0)))
    return lp_ext, skip[:, None, :], onehot, t_len


@jax.custom_vjp
def ctc_loss_pallas(log_probs, input_len, labels, label_len):
    """Per-utterance CTC nll [B]; analytic gradient; +inf when infeasible."""
    lp_ext, skip, _, _ = _prepare(log_probs, labels)
    nll, _ = _ctc_pallas_raw(lp_ext, skip, input_len, label_len)
    return jnp.where(nll > BIG, jnp.inf, nll)


def _fwd(log_probs, input_len, labels, label_len):
    lp_ext, skip, onehot, _ = _prepare(log_probs, labels)
    nll, gamma = _ctc_pallas_raw(lp_ext, skip, input_len, label_len)
    return jnp.where(nll > BIG, jnp.inf, nll), (gamma, onehot, nll, log_probs.shape)


def _bwd(res, ct):
    gamma, onehot, nll, shape = res
    b, t_len, v = shape
    # d nll / d lp_ext = -exp(gamma); kill grads of infeasible utterances
    ok = (nll <= BIG)[:, None, None]
    g = jnp.where(ok, -jnp.exp(gamma[:, :t_len, :]), 0.0)  # [B, T, S_pad]
    g = g * ct[:, None, None]
    # transpose of the emission routing: lattice -> vocab via MXU
    grad_lp = jnp.einsum("bts,bsv->btv", g, onehot, precision=jax.lax.Precision.HIGHEST)
    return grad_lp, None, None, None


ctc_loss_pallas.defvjp(_fwd, _bwd)
