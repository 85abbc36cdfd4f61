"""Pallas TPU kernel: one location-attention step for W beams per utterance.

Why: beam decode is HBM-bound (tools/profile_beam.py, round-4): with XLA,
every decode step materializes the location-feature projection
[B*W, S, Dk] in HBM and re-reads k alongside it, and the additive-energy
tanh streams those tensors back in — ~60-160 MB per step at the flagship
shape. This kernel computes location features, additive energies, the
masked softmax and the context reduction entirely in VMEM per batch tile:
HBM traffic per step drops to one read of k/v/locT per utterance
(~17 MB at B=16, S=512) plus tiny q/prev_att/align/ctx streams.

Scope (mirrors ops/decoder_pallas.py's flagship gate): location mode,
num_head=1, no v_proj, no merge. The scan-level training kernel
(decoder_pallas) keeps k/v resident across ALL steps but cannot host the
beam's between-step top-k/prune; this per-step kernel is the decode-side
complement — beam plumbing stays in XLA, only the memory-bound attention
math moves into VMEM.

No VJP: decode only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1.0e9


def _cdiv(a, b):
    return -(-a // b)


def _pad_axis(x, n, axis):
    if x.shape[axis] == n:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, pads)


def _kernel(
    q_ref,      # [W, bB, Dk]
    pa_ref,     # [W, bB, S] previous alignment
    k_ref,      # [bB, S, Dk]
    v_ref,      # [bB, S, E]
    mask_ref,   # [bB, S] f32
    locT_ref,   # [K, P, S]
    wlp_ref,    # [K, Dk]
    locv_ref,   # [1, Dk]
    locb_ref,   # [1, Dk] (loc_b + conv-bias fold)
    align_ref,  # [W, bB, S] out
    ctx_ref,    # [W, bB, E] out
    fpre_scr,   # [K, bB, S] f32 scratch
    *, kk, w_beams, temp,
):
    f32 = jnp.float32
    mask = mask_ref[:] > 0
    bb, s = mask_ref.shape

    def mm(a, bmat, dims=(((1,), (0,)), ((), ()))):
        return jax.lax.dot_general(
            a, bmat, dimension_numbers=dims, preferred_element_type=f32
        )

    k = k_ref[:].astype(f32)
    v = v_ref[:].astype(f32)
    locb = locb_ref[0].astype(f32)
    locv = locv_ref[0].astype(f32)

    def beam_body(w, _):
        att_prev = pa_ref[w].astype(f32)  # [bB, S]

        # location features: per-channel banded matmul into scratch (leading
        # -axis dynamic ref indexing; same pattern as decoder_pallas), then
        # one [K, bB*S] x [K, Dk] MXU contraction
        def loc_body(ki, _):
            fpre_scr[ki] = mm(att_prev, locT_ref[ki].astype(f32))
            return 0

        jax.lax.fori_loop(0, kk, loc_body, 0)
        f = mm(
            fpre_scr[:].reshape(kk, bb * s), wlp_ref[:].astype(f32),
            (((0,), (0,)), ((), ())),
        ).reshape(bb, s, -1)

        q = q_ref[w].astype(f32)  # [bB, Dk]
        e = jnp.tanh(k + q[:, None, :] + f + locb[None, None])
        energy = jnp.sum(e * locv[None, None, :], axis=-1)  # [bB, S]
        energy = jnp.where(mask, energy, NEG)
        align = jax.nn.softmax(energy / temp, axis=-1)
        align = jnp.where(mask, align, 0.0)
        align_ref[w] = align.astype(align_ref.dtype)
        ctx_ref[w] = jnp.sum(align[:, :, None] * v, axis=1).astype(ctx_ref.dtype)
        return 0

    jax.lax.fori_loop(0, w_beams, beam_body, 0)


VMEM_BUDGET = 90 << 20  # leave headroom under the 100M scoped limit below


def _fits(bb: int, s: int, dk: int, e_dim: int, kk: int) -> bool:
    """Rough per-cell VMEM: k/v blocks double-buffered (grid-streamed),
    locT resident, f32 e/f intermediates + fpre scratch."""
    kv = 2 * 2 * bb * s * (dk + e_dim)  # bf16, double-buffered
    loct = 2 * kk * s * s
    inter = 2 * 4 * bb * s * dk  # e and f in f32
    scr = 4 * kk * bb * s
    return kv + loct + inter + scr + (8 << 20) < VMEM_BUDGET


def _pick_bb(b: int, s: int, dk: int, e_dim: int, kk: int) -> int:
    # Mosaic requires the second-to-last block dim be divisible by 8 or
    # equal to the full array dim (q/pa blocks are [W, bb, *]), so tiles
    # must be multiples of 8; odd batches run as one full-batch cell.
    cands = [c for c in (16, 8) if b % c == 0 and c <= b]
    for cand in cands:
        if _fits(cand, s, dk, e_dim, kk):
            return cand
    return min(cands) if cands else b


@functools.partial(jax.jit, static_argnames=("temp", "interpret"))
def att_step_beam_loc(
    q: jnp.ndarray,        # [B, W, Dk] (post proj_q, incl. bias)
    prev_att: jnp.ndarray, # [B, W, S0]
    k: jnp.ndarray,        # [B, S0, Dk]
    v: jnp.ndarray,        # [B, S0, E]
    enc_len: jnp.ndarray,  # [B]
    locT: jnp.ndarray,     # [K, P0, S0] (toeplitz bank, head squeezed)
    wlp: jnp.ndarray,      # [K, Dk]
    locv: jnp.ndarray,     # [Dk]
    locb: jnp.ndarray,     # [Dk] = loc_b + loc_conv.b @ wlp
    temp: float = 1.0,
    interpret: bool = False,
):
    """Returns (align [B, W, S0], ctx [B, W, E])."""
    b, w, dk = q.shape
    s0 = k.shape[1]
    e_dim = v.shape[2]
    kk = locT.shape[0]
    s = _cdiv(s0, 128) * 128  # Mosaic wants lane-aligned S (decoder_pallas)
    dt = k.dtype

    k_p = _pad_axis(k, s, 1)
    v_p = _pad_axis(v, s, 1)
    pa = _pad_axis(jnp.moveaxis(prev_att, 0, 1), s, 2).astype(dt)  # [W,B,S]
    qt = jnp.moveaxis(q, 0, 1).astype(dt)  # [W,B,Dk]
    locT_p = _pad_axis(_pad_axis(locT, s, 1), s, 2).astype(dt)
    mask = (jnp.arange(s)[None, :] < enc_len[:, None]).astype(jnp.float32)

    bb = _pick_bb(b, s, dk, e_dim, kk)
    grid = (b // bb,)
    out = pl.pallas_call(
        functools.partial(_kernel, kk=kk, w_beams=w, temp=float(temp)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((w, bb, dk), lambda i: (0, i, 0)),
            pl.BlockSpec((w, bb, s), lambda i: (0, i, 0)),
            pl.BlockSpec((bb, s, dk), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, s, e_dim), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, s), lambda i: (i, 0)),
            pl.BlockSpec((kk, s, s), lambda i: (0, 0, 0)),
            pl.BlockSpec((kk, dk), lambda i: (0, 0)),
            pl.BlockSpec((1, dk), lambda i: (0, 0)),
            pl.BlockSpec((1, dk), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((w, bb, s), lambda i: (0, i, 0)),
            pl.BlockSpec((w, bb, e_dim), lambda i: (0, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((w, b, s), dt),
            jax.ShapeDtypeStruct((w, b, e_dim), dt),
        ],
        scratch_shapes=[pltpu.VMEM((kk, bb, s), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(100e6)),
        interpret=interpret,
    )(
        qt, pa, k_p, v_p, mask, locT_p,
        wlp.astype(dt), locv.reshape(1, -1).astype(dt), locb.reshape(1, -1).astype(dt),
    )
    align, ctx = out
    return (
        jnp.moveaxis(align, 0, 1)[:, :, :s0],  # [B, W, S0]
        jnp.moveaxis(ctx, 0, 1),  # [B, W, E]
    )


def supported(cfg, params) -> bool:
    """Flagship decode attention only (same envelope as decoder_pallas)."""
    return (
        cfg.mode == "location"
        and cfg.num_head == 1
        and "proj_v" not in params
        and "merge" not in params
    )
