"""Pallas TPU kernel: CTC prefix-score recursion for beam search.

The Watanabe prefix recursion (decode/ctc_prefix.py) runs once per decoded
token inside the beam-search scan. As a `lax.scan` over encoder time it is
~400 sequential XLA while-loop iterations of tiny VPU work (~0.4 ms per
beam step at T=408); the closed cumlogsumexp form is worse still — XLA
lowers long-axis cumulative ops to O(T^2) reduce-window work on TPU
(measured 44 ms/step). This kernel runs the whole recursion as ONE
`pallas_call`: the [B*W*K] lattice row is elementwise across candidates,
so it is reshaped to [rows, 128] vector tiles, the forward variables live
in VMEM scratch across the entire time loop, and per-timestep inputs
stream in TS-sized blocks.

All masking is pre-folded outside the kernel (lp pre-masked to 0 and phi
to -inf past enc_len, so the recursion freezes by algebra); only the r^b
update needs the explicit validity stream (its r^n source term must be
gated, not just its emission).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1.0e30
TS = 16  # timesteps per grid step
LANES = 128


def _lse(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, NEG)
    out = m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe))
    return jnp.where(m > NEG / 2, out, NEG)


def _kernel(lpc_ref, phi_ref, lpb_ref, v_ref, rn_out, rb_out, psi_ref, rn_s, rb_s, *, ts):
    """Blockwise LOG-DEPTH formulation (round 5). The recursion

        rn_t = lse(rn_{t-1}, phi_t) + c_t

    is a linear log-space scan with INPUT phi (phi comes from the previous
    beam step, it is not a carry), so within a block it has the closed form

        rn_j = C_j + lse(rn_in, E_j),   C_j = sum_{u<=j} c_u,
        E_j  = lse-scan_{s<=j}(phi_s - C_{s-1})

    where C is a plain prefix sum and E an inclusive lse prefix scan —
    both Hillis-Steele, depth log2(ts), instead of ts serial lse rounds.
    rb has the same form over lpb with source g_j = v_j ? rn_{j-1} : -inf
    (available once the rn block is solved), and psi is a plain lse tree
    reduction.

    MEASURED OUTCOME (round 5, 960h shape B=16 W=16 S=764): neutral —
    332.7 vs 329.1 ms whole-beam; the kernel is HBM-BOUND, not
    latency-bound: it streams ~113 MB of [T, N] f32 per decode step
    (lpc/phi/lpb/v in + rn/rb out ≈ 230 GB/s sustained), so chain depth
    was never the limiter. Kept because the depth-log form costs nothing
    and pins the finding; the remaining prefix headroom is BYTES — lpb
    and v are per-utterance (not per-candidate) and could stream as
    [T, B] + in-kernel lane broadcast (-34% traffic), and bf16 inputs
    would halve the rest at a numerics cost. Semantics are exactly the
    serial recursion's (tests cover parity vs the lax.scan reference and
    brute-force prefix enumeration)."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        rn_s[:] = jnp.full_like(rn_s, NEG)
        rb_s[:] = jnp.full_like(rb_s, NEG)
        psi_ref[:] = jnp.full_like(psi_ref, NEG)

    lpc = [lpc_ref[j] for j in range(ts)]
    phi = [phi_ref[j] for j in range(ts)]
    lpb = [lpb_ref[j] for j in range(ts)]

    # C: inclusive prefix sums of lpc (cheap adds; Hillis-Steele)
    c_pre = list(lpc)
    k = 1
    while k < ts:
        for j in range(ts - 1, k - 1, -1):
            c_pre[j] = c_pre[j] + c_pre[j - k]
        k *= 2
    # E: inclusive lse prefix scan of d_j = phi_j - C_{j-1}
    e_scan = [phi[0]] + [phi[j] - c_pre[j - 1] for j in range(1, ts)]
    k = 1
    while k < ts:
        for j in range(ts - 1, k - 1, -1):
            e_scan[j] = _lse(e_scan[j], e_scan[j - k])
        k *= 2
    rn_in = rn_s[:]
    rn = [c_pre[j] + _lse(rn_in, e_scan[j]) for j in range(ts)]

    # rb: same closed form over lpb; source term gated by v
    g = [jnp.where(v_ref[0] > 0, rn_in, NEG)] + [
        jnp.where(v_ref[j] > 0, rn[j - 1], NEG) for j in range(1, ts)
    ]
    b_pre = list(lpb)
    k = 1
    while k < ts:
        for j in range(ts - 1, k - 1, -1):
            b_pre[j] = b_pre[j] + b_pre[j - k]
        k *= 2
    f_scan = [g[0]] + [g[j] - b_pre[j - 1] for j in range(1, ts)]
    k = 1
    while k < ts:
        for j in range(ts - 1, k - 1, -1):
            f_scan[j] = _lse(f_scan[j], f_scan[j - k])
        k *= 2
    rb_in = rb_s[:]
    rb = [b_pre[j] + _lse(rb_in, f_scan[j]) for j in range(ts)]

    # psi: lse tree reduction of phi_j + lpc_j
    acc = [phi[j] + lpc[j] for j in range(ts)]
    stride = 1
    while stride < ts:
        for j in range(0, ts - stride, 2 * stride):
            acc[j] = _lse(acc[j], acc[j + stride])
        stride *= 2
    psi_ref[:] = _lse(psi_ref[:], acc[0])

    for j in range(ts):
        rn_out[j] = rn[j]
        rb_out[j] = rb[j]
    rn_s[:] = rn[ts - 1]
    rb_s[:] = rb[ts - 1]


def prefix_recursion(
    lp_c: jnp.ndarray,
    phi_prev: jnp.ndarray,
    lp_b: jnp.ndarray,
    valid: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Advance the prefix forward variables over the whole time axis.

    lp_c, phi_prev: [T, N] candidate emission log-probs / phi(t-1), both
    already masked past enc_len (lp->0, phi->-inf). lp_b: [T, N] blank
    log-probs (masked to 0). valid: [T, N] 1/0. N is the flattened
    (batch, beam, candidate) axis. Returns (r_n [T,N], r_b [T,N], psi [N]).
    """
    t, n = lp_c.shape
    rows = (n + LANES - 1) // LANES
    n_pad = rows * LANES
    t_pad = ((t + TS - 1) // TS) * TS

    def prep(x, fill):
        x = jnp.pad(x, ((0, t_pad - t), (0, n_pad - n)), constant_values=fill)
        return x.reshape(t_pad, rows, LANES).astype(jnp.float32)

    interpret = jax.default_backend() != "tpu"
    rn, rb, psi = pl.pallas_call(
        functools.partial(_kernel, ts=TS),
        grid=(t_pad // TS,),
        in_specs=[
            pl.BlockSpec((TS, rows, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TS, rows, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TS, rows, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TS, rows, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TS, rows, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TS, rows, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), jnp.float32),
            pltpu.VMEM((rows, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(100e6)),
        interpret=interpret,
    )(
        prep(lp_c, 0.0),
        prep(phi_prev, NEG),
        prep(lp_b, 0.0),
        prep(valid, 0.0),
    )
    flat = lambda x: x.reshape(t_pad, n_pad)[:t, :n]
    return flat(rn), flat(rb), psi.reshape(n_pad)[:n]
