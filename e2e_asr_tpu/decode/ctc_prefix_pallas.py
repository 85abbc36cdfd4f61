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
    @pl.when(pl.program_id(0) == 0)
    def _():
        rn_s[:] = jnp.full_like(rn_s, NEG)
        rb_s[:] = jnp.full_like(rb_s, NEG)
        psi_ref[:] = jnp.full_like(psi_ref, NEG)

    for j in range(ts):
        lp_c = lpc_ref[j]
        phi = phi_ref[j]
        rn_p, rb_p = rn_s[:], rb_s[:]
        rn_t = _lse(rn_p, phi) + lp_c
        rb_t = _lse(rb_p, jnp.where(v_ref[j] > 0, rn_p, NEG)) + lpb_ref[j]
        psi_ref[:] = _lse(psi_ref[:], phi + lp_c)
        rn_s[:] = rn_t
        rb_s[:] = rb_t
        rn_out[j] = rn_t
        rb_out[j] = rb_t


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
