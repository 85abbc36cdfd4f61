"""Empirical per-step floor of the fused BiLSTM recurrence (round-5 verdict
item 1: the encoder sits at 101 of 182 ms with neither roofline binding —
build the LATENCY-bound speed-of-light model and find what the per-step
serial chain actually costs on this chip).

Measures, at the flagship per-step shape (R=2B=256 rows, H=320, GH=1280):

  1. chain-matmul:   h <- slice(h @ Wh)      — pure dependent-MXU chain
  2. chain-cell:     full LSTM cell math     — + VPU transcendentals
  3. the real lstm_seq_fused fwd / fwd+bwd   — + DMA streams + masks
  4. (optional) TS sweep of the real kernel

Each probe times TWO sequence lengths and reports the SLOPE (ms per step),
cancelling fixed dispatch/compile-cache effects.

    python tools/exp_rnn_floor.py [--batch 128] [--ts 8 16]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--hdim", type=int, default=320)
    ap.add_argument("--din", type=int, default=1280)
    ap.add_argument("--ts", type=int, nargs="*", default=[8])
    ap.add_argument("--t1", type=int, default=408)
    ap.add_argument("--t2", type=int, default=816)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from e2e_asr_tpu.ops import rnn as rnn_mod
    from e2e_asr_tpu.ops import rnn_pallas
    from e2e_asr_tpu.utils.cache import enable_compilation_cache
    from e2e_asr_tpu.utils.profiling import time_fn

    enable_compilation_cache()

    b = args.batch
    h_dim = args.hdim
    gh = 4 * h_dim
    r = 2 * b  # both directions ride the row axis, as in the real kernel
    b_rows = b
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    wh = jnp.asarray(rng.randn(2, h_dim, gh).astype(np.float32) * 0.05).astype(dt)

    # ---------------- probe kernels: no streamed IO, pure serial chain
    def chain_kernel(wh_ref, out_ref, h_scr, *, ts, cell):
        @pl.when(pl.program_id(0) == 0)
        def _():
            h_scr[:] = jnp.zeros_like(h_scr)

        whv = wh_ref[:]
        for _ in range(ts):
            h = h_scr[:]
            gates = rnn_pallas._hidden_matmul(h, whv, 2, b_rows)
            if cell == "matmul":
                # dependency only: no transcendentals, one cheap VPU op
                h2 = gates[:, :h_dim] * 0.999
            else:
                i = jax.nn.sigmoid(gates[:, :h_dim])
                f = jax.nn.sigmoid(gates[:, h_dim : 2 * h_dim])
                g = jnp.tanh(gates[:, 2 * h_dim : 3 * h_dim])
                o = jax.nn.sigmoid(gates[:, 3 * h_dim :])
                c2 = f * h.astype(jnp.float32) + i * g
                h2 = o * jnp.tanh(c2)
            h_scr[:] = h2.astype(h_scr.dtype)
        out_ref[:] = h_scr[:]

    def run_chain(t_steps, ts, cell):
        nb = (t_steps + ts - 1) // ts
        fn = pl.pallas_call(
            functools.partial(chain_kernel, ts=ts, cell=cell),
            grid=(nb,),
            in_specs=[pl.BlockSpec((2, h_dim, gh), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((r, h_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((r, h_dim), dt),
            scratch_shapes=[pltpu.VMEM((r, h_dim), dt)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(100e6)),
        )
        return jax.jit(lambda w: fn(w).astype(jnp.float32).sum())

    t1, t2 = args.t1, args.t2
    print(f"probe shape: rows={r} (2x{b}), H={h_dim}, GH={gh}, slope over T={t1}->{t2}")
    for cell in ("matmul", "lstm"):
        f1 = run_chain(t1, 8, cell)
        f2 = run_chain(t2, 8, cell)
        s1 = time_fn(f1, wh, iters=10)
        s2 = time_fn(f2, wh, iters=10)
        us = (s2 - s1) / (t2 - t1) * 1e6
        print(f"chain[{cell:6s}]: T={t1}: {s1*1e3:7.2f} ms  T={t2}: {s2*1e3:7.2f} ms  -> {us:6.2f} us/step")

    # ---------------- the real fused kernel (fwd and fwd+bwd), TS sweep
    d_in = args.din
    wx = jnp.asarray(rng.randn(2, d_in, gh).astype(np.float32) * 0.05).astype(dt)
    bias = jnp.zeros((2, gh), dt)

    def fused_fwd(t_steps):
        x = jnp.asarray(rng.randn(t_steps, b, d_in).astype(np.float32) * 0.1).astype(dt)
        mask = jnp.ones((t_steps, b), jnp.float32)
        fn = jax.jit(
            lambda xx, m, a, c, e: rnn_pallas.lstm_seq_fused(xx, m, a, c, e)
            .astype(jnp.float32)
            .sum()
        )
        return fn, (x, mask, wx, wh, bias)

    def fused_grad(t_steps):
        x = jnp.asarray(rng.randn(t_steps, b, d_in).astype(np.float32) * 0.1).astype(dt)
        mask = jnp.ones((t_steps, b), jnp.float32)

        def obj(xx, a, c, e):
            return rnn_pallas.lstm_seq_fused(xx, mask, a, c, e).astype(jnp.float32).sum()

        g = jax.jit(
            lambda xx, a, c, e: sum(
                jnp.sum(t.astype(jnp.float32))
                for t in jax.tree.leaves(jax.grad(obj, argnums=(0, 1, 2, 3))(xx, a, c, e))
            )
        )
        return g, (x, wx, wh, bias)

    for ts in args.ts:
        rnn_pallas.TS_FUSED = ts
        f1, a1 = fused_fwd(t1)
        f2, a2 = fused_fwd(t2)
        s1 = time_fn(f1, *a1, iters=5)
        s2 = time_fn(f2, *a2, iters=5)
        us = (s2 - s1) / (t2 - t1) * 1e6
        print(f"fused fwd  TS={ts:2d}: T={t1}: {s1*1e3:7.2f} ms  T={t2}: {s2*1e3:7.2f} ms  -> {us:6.2f} us/step")
        g1, b1_ = fused_grad(t1)
        g2, b2_ = fused_grad(t2)
        s1 = time_fn(g1, *b1_, iters=5)
        s2 = time_fn(g2, *b2_, iters=5)
        us = (s2 - s1) / (t2 - t1) * 1e6
        print(f"fused f+b  TS={ts:2d}: T={t1}: {s1*1e3:7.2f} ms  T={t2}: {s2*1e3:7.2f} ms  -> {us:6.2f} us/step")


if __name__ == "__main__":
    main()
