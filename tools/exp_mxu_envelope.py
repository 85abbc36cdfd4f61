"""Settle the MXU envelope question (round 5): the round-1 "measured
77 bf16 TF/s" came from timing one 8k-cube dispatch through the axon
tunnel; the fused-LSTM per-step slope implies ~200+ TF/s in-kernel. Time a
CHAIN of dependent big matmuls inside ONE jitted program so dispatch and
transfer amortize, giving the true sustained MXU rate.

    python tools/exp_mxu_envelope.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from e2e_asr_tpu.utils.cache import enable_compilation_cache
    from e2e_asr_tpu.utils.profiling import time_fn

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    for n, iters in ((4096, 32), (2048, 64)):
        a = jnp.asarray(rng.randn(n, n).astype(np.float32) * 0.05).astype(jnp.bfloat16)
        w = jnp.asarray(rng.randn(n, n).astype(np.float32) * 0.05).astype(jnp.bfloat16)

        def chain(a, w, iters=iters):
            def body(x, _):
                # renormalize cheaply so values stay finite over the chain
                y = (x @ w) * 0.015
                return y, ()
            y, _ = jax.lax.scan(body, a, None, length=iters)
            return y.astype(jnp.float32).sum()

        f = jax.jit(chain)
        sec = time_fn(f, a, w, iters=3)
        fl = 2 * n * n * n * iters
        print(f"xla  chain {n}^3 x{iters}: {sec*1e3:8.2f} ms -> {fl/sec/1e12:6.1f} TF/s")
    # HBM stream inside one program: big copy via scan of adds
    m = jnp.asarray(rng.randn(64, 1024, 1024).astype(np.float32))  # 256 MB f32

    def stream(x):
        return (x * 1.000001 + 0.000001).sum()

    f = jax.jit(stream)
    sec = time_fn(f, m, iters=5)
    byts = m.size * 4 * 1  # one read (sum output tiny)
    print(f"hbm read 256MB: {sec*1e3:8.2f} ms -> {byts/sec/1e9:6.1f} GB/s")


if __name__ == "__main__":
    main()
