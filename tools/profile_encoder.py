"""Encoder sub-stage breakdown at bench shapes: VGG convs vs input
projections vs the Pallas recurrence (fwd and fwd+bwd each).

    python tools/profile_encoder.py [--batch 128] [--frames 1632]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--frames", type=int, default=1632)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from e2e_asr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from e2e_asr_tpu.models import encoder as enc_mod
    from e2e_asr_tpu.ops import rnn as rnn_mod
    from e2e_asr_tpu.utils.profiling import time_fn

    b, tf_ = args.batch, args.frames
    mel = 40
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(b, tf_, mel).astype(np.float32)).astype(jnp.bfloat16)
    feat_len = jnp.asarray(np.full(b, tf_, np.int32))

    def _vg(f):
        def g(*a):
            v, gr = jax.value_and_grad(f)(*a)
            return v + sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(gr))
        return g

    # ---- VGG alone
    pv = enc_mod.vgg_init(jax.random.PRNGKey(0), mel)[0]
    vgg_f = jax.jit(lambda p, x: enc_mod.vgg_apply(p, x, feat_len)[0].astype(jnp.float32).sum())
    sec = time_fn(vgg_f, pv, feat, iters=5)
    print(f"vgg fwd:            {sec*1e3:8.1f} ms")
    vgg_g = jax.jit(_vg(lambda px: enc_mod.vgg_apply(px[0], px[1], feat_len)[0].astype(jnp.float32).sum()))
    sec = time_fn(vgg_g, (pv, feat), iters=5)
    print(f"vgg fwd+bwd:        {sec*1e3:8.1f} ms")

    # ---- one BiLSTM layer at post-VGG shapes (T=408, in=1280 first / 640 later, H=320)
    t, h = tf_ // 4, 320
    lens = jnp.asarray(np.full(b, t, np.int32))
    for d_in, tag in ((1280, "layer1 (in=1280)"), (640, "layer2-4 (in=640)")):
        x = jnp.asarray(rng.randn(b, t, d_in).astype(np.float32)).astype(jnp.bfloat16)
        r2 = np.random.RandomState(1)
        wf = rnn_mod.LSTMWeights(
            jnp.asarray(r2.randn(d_in, 4 * h).astype(np.float32) * 0.05).astype(jnp.bfloat16),
            jnp.asarray(r2.randn(h, 4 * h).astype(np.float32) * 0.05).astype(jnp.bfloat16),
            jnp.asarray(np.zeros(4 * h, np.float32)).astype(jnp.bfloat16),
        )
        wb = jax.tree.map(lambda a: a + 0.01, wf)

        for impl in ("pallas", "scan"):
            f = jax.jit(lambda xx, wff, wbb, impl=impl: rnn_mod.bidir(
                xx, lens, wff, wbb, impl=impl).astype(jnp.float32).sum())
            sec = time_fn(f, x, wf, wb, iters=5)
            print(f"bidir {tag} {impl:6s} fwd:     {sec*1e3:8.1f} ms")
            g = jax.jit(_vg(lambda a, impl=impl: rnn_mod.bidir(
                a[0], lens, a[1], a[2], impl=impl).astype(jnp.float32).sum()))
            sec = time_fn(g, (x, wf, wb), iters=5)
            print(f"bidir {tag} {impl:6s} fwd+bwd: {sec*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
