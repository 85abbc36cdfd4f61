"""Stage-by-stage breakdown of the flagship train step (value+grad) to
target optimization work: frontend, encoder, attention-decoder scan, CTC
lattice, optimizer update — each timed as its own jitted program at the
bench shapes.

    python tools/profile_trainstep.py [--batch 128] [--frames 1632]
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
    ap.add_argument("--label", type=int, default=160)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from e2e_asr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from e2e_asr_tpu.config import Config
    from e2e_asr_tpu.models import asr as asr_mod
    from e2e_asr_tpu.ops.ctc import ctc_loss
    from e2e_asr_tpu.ops.frontend import compute_features
    from e2e_asr_tpu.optim import build_optimizer
    from e2e_asr_tpu.training.step import TrainState, compute_loss, make_train_step
    from e2e_asr_tpu.utils.profiling import time_fn

    cfg = Config.from_dict(
        {
            "data": {"audio": {"feat_dim": 40, "use_pallas": True}},
            "hparas": {"optimizer": "Adadelta", "lr": 1.0, "dtype": "bfloat16"},
            "model": {
                "ctc_weight": 0.5,
                "encoder": {
                    "prenet": "vgg",
                    "dim": [320] * 4,
                    "dropout": [0.0] * 4,
                    "layer_norm": [False] * 4,
                    "proj": [True] * 4,
                    "sample_rate": [1, 1, 1, 1],
                    "sample_style": "drop",
                },
                "attention": {"mode": "location", "dim": 300, "num_head": 1,
                              "loc_kernel_size": 100, "loc_kernel_num": 10},
                "decoder": {"dim": 320, "layer": 1},
            },
        }
    )
    b, tf_, l = args.batch, args.frames, args.label
    n = tf_ * 160 + 240
    vocab = 31
    rng = np.random.RandomState(0)
    wav = jnp.asarray((rng.randn(b, n) * 0.1).astype(np.float32))
    wl = jnp.asarray(np.full(b, n, np.int32))
    text = np.zeros((b, l), np.int32)
    text[:, : l - 1] = rng.randint(3, vocab, (b, l - 1))
    text[:, l - 1] = 1
    text = jnp.asarray(text)
    tl = jnp.asarray(np.full(b, l, np.int32))
    params, _ = asr_mod.asr_init(jax.random.PRNGKey(0), 40, vocab, cfg.model)
    key = jax.random.PRNGKey(0)

    # full step
    tx = build_optimizer(cfg.hparas)
    state = TrainState(params, tx.init(params), jnp.asarray(0, jnp.int32))
    step = jax.jit(make_train_step(cfg, tx))
    batch = {"wav": wav, "wav_len": wl, "text": text, "text_len": tl}
    sec_full = time_fn(lambda s, bt: step(s, bt, key)[1]["loss"], state, batch, iters=5)
    print(f"full train step:          {sec_full*1e3:8.1f} ms")

    # per-stage speed-of-light table (shared with bench.py stages stage)
    from e2e_asr_tpu.utils import stages as stages_mod

    measured = stages_mod.measure_stages(cfg, b, tf_, l, vocab, iters=5)
    rep = stages_mod.stage_report(cfg, b, tf_, l, vocab, measured)
    print(f"{'stage':<14} {'ms':>8} {'ceiling':>8} {'sol':>6}  bound")
    for k, v in rep.items():
        print(f"{k:<14} {v['ms']:>8.1f} {v['ceiling_ms']:>8.1f} {v['sol']:>6.2f}  {v['bound']}")

    # optimizer update alone (HBM roofline; mostly overlapped inside the
    # fused step — the standalone number carries the dispatch floor)
    grads = jax.tree.map(lambda x: jnp.full_like(x, 1e-4), params)
    upd = jax.jit(lambda g, s, p: tx.update(g, s, p)[0])
    sec = time_fn(lambda g, s, p: jax.tree.leaves(upd(g, s, p))[0].sum(), grads, state.opt_state, params, iters=5)
    n_par = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    ceil_ms = 7 * n_par * 4 / stages_mod.HBM_PEAK * 1e3
    print(f"optimizer update:         {sec*1e3:8.1f} ms (HBM ceiling {ceil_ms:.1f} ms, {n_par/1e6:.1f}M params)")


if __name__ == "__main__":
    main()
