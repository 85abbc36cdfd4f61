"""Compile-and-time the 960h recipe's BIG bucket (round-3 verdict item 6).

configs/libri/asr_960h.yaml ships a 3056-frame bucket (enc S=764 post-VGG,
token bucket 520, HALF_BATCHSIZE rule => B=16) that no test or bench stage
ever compiled. This tool builds the flagship model at exactly that shape,
compiles + runs the train step and the beam decode step, and prints
ms/step + audio-s/s/chip + compile wall — the numbers BASELINE.md records.

Run on the TPU host:  python tools/time_960h_bucket.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16000
FRAMES = 3056
N = FRAMES * 160 + 240
B = 16  # batch 32 halved by the half_batch_len=800 rule
L = 520
VOCAB = 31


def main():
    import jax
    import jax.numpy as jnp

    from e2e_asr_tpu.config import Config, DecodeConfig
    from e2e_asr_tpu.decode.beam import beam_search
    from e2e_asr_tpu.models import asr as asr_mod
    from e2e_asr_tpu.optim import build_optimizer
    from e2e_asr_tpu.ops.frontend import compute_features
    from e2e_asr_tpu.parallel import mesh as mesh_mod
    from e2e_asr_tpu.training.step import TrainState, make_train_step
    from e2e_asr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config.load("configs/libri/asr_960h.yaml")
    cfg.data.audio.use_pallas = True

    mesh = mesh_mod.make_mesh(dp=-1, mp=1)
    params, _ = asr_mod.asr_init(jax.random.PRNGKey(0), cfg.data.audio.feat_dim, VOCAB, cfg.model)
    tx = build_optimizer(cfg.hparas)
    state = TrainState(params, tx.init(params), jnp.asarray(0, jnp.int32))
    state = jax.device_put(state, mesh_mod.replicated(mesh))
    step = jax.jit(make_train_step(cfg, tx), donate_argnums=(0,), static_argnums=(3,))

    rng = np.random.RandomState(0)
    text = np.zeros((B, L), np.int32)
    text[:, : L - 1] = rng.randint(3, VOCAB, size=(B, L - 1))
    text[:, L - 1] = 1
    batch = mesh_mod.shard_batch(
        mesh,
        {
            "wav": (rng.randn(B, N) * 0.1).astype(np.float32),
            "wav_len": np.full((B,), N, np.int32),
            "text": text,
            "text_len": np.full((B,), L, np.int32),
        },
    )
    print(f"960h big bucket: B={B}, {FRAMES} frames (~{N/SR:.1f}s), L={L}", flush=True)

    t0 = time.time()
    state, m = step(state, batch, jax.random.PRNGKey(0), 0)
    float(m["loss"])
    t_compile = time.time() - t0
    print(f"train step compile+first: {t_compile:.1f}s", flush=True)

    iters = 5
    best = float("inf")
    for trial in range(2):
        t0 = time.time()
        for i in range(iters):
            state, m = step(state, batch, jax.random.fold_in(jax.random.PRNGKey(1), i), 0)
        float(m["loss"])
        best = min(best, (time.time() - t0) / iters)
    thr = B * N / SR / best
    print(f"train step: {best*1e3:.1f} ms  ({thr:.0f} audio-s/s/chip)", flush=True)

    # beam decode at the recipe's decode settings
    dcfg = DecodeConfig(
        beam_size=cfg.decode.beam_size, ctc_weight=0.3, lm_weight=0.0,
        max_len_ratio=cfg.decode.max_len_ratio,
    )
    max_step = max(8, int(dcfg.max_len_ratio * (FRAMES // 4)))
    feat, feat_len = jax.jit(lambda w, l: compute_features(w, l, cfg.data.audio))(
        jnp.asarray((rng.randn(B, N) * 0.1).astype(np.float32)),
        jnp.asarray(np.full(B, N, np.int32)),
    )
    feat = feat.astype(jnp.bfloat16)
    params_live = state.params
    fn = jax.jit(
        lambda f, fl: beam_search(params_live, cfg.model, dcfg, f, fl, max_step).scores.sum()
    )
    t0 = time.time()
    float(fn(feat, feat_len))
    t_dc = time.time() - t0
    print(f"beam W={dcfg.beam_size} max_step={max_step} compile+first: {t_dc:.1f}s", flush=True)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        s = fn(feat, feat_len)
        float(s)
        best = min(best, time.time() - t0)
    print(f"beam step: {best*1e3:.1f} ms  ({B*N/SR/best:.0f} audio-s/s/chip)", flush=True)


if __name__ == "__main__":
    main()
