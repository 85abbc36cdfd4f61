"""Benchmark: training throughput of the flagship joint CTC/attention model.

Prints ONE JSON line:
  {"metric": "train_audio_sec_per_sec_chip", "value": N,
   "unit": "audio-seconds/s/chip", "vs_baseline": N}

The metric is the BASELINE.json north star (train audio-seconds/s/chip).
The reference publishes no throughput number (single-GPU, unreported —
BASELINE.md), so vs_baseline is reported against real-time (1.0 = audio
processed as fast as it plays): the honest interpretable anchor until a
reference measurement exists.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from e2e_asr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from e2e_asr_tpu.config import Config
    from e2e_asr_tpu.models import asr as asr_mod
    from e2e_asr_tpu.optim import build_optimizer
    from e2e_asr_tpu.parallel import mesh as mesh_mod
    from e2e_asr_tpu.training.step import TrainState, make_train_step

    cfg = Config.from_dict(
        {
            "data": {"audio": {"feat_dim": 40, "use_pallas": True}},
            "hparas": {"optimizer": "Adadelta", "lr": 1.0, "dtype": "bfloat16"},
            "model": {
                "ctc_weight": 0.5,
                "encoder": {
                    "prenet": "vgg",
                    "dim": [320, 320, 320, 320],
                    "dropout": [0.0] * 4,
                    "layer_norm": [False] * 4,
                    "proj": [True] * 4,
                    "sample_rate": [1, 1, 1, 1],
                    "sample_style": "drop",
                },
                "attention": {
                    "mode": "location",
                    "dim": 300,
                    "num_head": 1,
                    "loc_kernel_size": 100,
                    "loc_kernel_num": 10,
                },
                "decoder": {"dim": 320, "layer": 1},
            },
        }
    )

    # LibriSpeech-like bucket: B x 16.3s utterances, char targets.
    # B=128 is the measured throughput-optimal batch on one v5e (B=16: 5.7k,
    # B=64: 7.0k, B=128: 8.8k, B=256: 7.6k audio-s/s/chip).
    b = 128
    sr = 16000
    n = 1632 * 160 + 240  # 1632-frame bucket
    l = 160
    vocab = 31
    rng = np.random.RandomState(0)
    wav = (rng.randn(b, n) * 0.1).astype(np.float32)
    text = np.zeros((b, l), np.int32)
    text_len = np.full((b,), l, np.int32)
    for i in range(b):
        text[i, : l - 1] = rng.randint(3, vocab, size=l - 1)
        text[i, l - 1] = 1

    mesh = mesh_mod.make_mesh(dp=-1, mp=1)
    params, _ = asr_mod.asr_init(jax.random.PRNGKey(0), 40, vocab, cfg.model)
    tx = build_optimizer(cfg.hparas)
    state = TrainState(params, tx.init(params), jnp.asarray(0, jnp.int32))
    state = jax.device_put(state, mesh_mod.replicated(mesh))
    batch = mesh_mod.shard_batch(
        mesh,
        {
            "wav": wav,
            "wav_len": np.full((b,), n, np.int32),
            "text": text,
            "text_len": text_len,
        },
    )
    step = jax.jit(make_train_step(cfg, tx), donate_argnums=(0,))

    # warmup / compile. NOTE: on the axon remote-TPU tunnel
    # jax.block_until_ready does NOT synchronize — a device-to-host value
    # readback (float(...)) is the only honest fence.
    state, m = step(state, batch, jax.random.PRNGKey(0))
    float(m["loss"])

    iters = 10
    best = float("inf")
    for trial in range(3):
        t0 = time.time()
        for i in range(iters):
            state, m = step(state, batch, jax.random.fold_in(jax.random.PRNGKey(1 + trial), i))
        float(m["loss"])  # force completion
        best = min(best, time.time() - t0)

    audio_sec = b * n / sr * iters
    thr = audio_sec / best / jax.device_count()
    print(
        json.dumps(
            {
                "metric": "train_audio_sec_per_sec_chip",
                "value": round(thr, 2),
                "unit": "audio-seconds/s/chip",
                "vs_baseline": round(thr / 1.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
