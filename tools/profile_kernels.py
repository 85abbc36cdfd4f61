"""Per-kernel profiles vs per-chip speed-of-light (BASELINE.json:
"STFT, recurrence, and beam kernels profiled against per-chip
speed-of-light"). Run on a TPU host:

    python tools/profile_kernels.py [--trace logdir]

Prints one line per kernel: measured ms, achieved TFLOP/s, % of compute
and HBM speed-of-light, bound classification.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None, help="also capture a jax.profiler trace")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=1632)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from e2e_asr_tpu.config import Config, DecodeConfig
    from e2e_asr_tpu.decode.beam import beam_search
    from e2e_asr_tpu.models import asr as asr_mod
    from e2e_asr_tpu.ops.ctc import ctc_loss
    from e2e_asr_tpu.ops.frontend import compute_features
    from e2e_asr_tpu.utils.profiling import (
        PEAK_F32_FLOPS,
        Roofline,
        time_fn,
        trace,
    )

    cfg = Config.from_dict(
        {
            "data": {"audio": {"feat_dim": 40, "use_pallas": True}},
            "hparas": {"dtype": "bfloat16"},
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
    b, tf_ = args.batch, args.frames
    sr = 16000
    n = tf_ * 160 + 240
    l = 160
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

    ctx = trace(args.trace) if args.trace else None
    if ctx:
        ctx.__enter__()

    # ---- STFT+mel Pallas kernel
    stft_fn = jax.jit(lambda w, l_: compute_features(w, l_, cfg.data.audio)[0].sum())
    sec = time_fn(stft_fn, wav, wl)
    win, n_fft, n_freq, mel = 400, 512, 257, cfg.data.audio.feat_dim
    flops = b * tf_ * (2 * 2 * 480 * n_freq + 2 * n_freq * mel + 2 * n_freq)
    bytes_m = 4 * b * (n + tf_ * mel)
    print(Roofline("stft+logmel (pallas)", sec, flops, bytes_m, PEAK_F32_FLOPS).report())

    # ---- recurrence (full encoder)
    feat, feat_len = jax.jit(lambda w, l_: compute_features(w, l_, cfg.data.audio))(wav, wl)
    featb = feat.astype(jnp.bfloat16)
    enc_fn = jax.jit(lambda f, fl: asr_mod.encode(params, cfg.model, f, fl)[0].astype(jnp.float32).sum())
    sec = time_fn(enc_fn, featb, feat_len)
    t_enc = tf_ // 4
    d_in = 128 * (mel // 4)
    flops = 0.0
    for h in cfg.model.encoder.dim:
        flops += b * t_enc * 2 * 2 * ((d_in + h) * 4 * h) + b * t_enc * 2 * (2 * h) ** 2 // 2
        d_in = 2 * h
    # VGG convs
    flops += b * tf_ * mel * 9 * 64 * 2 + b * tf_ * mel * 9 * 64 * 64 * 2
    flops += b * (tf_ // 2) * (mel // 2) * 9 * 64 * 128 * 2 + b * (tf_ // 2) * (mel // 2) * 9 * 128 * 128 * 2
    print(Roofline("encoder vgg+4xBiLSTM", sec, flops, 0).report())

    # ---- CTC lattice kernel
    enc, enc_len = jax.jit(lambda f, fl: asr_mod.encode(params, cfg.model, f, fl))(featb, feat_len)
    lp = jax.jit(lambda e: asr_mod.ctc_log_probs(params, e).astype(jnp.float32))(enc)
    ctc_fn = jax.jit(
        lambda lp_: jax.value_and_grad(lambda x: ctc_loss(x, enc_len, text, tl, impl="pallas").sum())(lp_)[0]
    )
    sec = time_fn(ctc_fn, lp)
    s_lat = 2 * l + 1
    bytes_m = 4 * b * enc.shape[1] * (((s_lat + 127) // 128) * 128) * 4  # lp_ext+gamma rw
    print(Roofline("ctc fwd-bwd (pallas, value+grad)", sec, 0, bytes_m).report())

    # ---- beam search (batched, W=8, ctc rescoring on)
    dcfg = DecodeConfig(beam_size=8, ctc_weight=0.3, lm_weight=0.0, max_len_ratio=0.4)
    max_step = max(8, int(0.4 * enc.shape[1]))
    beam_fn = jax.jit(
        lambda f, fl: beam_search(params, cfg.model, dcfg, f, fl, max_step).scores.sum()
    )
    sec = time_fn(beam_fn, featb, feat_len, iters=3)
    audio_sec = b * n / sr
    print(
        f"beam search (W=8, ctc prefix, {max_step} steps): {sec*1e3:.1f} ms "
        f"=> {audio_sec/sec:.0f} audio-s/s/chip decode throughput"
    )

    if ctx:
        ctx.__exit__(None, None, None)
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
