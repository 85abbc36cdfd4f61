"""Attribute beam-decode time: encoder vs per-step decoder/attention vs CTC
prefix scoring vs top-k/gather plumbing (round-3 verdict 'do this' item 3a:
decode throughput has been flat since round 1 and nobody knows where the
step time goes).

Run on the TPU host:  python tools/profile_beam.py [--frames 1632 --batch 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=3, reps=3):
    import jax

    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    float(np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        float(np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[0])
        best = min(best, (time.time() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=1632)
    ap.add_argument("--beam", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from e2e_asr_tpu.config import Config, DecodeConfig
    from e2e_asr_tpu.decode import ctc_prefix
    from e2e_asr_tpu.decode.beam import beam_search
    from e2e_asr_tpu.models import asr as asr_mod
    from e2e_asr_tpu.models import attention as att_mod
    from e2e_asr_tpu.ops.frontend import compute_features
    from e2e_asr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    VOCAB = 31
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
    b, w = args.batch, args.beam
    n = args.frames * 160 + 240
    params, _ = asr_mod.asr_init(jax.random.PRNGKey(0), 40, VOCAB, cfg.model)
    rng = np.random.RandomState(0)
    wav = jnp.asarray((rng.randn(b, n) * 0.1).astype(np.float32))
    wl = jnp.asarray(np.full(b, n, np.int32))
    feat, feat_len = jax.jit(lambda x, l: compute_features(x, l, cfg.data.audio))(wav, wl)
    feat = feat.astype(jnp.bfloat16)
    max_step = max(8, int(0.4 * args.frames // 4))
    print(f"shape: B={b} frames={args.frames} W={w} max_step={max_step}", flush=True)

    # 1. encoder alone
    enc_fn = jax.jit(lambda f, fl: asr_mod.encode(params, cfg.model, f, fl)[0].sum())
    t_enc = timed(enc_fn, feat, feat_len)
    print(f"encode:                {t_enc*1e3:8.1f} ms", flush=True)

    # 2. full beam, ctc_weight=0.3 (bench configuration)
    d_ctc = DecodeConfig(beam_size=w, ctc_weight=0.3, lm_weight=0.0, max_len_ratio=0.4)
    f_ctc = jax.jit(lambda f, fl: beam_search(params, cfg.model, d_ctc, f, fl, max_step).scores.sum())
    t_full = timed(f_ctc, feat, feat_len)
    print(f"beam att+ctc:          {t_full*1e3:8.1f} ms", flush=True)

    # 3. attention-only beam
    d_att = DecodeConfig(beam_size=w, ctc_weight=0.0, lm_weight=0.0, max_len_ratio=0.4)
    f_att = jax.jit(lambda f, fl: beam_search(params, cfg.model, d_att, f, fl, max_step).scores.sum())
    t_att = timed(f_att, feat, feat_len)
    print(f"beam att-only:         {t_att*1e3:8.1f} ms", flush=True)

    # 4. bare decoder/attention scan: max_step x attend_and_step over B*W
    #    rows, NO pruning/gather/finished-set plumbing
    def bare_scan(f, fl):
        enc, enc_len = asr_mod.encode(params, cfg.model, f, fl)
        from e2e_asr_tpu.decode.beam import _tile_mem

        mem = att_mod.prepare(params["attention"], cfg.attention if hasattr(cfg, "attention") else cfg.model.attention, enc, enc_len)
        mem_bw = _tile_mem(mem, w)
        from e2e_asr_tpu.models import decoder as dec_mod

        carry0 = asr_mod.DecodeCarry(
            dec_state=dec_mod.init_state(b * w, cfg.model.decoder, enc.dtype),
            prev_att=att_mod.init_align(cfg.model.attention, mem_bw).astype(enc.dtype),
            prev_tok=jnp.zeros((b * w,), jnp.int32),
        )

        def step(c, t):
            logits, align, hidden, nc = asr_mod.attend_and_step(
                params, cfg.model, mem_bw, c, c.prev_tok
            )
            return nc, logits.sum()

        _, outs = jax.lax.scan(step, carry0, jnp.arange(max_step))
        return outs.sum()

    t_bare = timed(jax.jit(bare_scan), feat, feat_len)
    print(f"bare dec scan:         {t_bare*1e3:8.1f} ms", flush=True)

    # 5. CTC prefix scoring alone: max_step x prefix_scores on static inputs
    def prefix_only(f, fl):
        enc, enc_len = asr_mod.encode(params, cfg.model, f, fl)
        ctc_lp = asr_mod.ctc_log_probs(params, enc).astype(jnp.float32)
        k_cand = max(w, int(w * d_ctc.ctc_beam_ratio))
        r0 = ctc_prefix.init_empty_prefix(ctc_lp, enc_len, w)
        cand = jnp.broadcast_to(jnp.arange(k_cand)[None, None] + 3, (b, w, k_cand)).astype(jnp.int32)
        prev = jnp.zeros((b, w), jnp.int32)

        def step(r, t):
            psi, r_h = ctc_prefix.prefix_scores(ctc_lp, enc_len, r, prev, cand, prefix_is_empty=False)
            return r_h[:, :, 0], psi.sum()

        _, outs = jax.lax.scan(step, r0, jnp.arange(max_step))
        return outs.sum()

    t_prefix = timed(jax.jit(prefix_only), feat, feat_len)
    print(f"ctc prefix scan:       {t_prefix*1e3:8.1f} ms", flush=True)

    audio_s = b * n / 16000
    print(f"\nbeam att+ctc throughput: {audio_s / t_full:8.1f} audio-s/s/chip", flush=True)
    print(f"attribution: enc {t_enc*1e3:.0f} | bare dec {t_bare*1e3:.0f} | "
          f"prefix {t_prefix*1e3:.0f} | plumbing(att-only) {max(t_att - t_enc - t_bare, 0)*1e3:.0f} | "
          f"ctc add-on {max(t_full - t_att, 0)*1e3:.0f}", flush=True)


if __name__ == "__main__":
    main()
