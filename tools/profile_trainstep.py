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

    # frontend (fwd only — no params behind it)
    fe = jax.jit(lambda w, l_: compute_features(w, l_, cfg.data.audio)[0].astype(jnp.float32).sum())
    sec = time_fn(fe, wav, wl, iters=5)
    print(f"frontend fwd:             {sec*1e3:8.1f} ms")

    feat, feat_len = jax.jit(lambda w, l_: compute_features(w, l_, cfg.data.audio))(wav, wl)
    featb = jax.device_put(feat.astype(jnp.bfloat16))

    # encoder fwd
    enc_f = jax.jit(lambda p, f, fl: asr_mod.encode(p, cfg.model, f, fl)[0].astype(jnp.float32).sum())
    sec = time_fn(enc_f, params, featb, feat_len, iters=5)
    print(f"encoder fwd:              {sec*1e3:8.1f} ms")

    # encoder fwd+bwd
    def _vg(f):
        def g(*a):
            v, gr = jax.value_and_grad(f)(*a)
            return v + sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(gr))
        return g

    enc_g = jax.jit(_vg(enc_f))
    sec = time_fn(enc_g, params, featb, feat_len, iters=5)
    print(f"encoder fwd+bwd:          {sec*1e3:8.1f} ms")

    enc, enc_len = jax.jit(lambda p, f, fl: asr_mod.encode(p, cfg.model, f, fl))(params, featb, feat_len)
    enc = jax.device_put(enc)

    # ctc head + lattice fwd+bwd (wrt params so head matmul grads included)
    def ctc_obj(p, e):
        lp = asr_mod.ctc_log_probs(p, e).astype(jnp.float32)
        lab_len = jnp.maximum(tl - 1, 0)
        pos = jnp.arange(text.shape[1])[None, :]
        labels = jnp.where(pos < lab_len[:, None], text, 0)
        nll = ctc_loss(lp, enc_len, labels, lab_len, impl="auto")
        return jnp.sum(nll / jnp.maximum(lab_len, 1)) / b

    ctc_g = jax.jit(_vg(lambda p: ctc_obj(p, enc)))
    sec = time_fn(ctc_g, params, iters=5)
    print(f"ctc head+lattice f+b:     {sec*1e3:8.1f} ms")

    # attention decoder scan fwd+bwd (enc held constant, grads wrt params)
    from e2e_asr_tpu.models import attention as att_mod
    from e2e_asr_tpu.models import decoder as dec_mod

    def dec_obj(p, e):
        mem = att_mod.prepare(p["attention"], cfg.model.attention, e, enc_len)
        carry0 = asr_mod.DecodeCarry(
            dec_mod.init_state(b, cfg.model.decoder, e.dtype),
            att_mod.init_align(cfg.model.attention, mem).astype(e.dtype),
            jnp.zeros((b,), jnp.int32),
        )
        teacher_in = jnp.concatenate([jnp.zeros((b, 1), text.dtype), text[:, : l - 1]], 1)
        rngs = jax.random.split(key, l)
        coins = jnp.ones((l,), bool)

        @jax.checkpoint
        def body(carry, inp):
            tok, coin, r = inp
            logits, align, hidden, nc = asr_mod.attend_and_step(
                p, cfg.model, mem, carry, tok, rng=r, train=True
            )
            return nc._replace(prev_tok=tok), logits

        _, logits = jax.lax.scan(
            body, carry0, (jnp.moveaxis(teacher_in, 0, 1), coins, rngs), unroll=16
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.mean(jnp.take_along_axis(logp, jnp.moveaxis(text, 0, 1)[..., None], -1))

    # grads wrt (params, enc): without d_enc the per-step dk/dv accumulations
    # (the scan transpose's dominant HBM cost) would be dead code
    dec_g = jax.jit(_vg(lambda pe: dec_obj(pe[0], pe[1])))
    sec = time_fn(dec_g, (params, enc), iters=5)
    print(f"decoder scan f+b:         {sec*1e3:8.1f} ms")

    # optimizer update alone
    grads = jax.jit(
        lambda p, f, fl: jax.grad(lambda pp: enc_f(pp, f, fl) * 0 + sum(jnp.sum(x) for x in jax.tree.leaves(pp)))(p)
    )(params, featb, feat_len)
    upd = jax.jit(lambda g, s, p: tx.update(g, s, p)[0])
    sec = time_fn(lambda g, s, p: jax.tree.leaves(upd(g, s, p))[0].sum(), grads, state.opt_state, params, iters=5)
    print(f"optimizer update:         {sec*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
