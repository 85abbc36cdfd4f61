"""Per-stage timing + per-stage speed-of-light model for the train step.

Round-4 verdict item 1: whole-step utilization (38% compute / 35% memory
SoL with neither roofline binding) left "is the encoder's 101 ms good?"
unanswerable. This module gives every stage its OWN ceiling:

- matmul-dominated stages (VGG, recurrence, input projections): analytic
  FLOPs vs the bf16 MXU envelope. Round-5 probes (tools/exp_rnn_floor.py,
  tools/exp_mxu_envelope.py) showed in-kernel Pallas matmul chains sustain
  ~sustained MXU throughput (137.9 TF/s measured in-program round 5) — the
  round-1 "measured 77 TF/s envelope" was an artifact of timing one
  dispatch through the axon tunnel; ceilings use the sustained figure.
- the frontend: f32-precision DFT matmuls (HIGHEST ~ 3 bf16 passes).
- the CTC lattice: a serial fori-loop ceiling (VPU row ops per lattice
  step, two sweeps).
- the decoder scan: compute ceiling of its per-step attention+cell math;
  the XLA scan path re-reads k/v from HBM each step, which is a *design*
  gap, not a hardware one — the sol number shows exactly that distance.
- the optimizer: pure HBM roofline (param + grad + slot traffic).

Stage timings are measured as STANDALONE jitted programs: each carries its
own dispatch/fence overhead through the ~1.3 ms tunnel floor and XLA
cannot overlap stages as it does inside the fused step, so the stage SUM
exceeds the fused step time (BASELINE.md round-4 note). sol = ceiling/ms
is still meaningful per stage because the ceiling includes no overlap
either.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from e2e_asr_tpu.utils import profiling as prof

# Sustained bf16 MXU envelope measured IN-PROGRAM on this chip (round 5,
# tools/exp_mxu_envelope.py: 137.9 TF/s over a chained-4096^3 program —
# 70% of the 197 TF/s nominal peak; the round-1 "77 TF/s" single-dispatch
# figure is refuted as dispatch-floor-bound). Stage ceilings use this.
MXU_PEAK = prof.MEASURED_SUSTAINED_BF16_FLOPS
HBM_PEAK = prof.PEAK_HBM_GBPS
# serial per-lattice-step floor of the CTC kernel's fori_loop (VPU row ops
# + in-place gamma write at [bc, S_pad]; measured round 5 on one v5e)
CTC_STEP_FLOOR_S = 0.6e-6


def _lstm_layer_flops(b: int, t: int, d_in: int, h: int) -> Tuple[float, float]:
    """(fwd, bwd) FLOPs of one fused biLSTM layer (v3 backward: no remat).

    fwd per step: block-batched input proj (both dirs) + hidden matmul.
    bwd per step: dh propagate + dWh accumulate + block-batched dx + dWx.
    """
    gh = 4 * h
    xproj = 2 * 2 * b * d_in * gh  # both directions
    hidden = 2 * 2 * b * h * gh
    fwd = t * (xproj + hidden)
    bwd = t * (2 * xproj + 2 * hidden)  # dx+dWx = 2*xproj; dh+dWh = 2*hidden
    return fwd, bwd


def _vgg_flops(b: int, t: int, mel: int) -> float:
    """Forward FLOPs of the reference VGG extractor (two 3x3 conv pairs,
    64 then 128 channels, 2x2 pools; ref: src/module.py VGGExtractor)."""
    pos1 = b * t * mel
    fl = pos1 * 1 * 64 * 9 * 2 + pos1 * 64 * 64 * 9 * 2
    pos2 = b * (t // 2) * (mel // 2)
    fl += pos2 * 64 * 128 * 9 * 2 + pos2 * 128 * 128 * 9 * 2
    return fl


def stage_ceilings(cfg, b: int, frames: int, l_tok: int, vocab: int) -> Dict[str, dict]:
    """Analytic per-stage ceilings (seconds) at a bucket shape."""
    a = cfg.data.audio
    sr = a.sample_rate
    win = int(sr * a.frame_length / 1000)
    n_fft = 1 << (win - 1).bit_length()
    n_freq = n_fft // 2 + 1
    mel = a.feat_dim

    out: Dict[str, dict] = {}

    # ---- frontend: framing + DFT-as-matmul + mel + log (f32 precision)
    stft_flops = b * frames * (2 * 2 * win * n_freq + 2 * n_freq * mel)
    t_fe = max(
        stft_flops / (MXU_PEAK / 3),  # HIGHEST precision ~ 3 bf16 passes
        (4 * b * frames * (160 + mel)) / HBM_PEAK,
    )
    out["frontend_fwd"] = {"ceiling_ms": t_fe * 1e3, "bound": "compute(f32)"}

    # ---- encoder = VGG f+b + recurrence f+b + inter-layer projections
    enc = cfg.model.encoder
    t_enc = frames // 4 if enc.prenet else frames
    vgg = 3.0 * _vgg_flops(b, frames, mel) / MXU_PEAK if enc.prenet == "vgg" else 0.0
    d_in = 128 * (mel // 4) if enc.prenet == "vgg" else mel
    rec = proj = 0.0
    tl = t_enc
    for i, h in enumerate(enc.dim):
        f_fwd, f_bwd = _lstm_layer_flops(b, tl, d_in, h)
        # per-layer ceiling: compute term vs a serial floor — the
        # dependent-chain probe (exp_rnn_floor, round 5) measured ~0
        # marginal serial cost per step at these shapes, so compute
        # dominates; keep a 2 us/step floor for honesty (fwd+bwd sweeps)
        rec += max((f_fwd + f_bwd) / MXU_PEAK, tl * 2 * 2e-6)
        d_out = 2 * h if getattr(enc, "bidirection", True) else h
        if enc.sample_rate[i] > 1 and enc.sample_style == "concat":
            d_out *= enc.sample_rate[i]
        if enc.proj[i]:
            proj += 3.0 * (2 * b * tl * d_out * d_out) / MXU_PEAK
        d_in = d_out  # proj keeps out_dim (ref: RNNLayer proj 2H->2H, tanh)
        if enc.sample_rate[i] > 1:
            tl //= enc.sample_rate[i]
    out["vgg_fb"] = {"ceiling_ms": vgg * 1e3, "bound": "compute"}
    out["recurrence_fb"] = {"ceiling_ms": (rec + proj) * 1e3, "bound": "compute"}
    out["encoder_fb"] = {
        "ceiling_ms": (vgg + rec + proj) * 1e3,
        "bound": "compute",
    }

    # ---- decoder scan: per-step attention + cell + logits math, f+b = 3x
    att, dec = cfg.model.attention, cfg.model.decoder
    s = t_enc
    for r in enc.sample_rate:
        s //= r
    e_dim = (2 if getattr(enc, "bidirection", True) else 1) * enc.dim[-1]
    k_feats = att.loc_kernel_num if att.mode == "location" else 0
    per_step = 0.0
    if att.mode == "location":
        per_step += 2 * b * s * s * k_feats  # Toeplitz location features
        per_step += 2 * b * s * k_feats * att.dim
    per_step += 2 * b * s * att.dim  # energies (q.k or tanh reduction)
    per_step += 2 * b * s * e_dim  # context
    dec_in = dec.dim + e_dim
    per_step += 2 * b * dec_in * 4 * dec.dim + 2 * b * dec.dim * 4 * dec.dim
    per_step += 2 * b * dec.dim * vocab
    out["decoder_fb"] = {
        "ceiling_ms": 3.0 * l_tok * per_step / MXU_PEAK * 1e3,
        "bound": "compute (XLA scan path re-reads k/v per step: design gap)",
    }

    # ---- CTC: serial lattice recursion, two sweeps over T
    n_chunks = max(1, b // 8)
    out["ctc_fb"] = {
        "ceiling_ms": n_chunks * 2 * s * CTC_STEP_FLOOR_S * 1e3,
        "bound": "serial lattice",
    }

    # ---- optimizer: HBM roofline (Adadelta: read p,g,2 slots; write p,2 slots)
    n_par = 15.4e6 if frames else 0  # filled in by caller when known
    out["optimizer"] = {
        "ceiling_ms": (7 * n_par * 4) / HBM_PEAK * 1e3,
        "bound": "memory",
    }
    return out


def measure_stages(cfg, b: int, frames: int, l_tok: int, vocab: int, iters: int = 5) -> Dict[str, float]:
    """Time each stage as a standalone jitted program; returns seconds.

    Shared by tools/profile_trainstep.py and bench.py's stages stage so the
    two can never drift. All fences are value readbacks (axon tunnel).
    """
    import jax
    import jax.numpy as jnp

    from e2e_asr_tpu.models import asr as asr_mod
    from e2e_asr_tpu.models import attention as att_mod
    from e2e_asr_tpu.models import decoder as dec_mod
    from e2e_asr_tpu.ops.ctc import ctc_loss
    from e2e_asr_tpu.ops.frontend import compute_features
    from e2e_asr_tpu.utils.profiling import time_fn

    n = frames * 160 + 240
    rng = np.random.RandomState(0)
    wav = jnp.asarray((rng.randn(b, n) * 0.1).astype(np.float32))
    wl = jnp.asarray(np.full(b, n, np.int32))
    text = np.zeros((b, l_tok), np.int32)
    text[:, : l_tok - 1] = rng.randint(3, vocab, (b, l_tok - 1))
    text[:, l_tok - 1] = 1
    text = jnp.asarray(text)
    tl = jnp.asarray(np.full(b, l_tok, np.int32))
    params, _ = asr_mod.asr_init(jax.random.PRNGKey(0), cfg.data.audio.feat_dim, vocab, cfg.model)
    key = jax.random.PRNGKey(0)
    out: Dict[str, float] = {}

    def _vg(f):
        def g(*a):
            v, gr = jax.value_and_grad(f)(*a)
            return v + sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(gr))
        return g

    fe = jax.jit(lambda w, l_: compute_features(w, l_, cfg.data.audio)[0].astype(jnp.float32).sum())
    out["frontend_fwd"] = time_fn(fe, wav, wl, iters=iters)

    feat, feat_len = jax.jit(lambda w, l_: compute_features(w, l_, cfg.data.audio))(wav, wl)
    featb = jax.device_put(feat.astype(jnp.bfloat16))

    enc_f = jax.jit(lambda p, f, fl: asr_mod.encode(p, cfg.model, f, fl)[0].astype(jnp.float32).sum())
    enc_g = jax.jit(_vg(enc_f))
    out["encoder_fb"] = time_fn(enc_g, params, featb, feat_len, iters=iters)

    enc, enc_len = jax.jit(lambda p, f, fl: asr_mod.encode(p, cfg.model, f, fl))(params, featb, feat_len)
    enc = jax.device_put(enc)

    def ctc_obj(p, e):
        lp = asr_mod.ctc_log_probs(p, e).astype(jnp.float32)
        lab_len = jnp.maximum(tl - 1, 0)
        pos = jnp.arange(text.shape[1])[None, :]
        labels = jnp.where(pos < lab_len[:, None], text, 0)
        nll = ctc_loss(lp, enc_len, labels, lab_len, impl="auto")
        return jnp.sum(nll / jnp.maximum(lab_len, 1)) / b

    ctc_g = jax.jit(_vg(lambda p: ctc_obj(p, enc)))
    out["ctc_fb"] = time_fn(ctc_g, params, iters=iters)

    def dec_obj(p, e):
        mem = att_mod.prepare(p["attention"], cfg.model.attention, e, enc_len)
        carry0 = asr_mod.DecodeCarry(
            dec_mod.init_state(b, cfg.model.decoder, e.dtype),
            att_mod.init_align(cfg.model.attention, mem).astype(e.dtype),
            jnp.zeros((b,), jnp.int32),
        )
        teacher_in = jnp.concatenate([jnp.zeros((b, 1), text.dtype), text[:, : l_tok - 1]], 1)
        rngs = jax.random.split(key, l_tok)
        coins = jnp.ones((l_tok,), bool)

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

    dec_g = jax.jit(_vg(lambda pe: dec_obj(pe[0], pe[1])))
    out["decoder_fb"] = time_fn(dec_g, (params, enc), iters=iters)
    return out


def stage_report(cfg, b, frames, l_tok, vocab, measured: Dict[str, float], n_params: int = 0) -> Dict[str, dict]:
    """Join measured stage seconds with analytic ceilings -> sol table."""
    ceil = stage_ceilings(cfg, b, frames, l_tok, vocab)
    if n_params:
        ceil["optimizer"]["ceiling_ms"] = (7 * n_params * 4) / HBM_PEAK * 1e3
    rep = {}
    for k, sec in measured.items():
        ms = sec * 1e3
        c = ceil.get(k, {}).get("ceiling_ms", 0.0)
        rep[k] = {
            "ms": round(ms, 1),
            "ceiling_ms": round(c, 1),
            "sol": round(c / ms, 3) if ms else 0.0,
            "bound": ceil.get(k, {}).get("bound", ""),
        }
    return rep
