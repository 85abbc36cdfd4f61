"""SpecAugment (time/freq masking) inside jit.

The reference applies SpecAugment-style masking on CPU features; here the
masks are drawn with `jax.random` and applied on device inside the jitted
train step — zero host work, fully fused by XLA. Masked value is 0, which
equals the per-utterance mean after CMVN (the canonical choice).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from e2e_asr_tpu.config import SpecAugmentConfig


def specaugment(
    feat: jnp.ndarray, feat_len: jnp.ndarray, cfg: SpecAugmentConfig, rng: jax.Array
) -> jnp.ndarray:
    """[B, T, D] -> masked features. Respects per-utterance valid length
    (time masks are drawn inside [0, feat_len))."""
    if not cfg.enable:
        return feat
    b, t, d = feat.shape
    keep = jnp.ones((b, t, d), feat.dtype)
    tidx = jnp.arange(t)[None, :]
    fidx = jnp.arange(d)[None, :]

    kf, kt = jax.random.split(rng)
    # frequency masks
    for i in range(cfg.freq_mask_num):
        k1, k2, kf = jax.random.split(jax.random.fold_in(kf, i), 3)
        width = jax.random.randint(k1, (b, 1), 0, cfg.freq_mask_width + 1)
        start = jax.random.randint(k2, (b, 1), 0, jnp.maximum(d - cfg.freq_mask_width, 1))
        m = (fidx >= start) & (fidx < start + width)
        keep = keep * jnp.where(m[:, None, :], 0.0, 1.0)
    # time masks (width capped by ratio of the utterance length)
    for i in range(cfg.time_mask_num):
        k1, k2, kt = jax.random.split(jax.random.fold_in(kt, i), 3)
        max_w = jnp.minimum(
            cfg.time_mask_width, (feat_len * cfg.time_mask_ratio).astype(jnp.int32)
        )[:, None]
        width = (jax.random.uniform(k1, (b, 1)) * (max_w + 1)).astype(jnp.int32)
        start = (
            jax.random.uniform(k2, (b, 1)) * jnp.maximum(feat_len[:, None] - width, 1)
        ).astype(jnp.int32)
        m = (tidx >= start) & (tidx < start + width)
        keep = keep * jnp.where(m[:, :, None], 0.0, 1.0)
    return feat * keep
