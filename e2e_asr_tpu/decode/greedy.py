"""Greedy (beam=1) decoding for validation-time WER/CER.

The reference's validation runs the attention head free-running (teacher
None) and argmaxes both heads for cal_er (ref: bin/train_asr.py validate,
src/util.py cal_er). Here both are single jitted scans over the batch.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from e2e_asr_tpu.config import ModelConfig
from e2e_asr_tpu.models import asr as asr_mod
from e2e_asr_tpu.models import attention as att_mod
from e2e_asr_tpu.models import decoder as dec_mod


def greedy_decode(
    params,
    cfg: ModelConfig,
    feat: jnp.ndarray,
    feat_len: jnp.ndarray,
    max_step: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Free-running argmax decode of the attention head.

    Returns (tokens [B, max_step], align [B, max_step, H, S]).
    """
    b = feat.shape[0]
    enc, enc_len = asr_mod.encode(params, cfg, feat, feat_len)
    mem = att_mod.prepare(params["attention"], cfg.attention, enc, enc_len)
    carry0 = asr_mod.DecodeCarry(
        dec_state=dec_mod.init_state(b, cfg.decoder, enc.dtype),
        prev_att=att_mod.init_align(cfg.attention, mem).astype(enc.dtype),
        prev_tok=jnp.zeros((b,), jnp.int32),
    )

    def body(carry, _):
        logits, align, hidden, new_carry = asr_mod.attend_and_step(
            params, cfg, mem, carry, carry.prev_tok
        )
        if "emb_reg" in params and cfg.emb_reg.fuse > 0:
            from e2e_asr_tpu.models import plugin as plugin_mod

            logits = plugin_mod.fused_log_probs(params["emb_reg"], cfg.emb_reg, logits, hidden)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        return new_carry._replace(prev_tok=tok), (tok, align)

    _, (toks, aligns) = jax.lax.scan(body, carry0, None, length=max_step)
    return jnp.moveaxis(toks, 0, 1), jnp.moveaxis(aligns, 0, 1)


def ctc_greedy_decode(
    params, cfg: ModelConfig, feat: jnp.ndarray, feat_len: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Frame-wise argmax of the CTC head. Returns (ids [B, S], enc_len).

    Repeat/blank collapapse happens in the tokenizer
    (decode(ignore_repeat=True), blank==0 is stripped as pad).
    """
    enc, enc_len = asr_mod.encode(params, cfg, feat, feat_len)
    lp = asr_mod.ctc_log_probs(params, enc)
    ids = jnp.argmax(lp, -1).astype(jnp.int32)
    mask = jnp.arange(ids.shape[1])[None, :] < enc_len[:, None]
    return jnp.where(mask, ids, 0), enc_len
