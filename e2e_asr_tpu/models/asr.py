"""The joint CTC/attention ASR model (Listen-Attend-Spell + CTC head).

Parity with the reference's src/asr.py ASR module:
- encoder (VGG/CNN prenet + pyramidal BiLSTM) shared by both heads
- CTC head: linear projection -> log-softmax (enabled when ctc_weight > 0)
- attention head: char embedding + per-step attention + LSTM speller with
  scheduled teacher forcing (enabled when ctc_weight < 1)

TPU-native redesign of the forward pass: the reference's per-token Python
loop (src/asr.py:~150 `for t in range(decode_step)`) becomes one
`jax.lax.scan` over target positions with the decoder/attention state as
the carry; the per-step teacher-forcing coin flips are drawn up front and
scanned over. Everything is fixed-shape: `decode_step` is the (bucketed)
max target length and per-utterance validity is handled by loss masks.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from e2e_asr_tpu.config import ModelConfig
from e2e_asr_tpu.models import attention as att_mod
from e2e_asr_tpu.models import decoder as dec_mod
from e2e_asr_tpu.models import encoder as enc_mod
from e2e_asr_tpu.models import layers as L

Params = Dict[str, object]


class ASRShapes(NamedTuple):
    enc_dim: int
    ctx_dim: int
    emb_dim: int
    vocab: int


def asr_init(key, feat_dim: int, vocab: int, cfg: ModelConfig) -> Tuple[Params, ASRShapes]:
    ks = jax.random.split(key, 5)
    p: Params = {}
    p["encoder"], enc_dim = enc_mod.encoder_init(ks[0], feat_dim, cfg.encoder)
    ctx_dim = enc_dim
    emb_dim = cfg.decoder.dim
    if cfg.ctc_weight > 0:
        p["ctc"] = L.dense_init(ks[1], enc_dim, vocab)
    if cfg.ctc_weight < 1:
        p["embed"] = L.embedding_init(ks[2], vocab, emb_dim)
        p["attention"], ctx_dim = att_mod.attention_init(ks[3], enc_dim, cfg.decoder.dim, cfg.attention)
        p["decoder"] = dec_mod.decoder_init(ks[4], ctx_dim + emb_dim, vocab, cfg.decoder)
        if cfg.emb_reg.enable:
            from e2e_asr_tpu.models import plugin as plugin_mod

            p["emb_reg"] = plugin_mod.emb_reg_init(
                jax.random.fold_in(key, 99), cfg.decoder.dim, vocab, cfg.emb_reg
            )
    return p, ASRShapes(enc_dim, ctx_dim, emb_dim, vocab)


def encode(
    params: Params,
    cfg: ModelConfig,
    feat: jnp.ndarray,
    feat_len: jnp.ndarray,
    rng=None,
    train: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return enc_mod.encoder_apply(params["encoder"], cfg.encoder, feat, feat_len, rng, train)


def ctc_log_probs(params: Params, enc: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.log_softmax(L.dense(params["ctc"], enc), axis=-1)


class DecodeCarry(NamedTuple):
    dec_state: dec_mod.State
    prev_att: jnp.ndarray  # [B, H, S]
    prev_tok: jnp.ndarray  # [B] int32


def attend_and_step(
    params: Params,
    cfg: ModelConfig,
    mem: Dict,
    carry: DecodeCarry,
    tok: jnp.ndarray,
    rng=None,
    train: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, DecodeCarry]:
    """Shared single-token decode: embed `tok`, attend with the *current*
    decoder state as query (ref ordering: attention before the RNN step),
    then advance the speller. Returns (logits, align, hidden, new_carry)."""
    emb = L.embed(params["embed"], tok, dtype=mem["k"].dtype)
    query = dec_mod.query_of(carry.dec_state)
    align, ctx = att_mod.step(params["attention"], cfg.attention, query, mem, carry.prev_att)
    logits, hidden, new_state = dec_mod.step(
        params["decoder"], cfg.decoder, carry.dec_state, jnp.concatenate([emb, ctx], -1),
        rng=rng, train=train,
    )
    return logits, align, hidden, DecodeCarry(new_state, align, tok)


def forward(
    params: Params,
    cfg: ModelConfig,
    feat: jnp.ndarray,
    feat_len: jnp.ndarray,
    decode_step: int,
    tf_rate: float = 1.0,
    teacher: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    sample_decoding: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Full training/eval forward (ref: ASR.forward).

    teacher: [B, L] target ids (with eos, 0-padded); decoder inputs are the
    right-shifted targets starting from <sos>=0. When the per-step coin
    exceeds tf_rate the previous prediction is fed back instead (sampled
    from the output distribution when `sample_decoding`, argmax otherwise —
    ref: scheduled sampling in src/asr.py).

    Returns dict: ctc_log_probs [B,S,V] (if ctc head), enc_len [B],
    att_logits [B,L,V], align [B,L,H,S] (if attention head).
    """
    b = feat.shape[0]
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    r_enc, r_scan = jax.random.split(rng)
    enc, enc_len = encode(params, cfg, feat, feat_len, r_enc, train)
    out: Dict[str, jnp.ndarray] = {"enc_len": enc_len, "enc": enc}
    if "ctc" in params:
        out["ctc_log_probs"] = ctc_log_probs(params, enc)
    if "decoder" not in params:
        return out

    assert teacher is not None, "attention head requires teacher tokens"
    # decoder inputs: <sos>, y_0, ..., y_{L-2}
    teacher_in = jnp.concatenate(
        [jnp.zeros((b, 1), teacher.dtype), teacher[:, : decode_step - 1]], axis=1
    )
    step_rngs = jax.random.split(r_scan, decode_step)
    # one teacher-forcing coin per step for the whole batch (ref semantics)
    coins = jax.random.uniform(jax.random.fold_in(r_scan, 1), (decode_step,)) < tf_rate

    # fused Pallas decode-scan kernel: keeps k/v/location-bank VMEM-resident
    # across all decode steps (ops/decoder_pallas.py); falls back to the
    # lax.scan below outside the supported flagship configuration
    from e2e_asr_tpu.ops import decoder_pallas

    # 'auto' is a MEASUREMENT-driven policy (decoder_pallas.auto_select):
    # the kernel wins exactly when enc S is already a 128-lane multiple
    # (Mosaic pads S up to one; at aligned S the train step is 233.6 vs
    # 261.7 ms on one v5e, at S=408 the pad makes it 207 vs 175 ms).
    # Round 2's ">20 min Mosaic compile" was a probe artifact; with the
    # VMEM-aware batch tiles the flagship compiles in ~11-110 s. Force
    # with decoder.fused_scan='pallas'/'scan' (BASELINE.md "decoder
    # kernel status").
    fs = getattr(cfg.decoder, "fused_scan", "auto")
    use_fused = decoder_pallas.supported(cfg, train) and (
        fs == "pallas"
        or (fs == "auto" and decoder_pallas.auto_select(cfg, train, enc.shape[1]))
    )
    if (
        not use_fused
        and fs != "scan"
        and jax.default_backend() == "tpu"
        and not decoder_pallas.supported(cfg, train)
    ):
        from e2e_asr_tpu.utils.misc import warn_once

        a = cfg.attention
        warn_once(
            "decoder_scan_fallback",
            "decoder scan: config outside the fused Pallas kernel's envelope "
            f"(attention mode={a.mode}, num_head={a.num_head}, v_proj={a.v_proj}, "
            f"decoder module={cfg.decoder.module}/layer={cfg.decoder.layer}) -> "
            "lax.scan XLA path (slower; see BASELINE.md decoder kernel status)",
        )
    if use_fused:
        att_logits, aligns, hiddens = decoder_pallas.run_decode_scan(
            params, cfg, enc, enc_len, teacher_in, coins,
            rng=jax.random.fold_in(r_scan, 2), train=train,
            sample_decoding=sample_decoding,
        )
        out["att_logits"] = att_logits
        out["align"] = aligns
        out["att_hidden"] = hiddens
        return out

    mem = att_mod.prepare(params["attention"], cfg.attention, enc, enc_len)
    carry0 = DecodeCarry(
        dec_state=dec_mod.init_state(b, cfg.decoder, enc.dtype),
        prev_att=att_mod.init_align(cfg.attention, mem).astype(enc.dtype),
        prev_tok=jnp.zeros((b,), jnp.int32),  # <sos>
    )

    # Rematerialize the per-token step in the backward pass: without this,
    # the scan stacks every step's [B, S, att_dim] additive-attention tanh
    # tensor as an autodiff residual (at B=128/S=408/L=160 that is ~10 GB of
    # HBM written forward and re-read backward — measured 277 -> 237 ms/step
    # on one v5e when recomputed instead). The recompute is a handful of
    # small MXU matmuls per step, far cheaper than the saved HBM traffic.
    @jax.checkpoint
    def body(carry: DecodeCarry, inp):
        tok_teacher, coin, r = inp
        use_teacher = jnp.logical_or(coin, jnp.asarray(not train))
        tok = jnp.where(use_teacher, tok_teacher, carry.prev_tok)
        logits, align, hidden, new_carry = attend_and_step(
            params, cfg, mem, carry, tok, rng=r, train=train
        )
        if sample_decoding:
            pred = jax.random.categorical(jax.random.fold_in(r, 17), logits)
        else:
            pred = jnp.argmax(logits, -1)
        new_carry = new_carry._replace(prev_tok=pred.astype(jnp.int32))
        return new_carry, (logits, align, hidden)

    # unroll=16: lets XLA fuse consecutive steps' gradient accumulations into
    # the encoder-memory grads (dk/dv are [B,S,*] read-modify-writes per step
    # in the scan transpose — the single largest HBM cost of the whole train
    # step at B=128). Measured 237 -> 210 ms/step (unroll 8: 218, 32: 222).
    _, (att_logits, aligns, hiddens) = jax.lax.scan(
        body,
        carry0,
        (jnp.moveaxis(teacher_in, 0, 1), coins, step_rngs),
        unroll=min(16, decode_step),
    )
    out["att_logits"] = jnp.moveaxis(att_logits, 0, 1)  # [B, L, V]
    out["align"] = jnp.moveaxis(aligns, 0, 1)  # [B, L, H, S]
    out["att_hidden"] = jnp.moveaxis(hiddens, 0, 1)  # [B, L, H_dec]
    return out
