"""Model-stack tests: shapes, masking invariants, overfit convergence
(SURVEY.md §4: integration tests — overfit-one-batch, exact recovery)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from e2e_asr_tpu.config import Config
from e2e_asr_tpu.decode.greedy import ctc_greedy_decode, greedy_decode
from e2e_asr_tpu.models import asr as asr_mod
from e2e_asr_tpu.models import encoder as enc_mod
from e2e_asr_tpu.optim import build_optimizer
from e2e_asr_tpu.training.step import TrainState, compute_loss, make_train_step


def tiny_cfg(ctc_weight=0.3, attention_mode="location", prenet="vgg"):
    return Config.from_dict(
        {
            "data": {"audio": {"feat_dim": 40, "use_pallas": False}},
            "model": {
                "ctc_weight": ctc_weight,
                "encoder": {
                    "prenet": prenet,
                    "dim": [64, 64],
                    "dropout": [0.0, 0.0],
                    "layer_norm": [False, False],
                    "proj": [True, True],
                    "sample_rate": [2, 1],
                    "sample_style": "drop",
                },
                "attention": {
                    "mode": attention_mode,
                    "dim": 48,
                    "num_head": 1,
                    "loc_kernel_size": 8,
                    "loc_kernel_num": 4,
                },
                "decoder": {"dim": 64, "layer": 1},
            },
            "hparas": {"dtype": "float32"},
        }
    )


def test_encoder_shapes_and_downsample():
    cfg = tiny_cfg().model.encoder
    params, out_dim = enc_mod.encoder_init(jax.random.PRNGKey(0), 40, cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 40), jnp.float32)
    enc, enc_len = enc_mod.encoder_apply(params, cfg, x, jnp.asarray([64, 32]))
    assert enc.shape == (2, 64 // 4 // 2, out_dim)
    assert list(np.asarray(enc_len)) == [8, 4]
    assert enc_mod.total_downsample(cfg) == 8


def test_encoder_padding_invariance():
    cfg = tiny_cfg(prenet="").model.encoder
    params, _ = enc_mod.encoder_init(jax.random.PRNGKey(0), 40, cfg)
    rng = np.random.RandomState(1)
    x = rng.randn(2, 32, 40).astype(np.float32)
    lens = jnp.asarray([20, 32])
    e1, l1 = enc_mod.encoder_apply(params, cfg, jnp.asarray(x), lens)
    x2 = x.copy()
    x2[0, 20:] = 7.7  # corrupt padding
    e2, _ = enc_mod.encoder_apply(params, cfg, jnp.asarray(x2), lens)
    v = int(l1[0])
    np.testing.assert_allclose(np.asarray(e1)[0, :v], np.asarray(e2)[0, :v], atol=1e-5)


@pytest.mark.parametrize("mode", ["dot", "location"])
def test_attention_mask_and_normalization(mode):
    from e2e_asr_tpu.models import attention as att_mod

    cfg = tiny_cfg(attention_mode=mode).model.attention
    p, ctx_dim = att_mod.attention_init(jax.random.PRNGKey(0), 32, 64, cfg)
    enc = jnp.asarray(np.random.RandomState(0).randn(2, 10, 32), jnp.float32)
    enc_len = jnp.asarray([6, 10])
    mem = att_mod.prepare(p, cfg, enc, enc_len)
    prev = att_mod.init_align(cfg, mem)
    np.testing.assert_allclose(np.asarray(prev.sum(-1)), 1.0, rtol=1e-5)
    q = jnp.asarray(np.random.RandomState(1).randn(2, 64), jnp.float32)
    align, ctx = att_mod.step(p, cfg, q, mem, prev)
    assert ctx.shape == (2, 32)
    a = np.asarray(align)
    np.testing.assert_allclose(a.sum(-1), 1.0, rtol=1e-5)
    assert (a[0, :, 6:] == 0).all()  # masked beyond enc_len


def test_forward_output_shapes():
    cfg = tiny_cfg(ctc_weight=0.5)
    params, shapes = asr_mod.asr_init(jax.random.PRNGKey(0), 40, 15, cfg.model)
    feat = jnp.asarray(np.random.RandomState(0).randn(2, 64, 40), jnp.float32)
    out = asr_mod.forward(
        params, cfg.model, feat, jnp.asarray([64, 40]), decode_step=7,
        teacher=jnp.ones((2, 7), jnp.int32),
    )
    assert out["att_logits"].shape == (2, 7, 15)
    assert out["ctc_log_probs"].shape[0] == 2 and out["ctc_log_probs"].shape[2] == 15
    assert out["align"].shape[:2] == (2, 7)


def _overfit(cfg, n_steps=150, seed=0):
    """Train on one tiny synthetic batch; return final state + batch."""
    vocab = 16
    rng = np.random.RandomState(seed)
    b, n, l = 4, 8000, 10
    wav = (0.1 * rng.randn(b, n)).astype(np.float32)
    # distinct per-utterance tone patterns so the mapping is learnable
    tt = np.arange(n) / 16000.0
    text = np.zeros((b, l), np.int32)
    text_len = np.zeros((b,), np.int32)
    for i in range(b):
        toks = rng.randint(2, vocab, size=l - 4)
        for j, tok in enumerate(toks):
            seg = slice(j * (n // len(toks)), (j + 1) * (n // len(toks)))
            wav[i, seg] += 0.4 * np.sin(2 * np.pi * (300 + 80 * tok) * tt[seg]).astype(np.float32)
        text[i, : len(toks)] = toks
        text[i, len(toks)] = 1  # eos
        text_len[i] = len(toks) + 1
    batch = {
        "wav": jnp.asarray(wav),
        "wav_len": jnp.asarray([n] * b),
        "text": jnp.asarray(text),
        "text_len": jnp.asarray(text_len),
    }
    params, _ = asr_mod.asr_init(jax.random.PRNGKey(seed), 40, vocab, cfg.model)
    tx = build_optimizer(cfg.hparas)
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    step = jax.jit(make_train_step(cfg, tx))
    losses = []
    for i in range(n_steps):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    return state, batch, losses, vocab


def test_overfit_attention_only():
    # no VGG prenet: its 4x freq pooling blurs the synthetic pure tones;
    # real speech training uses it, the integration bar here is exact recovery
    cfg = tiny_cfg(ctc_weight=0.0, attention_mode="location", prenet="")
    cfg.model.encoder.sample_rate = [2, 1]
    cfg.hparas.optimizer = "Adam"
    cfg.hparas.lr = 3e-3
    state, batch, losses, vocab = _overfit(cfg, n_steps=400)
    assert losses[-1] < 0.05, f"did not overfit: {losses[::80]}"
    # greedy decode recovers the transcripts exactly
    from e2e_asr_tpu.ops.frontend import compute_features

    feat, feat_len = compute_features(batch["wav"], batch["wav_len"], cfg.data.audio)
    toks, _ = greedy_decode(state.params, cfg.model, feat, feat_len, max_step=10)
    toks = np.asarray(toks)
    text, text_len = np.asarray(batch["text"]), np.asarray(batch["text_len"])
    for i in range(len(text)):
        gold = list(text[i, : text_len[i]])
        hyp = list(toks[i])
        hyp = hyp[: hyp.index(1) + 1] if 1 in hyp else hyp
        assert hyp == gold, f"utt {i}: {hyp} != {gold}"


def test_overfit_joint_ctc():
    cfg = tiny_cfg(ctc_weight=0.5, attention_mode="dot", prenet="")
    cfg.model.encoder.sample_rate = [2, 1]
    cfg.hparas.optimizer = "Adam"
    cfg.hparas.lr = 3e-3
    state, batch, losses, vocab = _overfit(cfg, n_steps=250, seed=3)
    assert losses[-1] < 1.0, f"joint loss did not drop: {losses[::50]}"
    assert losses[-1] < losses[0] * 0.35
    # CTC head alone should also recover transcripts greedily
    from e2e_asr_tpu.ops.frontend import compute_features

    feat, feat_len = compute_features(batch["wav"], batch["wav_len"], cfg.data.audio)
    ids, enc_len = ctc_greedy_decode(state.params, cfg.model, feat, feat_len)
    ids = np.asarray(ids)
    text, text_len = np.asarray(batch["text"]), np.asarray(batch["text_len"])

    def collapse(seq):
        out, prev = [], -1
        for s_ in seq:
            if s_ != prev and s_ != 0:
                out.append(int(s_))
            prev = s_
        return out

    recovered = sum(
        collapse(ids[i, : int(enc_len[i])]) == list(text[i, : text_len[i] - 1])
        for i in range(len(text))
    )
    assert recovered >= 3, f"ctc greedy recovered only {recovered}/4"
