"""Fused Pallas decode-scan kernel vs the lax.scan oracle (values + grads).

Runs the FULL asr forward twice — decoder.fused_scan='scan' vs 'pallas'
(interpret mode on CPU) — under teacher forcing (deterministic: the
scheduled-sampling coin path is identical; sampled feedback uses a
different RNG stream by design, so parity is asserted for tf_rate=1.0 and
for argmax feedback)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.config import Config
from e2e_asr_tpu.models import asr as asr_mod


def tiny_cfg():
    return Config.from_dict(
        {
            "data": {"audio": {"feat_dim": 40, "use_pallas": False}},
            "hparas": {"dtype": "float32"},
            "model": {
                "ctc_weight": 0.0,
                "encoder": {
                    "prenet": "",
                    "dim": [8],
                    "dropout": [0.0],
                    "layer_norm": [False],
                    "proj": [True],
                    "sample_rate": [2],
                    "sample_style": "drop",
                },
                "attention": {"mode": "location", "dim": 12, "num_head": 1,
                              "temperature": 0.5, "loc_kernel_size": 5,
                              "loc_kernel_num": 3},
                "decoder": {"dim": 16, "layer": 1},
            },
        }
    )


def make_inputs(b=2, t=37, l=11, vocab=9, seed=0):
    rng = np.random.RandomState(seed)
    feat = jnp.asarray(rng.randn(b, t, 40).astype(np.float32) * 0.3)
    feat_len = jnp.asarray(np.array([t, t - 9][:b] + [t - 3] * max(0, b - 2), np.int32))
    teacher = np.zeros((b, l), np.int32)
    for i in range(b):
        k = l - 2 - i
        teacher[i, :k] = rng.randint(3, vocab, size=k)
        teacher[i, k] = 1
    return feat, feat_len, jnp.asarray(teacher)


def run_path(cfg, params, feat, feat_len, teacher, fused, tf_rate, sample, train=True):
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, decoder=dataclasses.replace(
                cfg.model.decoder, fused_scan=fused)))
    out = asr_mod.forward(
        params, cfg.model, feat, feat_len, decode_step=teacher.shape[1],
        tf_rate=tf_rate, teacher=teacher, rng=jax.random.PRNGKey(5),
        train=train, sample_decoding=sample,
    )
    return out


@pytest.mark.parametrize("tf_rate,sample", [(1.0, True), (0.0, False)])
def test_fused_decode_scan_value_parity(tf_rate, sample):
    cfg = tiny_cfg()
    vocab = 9
    feat, feat_len, teacher = make_inputs(vocab=vocab)
    params, _ = asr_mod.asr_init(jax.random.PRNGKey(0), 40, vocab, cfg.model)

    o_scan = run_path(cfg, params, feat, feat_len, teacher, "scan", tf_rate, sample)
    o_pal = run_path(cfg, params, feat, feat_len, teacher, "pallas", tf_rate, sample)
    np.testing.assert_allclose(
        np.asarray(o_pal["att_logits"]), np.asarray(o_scan["att_logits"]),
        rtol=2e-3, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(o_pal["align"]), np.asarray(o_scan["align"]), rtol=2e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(o_pal["att_hidden"]), np.asarray(o_scan["att_hidden"]),
        rtol=2e-3, atol=1e-3,
    )
    # masking: alignment mass only on valid frames
    al = np.asarray(o_pal["align"])[1, :, 0, :]  # shorter utterance
    s_valid = int(np.asarray(o_pal["enc_len"])[1])
    assert np.abs(al[:, s_valid:]).max() == 0.0


def _loss_fn(cfg, fused, feat, feat_len, teacher, vocab):
    def loss(params):
        out = run_path(cfg, params, feat, feat_len, teacher, fused, 1.0, True)
        logits = out["att_logits"].astype(jnp.float32)
        mask = (jnp.arange(teacher.shape[1])[None] < 100)  # all steps
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, teacher[..., None], -1)[..., 0]
        # touch every output so all cotangent paths are exercised
        return (
            jnp.sum(nll * mask)
            + 0.01 * jnp.sum(out["align"] ** 2)
            + 0.01 * jnp.sum(jnp.tanh(out["att_hidden"]))
        )

    return loss


def test_fused_decode_scan_grad_parity():
    cfg = tiny_cfg()
    vocab = 9
    feat, feat_len, teacher = make_inputs(vocab=vocab)
    params, _ = asr_mod.asr_init(jax.random.PRNGKey(0), 40, vocab, cfg.model)

    g_scan = jax.grad(_loss_fn(cfg, "scan", feat, feat_len, teacher, vocab))(params)
    g_pal = jax.grad(_loss_fn(cfg, "pallas", feat, feat_len, teacher, vocab))(params)
    flat_s = jax.tree_util.tree_leaves_with_path(g_scan)
    flat_p = jax.tree.leaves(g_pal)
    assert len(flat_s) == len(flat_p)
    for (path, a), bb in zip(flat_s, flat_p):
        np.testing.assert_allclose(
            np.asarray(bb), np.asarray(a), rtol=1e-2, atol=1e-3,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_fused_gate_rejects_unsupported():
    from e2e_asr_tpu.ops import decoder_pallas

    cfg = tiny_cfg().model
    assert decoder_pallas.supported(cfg, train=True)
    bad = dataclasses.replace(cfg, attention=dataclasses.replace(cfg.attention, mode="dot"))
    assert not decoder_pallas.supported(bad, train=True)
    bad2 = dataclasses.replace(cfg, decoder=dataclasses.replace(cfg.decoder, layer=2))
    assert not decoder_pallas.supported(bad2, train=True)
    bad3 = dataclasses.replace(cfg, decoder=dataclasses.replace(cfg.decoder, dropout=0.5))
    assert not decoder_pallas.supported(bad3, train=True)
    assert decoder_pallas.supported(bad3, train=False)


def test_auto_select_lane_alignment_policy():
    """'auto' picks the kernel only on TPU at 128-lane-aligned enc lengths
    (measurement-driven policy — see decoder_pallas.auto_select)."""
    from e2e_asr_tpu.ops import decoder_pallas

    cfg = tiny_cfg().model
    assert decoder_pallas.auto_select(cfg, True, 512, backend="tpu")
    assert decoder_pallas.auto_select(cfg, False, 128, backend="tpu")
    assert not decoder_pallas.auto_select(cfg, True, 408, backend="tpu")
    assert not decoder_pallas.auto_select(cfg, True, 512, backend="cpu")
    bad = dataclasses.replace(
        cfg, attention=dataclasses.replace(cfg.attention, mode="dot")
    )
    assert not decoder_pallas.auto_select(bad, True, 512, backend="tpu")
