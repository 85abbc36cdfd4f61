"""Embedding-regularizer plugin tests (ref: src/plugin.py, flag-gated)."""

import numpy as np
import jax
import jax.numpy as jnp

from e2e_asr_tpu.config import Config, EmbRegConfig
from e2e_asr_tpu.models import asr as asr_mod
from e2e_asr_tpu.models import plugin as plugin_mod
from e2e_asr_tpu.training.step import compute_loss


def cfg_with_plugin(weight=0.3, fuse=0.0):
    return Config.from_dict(
        {
            "data": {"audio": {"feat_dim": 40, "use_pallas": False}},
            "hparas": {"dtype": "float32"},
            "model": {
                "ctc_weight": 0.0,
                "encoder": {
                    "prenet": "",
                    "dim": [32],
                    "dropout": [0.0],
                    "layer_norm": [False],
                    "proj": [True],
                    "sample_rate": [2],
                    "sample_style": "drop",
                },
                "attention": {"mode": "dot", "dim": 24, "num_head": 1},
                "decoder": {"dim": 32, "layer": 1},
                "emb_reg": {"enable": True, "weight": weight, "fuse": fuse, "dim": 20},
            },
        }
    )


def test_emb_reg_loss_range_and_grad():
    cfg = EmbRegConfig(enable=True, dim=16, weight=1.0)
    p = plugin_mod.emb_reg_init(jax.random.PRNGKey(0), 32, 10, cfg)
    rng = np.random.RandomState(0)
    hidden = jnp.asarray(rng.randn(2, 5, 32), jnp.float32)
    tgt = jnp.asarray(rng.randint(0, 10, (2, 5)).astype(np.int32))
    tl = jnp.asarray([5, 3])
    loss = plugin_mod.emb_reg_loss(p, cfg, hidden, tgt, tl)
    assert 0.0 <= float(loss) <= 2.0
    g = jax.grad(lambda pp: plugin_mod.emb_reg_loss(pp, cfg, hidden, tgt, tl))(p)
    assert float(jnp.abs(g["proj"]["w"]).sum()) > 0
    # frozen table gets no gradient
    assert float(jnp.abs(g["table"]).sum()) == 0.0


def test_plugin_in_training_loss():
    cfg = cfg_with_plugin(weight=0.5)
    params, _ = asr_mod.asr_init(jax.random.PRNGKey(0), 40, 12, cfg.model)
    assert "emb_reg" in params
    rng = np.random.RandomState(1)
    loss, m = compute_loss(
        params,
        cfg,
        jnp.asarray(rng.randn(2, 4000).astype(np.float32)),
        jnp.asarray([4000, 4000]),
        jnp.asarray(rng.randint(2, 12, (2, 6)).astype(np.int32)),
        jnp.asarray([6, 5]),
        1.0,
        jax.random.PRNGKey(0),
        train=True,
    )
    assert "emb_reg_loss" in m and np.isfinite(float(loss))
    # weight contributes to total
    assert abs(float(m["att_loss"]) + 0.5 * float(m["emb_reg_loss"]) - float(loss)) < 1e-5


def test_fused_decoding_is_normalized_mixture():
    cfg = EmbRegConfig(enable=True, dim=16, fuse=0.4, temperature=0.5)
    p = plugin_mod.emb_reg_init(jax.random.PRNGKey(0), 32, 10, cfg)
    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.randn(3, 10), jnp.float32)
    hidden = jnp.asarray(rng.randn(3, 32), jnp.float32)
    lp = plugin_mod.fused_log_probs(p, cfg, logits, hidden)
    assert lp.shape == (3, 10)
    # mixture of log-probs, each component normalized
    base = jax.nn.log_softmax(logits, -1)
    assert not np.allclose(np.asarray(lp), np.asarray(base))
