"""Config-surface coverage: every reference knob (module/GRU, sample_style
concat, layer_norm, CNN prenet, multi-head dot/location attention,
multi-layer decoder, MFCC/delta frontends) builds and runs fwd+bwd."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e2e_asr_tpu.config import Config
from e2e_asr_tpu.models import asr as asr_mod
from e2e_asr_tpu.training.step import compute_loss


def build_cfg(**model_over):
    enc = {
        "prenet": "vgg",
        "module": "LSTM",
        "bidirection": True,
        "dim": [32, 32],
        "dropout": [0.1, 0.1],
        "layer_norm": [False, False],
        "proj": [True, True],
        "sample_rate": [1, 1],
        "sample_style": "drop",
    }
    enc.update(model_over.pop("encoder", {}))
    att = {"mode": "dot", "dim": 24, "num_head": 1}
    att.update(model_over.pop("attention", {}))
    dec = {"module": "LSTM", "dim": 32, "layer": 1, "dropout": 0.1}
    dec.update(model_over.pop("decoder", {}))
    d = {
        "data": {"audio": {"feat_dim": 40, "use_pallas": False}},
        "hparas": {"dtype": "float32"},
        "model": {
            "ctc_weight": 0.5,
            "encoder": enc,
            "attention": att,
            "decoder": dec,
            **model_over,
        },
    }
    return Config.from_dict(d)


def run_fwd_bwd(cfg, feat_dim=40):
    vocab = 14
    params, _ = asr_mod.asr_init(jax.random.PRNGKey(0), feat_dim, vocab, cfg.model)
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(2, 6000).astype(np.float32))
    text = jnp.asarray(rng.randint(2, vocab, (2, 6)).astype(np.int32))

    def loss(p):
        return compute_loss(
            p, cfg, wav, jnp.asarray([6000, 4800]), text, jnp.asarray([6, 5]),
            0.7, jax.random.PRNGKey(1), train=True,
        )[0]

    l, g = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(l)), f"loss not finite: {l}"
    gn = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(gn) and gn > 0
    return float(l)


@pytest.mark.parametrize(
    "name,cfg_kw",
    [
        ("gru_encoder", {"encoder": {"module": "GRU"}}),
        ("unidirectional", {"encoder": {"bidirection": False}}),
        ("concat_pyramid", {"encoder": {"sample_rate": [2, 2], "sample_style": "concat", "prenet": ""}}),
        ("drop_pyramid", {"encoder": {"sample_rate": [2, 2], "sample_style": "drop", "prenet": ""}}),
        ("layer_norm", {"encoder": {"layer_norm": [True, True]}}),
        ("no_proj", {"encoder": {"proj": [False, False]}}),
        ("cnn_prenet", {"encoder": {"prenet": "cnn"}}),
        ("no_prenet", {"encoder": {"prenet": ""}}),
        ("multihead_dot", {"attention": {"mode": "dot", "num_head": 4}}),
        ("multihead_location", {"attention": {"mode": "location", "num_head": 2, "loc_kernel_size": 6, "loc_kernel_num": 3}}),
        ("v_proj", {"attention": {"v_proj": True}}),
        ("deep_decoder", {"decoder": {"layer": 2}}),
        ("gru_decoder", {"decoder": {"module": "GRU"}}),
        ("ctc_only", {"ctc_weight": 1.0}),
        ("att_only", {"ctc_weight": 0.0}),
        ("specaugment", {"specaugment": {"enable": True, "freq_mask_num": 1, "freq_mask_width": 5, "time_mask_num": 1, "time_mask_width": 10}}),
    ],
)
def test_model_variant(name, cfg_kw):
    cfg = build_cfg(**cfg_kw)
    run_fwd_bwd(cfg)


def test_mfcc_delta_frontend_model():
    cfg = build_cfg()
    cfg.data.audio.feat_type = "mfcc"
    cfg.data.audio.feat_dim = 40
    cfg.data.audio.num_ceps = 13
    cfg.data.audio.delta_order = 2
    assert cfg.data.audio.output_dim == 39
    run_fwd_bwd(cfg, feat_dim=39)


def test_warmup_scheduler_and_sgd():
    from e2e_asr_tpu.optim import build_optimizer, build_schedule
    from e2e_asr_tpu.config import HparasConfig

    h = HparasConfig(optimizer="SGD", lr=0.1, lr_scheduler="warmup", warmup_step=100)
    sched = build_schedule(h)
    s1, s100, s10000 = (float(sched(jnp.asarray(s))) for s in (1, 100, 10000))
    assert s1 < s100 and s10000 < s100  # warmup then decay
    tx = build_optimizer(h)
    p = {"w": jnp.ones(3)}
    st = tx.init(p)
    up, _ = tx.update({"w": jnp.ones(3)}, st, p)
    assert np.isfinite(np.asarray(up["w"])).all()
