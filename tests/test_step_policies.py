"""Training-step policy tests: CTC-infeasible semantics + frontend dither.

VERDICT round-1 items 7 & 8 — pin both behaviors:
- hparas.ctc_infeasible='skip' (default) reproduces the reference's
  CTCLoss(zero_infinity=False) -> inf loss -> NaN-skip (whole step dropped,
  params untouched; ref: bin/train_asr.py:~75 + src/solver.py:~backward).
- 'mask' trains on the feasible utterances only (finite loss, params move).
- audio.dither (ref: src/audio.py kaldi fbank dither) perturbs train-time
  features only; eval features are deterministic.
"""

import jax
import jax.numpy as jnp
import numpy as np

from e2e_asr_tpu.config import AudioConfig, Config
from e2e_asr_tpu.models import asr as asr_mod
from e2e_asr_tpu.ops.frontend import compute_features


def _cfg(ctc_infeasible="skip"):
    return Config.from_dict(
        {
            "data": {"audio": {"feat_dim": 40, "use_pallas": False}},
            "hparas": {"optimizer": "Adam", "lr": 1e-3, "dtype": "float32",
                       "ctc_infeasible": ctc_infeasible},
            "model": {
                "ctc_weight": 0.5,
                "encoder": {
                    "prenet": "vgg",
                    "dim": [16, 16], "dropout": [0.0] * 2,
                    "layer_norm": [False] * 2, "proj": [True] * 2,
                    "sample_rate": [1, 1], "sample_style": "drop",
                },
                "attention": {"mode": "dot", "dim": 16, "num_head": 1},
                "decoder": {"dim": 16, "layer": 1},
            },
        }
    )


def _batch_with_infeasible(vocab=12):
    """Row 0 feasible; row 1 infeasible (label longer than enc frames)."""
    rng = np.random.RandomState(0)
    b, n, l = 2, 6000, 34  # 6000 samples -> 36 frames -> 9 post-VGG
    wav = (rng.randn(b, n) * 0.1).astype(np.float32)
    text = np.zeros((b, l), np.int32)
    text_len = np.zeros((b,), np.int32)
    # feasible: 5 labels + eos
    text[0, :5] = rng.randint(3, vocab, size=5)
    text[0, 5] = 1
    text_len[0] = 6
    # infeasible: 33 labels + eos > 9 enc frames
    text[1, : l - 1] = rng.randint(3, vocab, size=l - 1)
    text[1, l - 1] = 1
    text_len[1] = l
    return {
        "wav": jnp.asarray(wav),
        "wav_len": jnp.asarray(np.full((b,), n, np.int32)),
        "text": jnp.asarray(text),
        "text_len": jnp.asarray(text_len),
    }


def _run_one_step(mode):
    from e2e_asr_tpu.optim import build_optimizer
    from e2e_asr_tpu.training.step import TrainState, make_train_step

    cfg = _cfg(mode)
    vocab = 12
    params, _ = asr_mod.asr_init(jax.random.PRNGKey(0), 40, vocab, cfg.model)
    tx = build_optimizer(cfg.hparas)
    state = TrainState(params, tx.init(params), jnp.asarray(0, jnp.int32))
    step = jax.jit(make_train_step(cfg, tx))
    new_state, metrics = step(state, _batch_with_infeasible(vocab), jax.random.PRNGKey(1))
    return params, new_state, metrics


def test_ctc_infeasible_skip_reference_parity():
    params, new_state, m = _run_one_step("skip")
    assert not np.isfinite(float(m["ctc_loss"]))  # inf propagates (zero_infinity=False)
    assert float(m["step_skipped"]) == 1.0
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # untouched


def test_ctc_infeasible_mask_trains_on_rest():
    params, new_state, m = _run_one_step("mask")
    assert np.isfinite(float(m["loss"]))
    assert float(m["step_skipped"]) == 0.0
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(new_state.params))
    )
    assert changed


def test_dither_train_only():
    acfg_on = AudioConfig(feat_dim=40, use_pallas=False, dither=1e-3)
    acfg_off = AudioConfig(feat_dim=40, use_pallas=False, dither=0.0)
    rng = np.random.RandomState(0)
    wav = jnp.asarray((rng.randn(2, 8000) * 0.1).astype(np.float32))
    wav_len = jnp.asarray(np.array([8000, 6000], np.int32))
    key = jax.random.PRNGKey(7)

    f_ref, _ = compute_features(wav, wav_len, acfg_off)
    f_eval, _ = compute_features(wav, wav_len, acfg_on)  # no rng => eval path
    np.testing.assert_array_equal(np.asarray(f_ref), np.asarray(f_eval))

    f_tr, len_tr = compute_features(wav, wav_len, acfg_on, rng=key)
    assert np.all(np.isfinite(np.asarray(f_tr)))
    diff = np.abs(np.asarray(f_tr) - np.asarray(f_ref))
    assert diff.max() > 0  # dither perturbs features
    # small dither is a perturbation, not a rewrite
    valid = np.arange(f_ref.shape[1])[None, :] < np.asarray(len_tr)[:, None]
    assert np.median(diff[valid]) < 1.0

    # deterministic given the key; different keys differ
    f_tr2, _ = compute_features(wav, wav_len, acfg_on, rng=key)
    np.testing.assert_array_equal(np.asarray(f_tr), np.asarray(f_tr2))
    f_tr3, _ = compute_features(wav, wav_len, acfg_on, rng=jax.random.PRNGKey(8))
    assert np.abs(np.asarray(f_tr3) - np.asarray(f_tr)).max() > 0


def test_dither_pallas_path_matches_oracle_dither():
    """Dither is applied pre-kernel, so Pallas and oracle agree on the same key."""
    acfg_p = AudioConfig(feat_dim=40, use_pallas=True, dither=1e-3)
    rng = np.random.RandomState(1)
    wav = jnp.asarray((rng.randn(1, 8000) * 0.1).astype(np.float32))
    wav_len = jnp.asarray(np.array([8000], np.int32))
    key = jax.random.PRNGKey(3)
    f_p, _ = compute_features(wav, wav_len, acfg_p, rng=key)
    f_o, _ = compute_features(wav, wav_len, acfg_p, use_pallas=False, rng=key)
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_o), rtol=1e-4, atol=1e-4)
