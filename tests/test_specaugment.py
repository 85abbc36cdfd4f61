"""Behavioral SpecAugment coverage (round-3 verdict weak item 3: the op had
config-parse coverage only). Asserts the contract of ops/specaugment.py:
disable => identity, time masks stay inside each utterance's valid length,
mask widths/counts respect the config bounds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.config import SpecAugmentConfig
from e2e_asr_tpu.ops.specaugment import specaugment

B, T, D = 4, 64, 20


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    feat = jnp.asarray(rng.rand(B, T, D).astype(np.float32) + 0.5)  # strictly > 0
    feat_len = jnp.asarray([T, T // 2, 10, T - 5], dtype=jnp.int32)
    return feat, feat_len


def test_disabled_is_identity():
    feat, feat_len = _inputs()
    cfg = SpecAugmentConfig(enable=False)
    out = specaugment(feat, feat_len, cfg, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(feat))


def test_zero_masks_is_identity():
    feat, feat_len = _inputs()
    cfg = SpecAugmentConfig(enable=True, freq_mask_num=0, time_mask_num=0)
    out = specaugment(feat, feat_len, cfg, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(feat))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_time_masks_respect_feat_len(seed):
    """Frames at or beyond feat_len must be untouched by TIME masks: run
    with freq masks off and check the invalid tail is bit-identical."""
    feat, feat_len = _inputs(seed)
    cfg = SpecAugmentConfig(
        enable=True, freq_mask_num=0, time_mask_num=2, time_mask_width=30
    )
    out = np.asarray(specaugment(feat, feat_len, cfg, jax.random.PRNGKey(seed)))
    ref = np.asarray(feat)
    for i, l in enumerate(np.asarray(feat_len)):
        np.testing.assert_array_equal(out[i, l:], ref[i, l:])


@pytest.mark.parametrize("seed", range(5))
def test_mask_width_and_count_bounds(seed):
    """Masked cells are exactly 0; per-utterance masked-frame count is
    bounded by num * width for time masks (and num * width for freq)."""
    feat, feat_len = _inputs(seed)
    cfg = SpecAugmentConfig(
        enable=True,
        freq_mask_num=1,
        freq_mask_width=5,
        time_mask_num=2,
        time_mask_width=8,
    )
    out = np.asarray(specaugment(feat, feat_len, cfg, jax.random.PRNGKey(100 + seed)))
    ref = np.asarray(feat)
    changed = out != ref
    # any changed cell must be exactly zeroed (mask value is 0 post-CMVN)
    assert np.all(out[changed] == 0.0)
    for i in range(B):
        # a fully-masked time frame (all D changed) counts as a time mask hit
        t_masked = np.sum(np.all(changed[i], axis=1))
        assert t_masked <= cfg.time_mask_num * cfg.time_mask_width
        # freq masks zero a bin across every frame; detect them on valid
        # frames NOT swallowed by a time mask (those change all bins anyway)
        l = int(np.asarray(feat_len)[i])
        clean_rows = [t for t in range(l) if not np.all(changed[i, t])]
        if clean_rows:
            f_masked = np.sum(np.all(changed[i, clean_rows], axis=0))
            assert f_masked <= cfg.freq_mask_num * cfg.freq_mask_width


def test_time_mask_ratio_caps_width():
    """time_mask_ratio bounds mask width by a fraction of the utterance:
    with ratio=0.1 and len=10, at most 1 frame per mask may be zeroed."""
    feat, feat_len = _inputs()
    cfg = SpecAugmentConfig(
        enable=True,
        freq_mask_num=0,
        time_mask_num=1,
        time_mask_width=100,
        time_mask_ratio=0.1,
    )
    for seed in range(6):
        out = np.asarray(specaugment(feat, feat_len, cfg, jax.random.PRNGKey(seed)))
        changed = out != np.asarray(feat)
        for i, l in enumerate(np.asarray(feat_len)):
            t_masked = np.sum(np.all(changed[i], axis=1))
            assert t_masked <= max(int(l * 0.1), 0) + 0, (seed, i, t_masked)
