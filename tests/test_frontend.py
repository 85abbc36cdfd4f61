"""Frontend tests: XLA oracle vs independent numpy pipeline, Pallas vs oracle.

Mirrors SURVEY.md §4 unit-test plan: "Pallas STFT/mel vs scipy golden
values". No scipy.signal/librosa dependency — the golden is a from-scratch
numpy STFT written differently (np.fft.rfft) from the matmul-DFT under test.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e2e_asr_tpu.config import AudioConfig
from e2e_asr_tpu.ops import frontend as fe
from e2e_asr_tpu.ops.frontend import compute_features


def numpy_logmel(wav, cfg: AudioConfig):
    """Independent numpy reference: frame -> dc -> preemph -> window -> rfft."""
    win = int(cfg.sample_rate * cfg.frame_length / 1000)
    shift = int(cfg.sample_rate * cfg.frame_shift / 1000)
    n_fft = fe.next_pow2(win)
    t = 1 + (len(wav) - win) // shift
    frames = np.stack([wav[i * shift : i * shift + win] for i in range(t)])
    frames = frames - frames.mean(-1, keepdims=True)
    p = cfg.preemphasis
    frames = np.concatenate(
        [frames[:, :1] - p * frames[:, :1], frames[:, 1:] - p * frames[:, :-1]], -1
    )
    w = fe.feature_window(cfg.window, win)
    spec = np.fft.rfft(frames * w, n_fft)
    power = np.abs(spec) ** 2
    fb = fe.mel_filterbank(cfg.feat_dim, n_fft, cfg.sample_rate, cfg.low_freq, cfg.high_freq)
    return np.log(np.maximum(power @ fb, 1.1921e-7))


@pytest.fixture(scope="module")
def wav_batch():
    rng = np.random.RandomState(42)
    wav = (rng.randn(3, 24000) * 0.1).astype(np.float32)
    # make it signal-like: add some tones
    tt = np.arange(24000) / 16000.0
    wav += 0.5 * np.sin(2 * np.pi * 440 * tt)[None, :].astype(np.float32)
    wav_len = np.array([24000, 17000, 9000])
    for i, l in enumerate(wav_len):
        wav[i, l:] = 0.0
    return wav, wav_len


def test_xla_oracle_matches_numpy(wav_batch):
    wav, wav_len = wav_batch
    cfg = AudioConfig(feat_dim=40, apply_cmvn=False)
    feat, feat_len = compute_features(wav, jnp.asarray(wav_len), cfg, use_pallas=False)
    for i in range(len(wav)):
        gold = numpy_logmel(wav[i, : wav_len[i]], cfg)
        assert int(feat_len[i]) == gold.shape[0]
        np.testing.assert_allclose(
            np.asarray(feat)[i, : gold.shape[0]], gold, rtol=1e-3, atol=2e-3
        )


def test_pallas_matches_oracle(wav_batch):
    wav, wav_len = wav_batch
    cfg = AudioConfig(feat_dim=80, apply_cmvn=True)
    f1, l1 = compute_features(wav, jnp.asarray(wav_len), cfg, use_pallas=False)
    f2, l2 = compute_features(wav, jnp.asarray(wav_len), cfg, use_pallas=True)
    assert (np.asarray(l1) == np.asarray(l2)).all()
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-3, atol=2e-3)


def test_mfcc_shape_and_dct(wav_batch):
    wav, wav_len = wav_batch
    cfg = AudioConfig(feat_type="mfcc", feat_dim=40, num_ceps=13, apply_cmvn=False)
    feat, _ = compute_features(wav, jnp.asarray(wav_len), cfg, use_pallas=False)
    assert feat.shape[-1] == 13
    # DCT matrix orthonormality on the retained basis
    d = fe.dct_matrix(40, 13)
    np.testing.assert_allclose(d.T @ d, np.eye(13), atol=1e-5)


def test_delta_features(wav_batch):
    wav, wav_len = wav_batch
    cfg = AudioConfig(feat_dim=40, delta_order=2, apply_cmvn=False)
    feat, _ = compute_features(wav, jnp.asarray(wav_len), cfg, use_pallas=False)
    assert feat.shape[-1] == 120
    assert cfg.output_dim == 120
    # delta of a constant sequence is 0
    const = jnp.ones((1, 50, 4))
    out = fe.apply_deltas(const, 2, 2)
    np.testing.assert_allclose(np.asarray(out[..., 4:]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[..., :4]), 1.0, atol=1e-6)


def test_cmvn_masked_stats(wav_batch):
    wav, wav_len = wav_batch
    cfg = AudioConfig(feat_dim=40, apply_cmvn=True)
    feat, feat_len = compute_features(wav, jnp.asarray(wav_len), cfg, use_pallas=False)
    feat = np.asarray(feat)
    for i, l in enumerate(np.asarray(feat_len)):
        valid = feat[i, :l]
        np.testing.assert_allclose(valid.mean(0), 0.0, atol=1e-4)
        np.testing.assert_allclose(valid.std(0), 1.0, atol=1e-2)
        np.testing.assert_allclose(feat[i, l:], 0.0)  # padding zeroed


def test_padding_invariance():
    """Same utterance, different pad length -> identical valid features."""
    rng = np.random.RandomState(0)
    wav = rng.randn(1, 8000).astype(np.float32)
    cfg = AudioConfig(feat_dim=40, apply_cmvn=True)
    f1, l1 = compute_features(wav, jnp.asarray([8000]), cfg, use_pallas=False)
    wav_padded = np.pad(wav, ((0, 0), (0, 4000)))
    f2, l2 = compute_features(wav_padded, jnp.asarray([8000]), cfg, use_pallas=False)
    t = int(l1[0])
    assert int(l2[0]) == t
    np.testing.assert_allclose(np.asarray(f1)[0, :t], np.asarray(f2)[0, :t], atol=1e-3)
