"""Waveform -> log-mel-fbank / MFCC feature frontend, on device.

The reference computes features per-utterance on CPU inside DataLoader
workers via torchaudio's Kaldi-compliance C++ ops (ref: src/audio.py
ExtractAudioFeature / Delta / CMVN / Postprocess, 25 ms window, 10 ms shift).
Here the frontend is a batched, jit-compiled device computation:

- this module: the pure-XLA *oracle* implementation (framing by gather,
  DFT as matmul against precomputed cosine/sine bases — MXU-friendly,
  no FFT butterfly needed at these sizes).
- ops/frontend_pallas.py: the fused Pallas production kernel (HBM->VMEM
  span DMA, framing in VMEM, window+DFT+mel+log in one pass) validated
  against this oracle.

Semantics follow Kaldi fbank/MFCC conventions (snip_edges framing,
per-frame DC removal, pre-emphasis inside the frame, povey window,
power spectrum, triangular mel bank on the mel scale) without claiming
bit-exactness to torchaudio.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from e2e_asr_tpu.config import AudioConfig


def next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def hz_to_mel(hz):
    return 1127.0 * np.log(1.0 + np.asarray(hz) / 700.0)


def mel_to_hz(mel):
    return 700.0 * (np.exp(np.asarray(mel) / 1127.0) - 1.0)


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    num_bins: int, n_fft: int, sample_rate: int, low_freq: float, high_freq: float
) -> np.ndarray:
    """Kaldi-style triangular mel filterbank matrix [n_fft//2+1, num_bins]."""
    if high_freq <= 0:
        high_freq = sample_rate / 2.0 + high_freq
    n_freqs = n_fft // 2 + 1
    mel_lo, mel_hi = hz_to_mel(low_freq), hz_to_mel(high_freq)
    centers = np.linspace(mel_lo, mel_hi, num_bins + 2)
    fft_mel = hz_to_mel(np.arange(n_freqs) * sample_rate / n_fft)
    fb = np.zeros((n_freqs, num_bins), dtype=np.float32)
    for m in range(num_bins):
        left, center, right = centers[m], centers[m + 1], centers[m + 2]
        up = (fft_mel - left) / (center - left)
        down = (right - fft_mel) / (right - center)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb


@functools.lru_cache(maxsize=None)
def feature_window(window: str, win_size: int) -> np.ndarray:
    n = np.arange(win_size, dtype=np.float64)
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * n / (win_size - 1))
    if window == "hanning":
        w = hann
    elif window == "povey":
        w = hann**0.85
    elif window == "hamming":
        w = 0.54 - 0.46 * np.cos(2 * np.pi * n / (win_size - 1))
    else:
        raise ValueError(f"unknown window '{window}'")
    return w.astype(np.float32)


@functools.lru_cache(maxsize=None)
def dft_matrices(win_size: int, n_fft: int, window: str) -> Tuple[np.ndarray, np.ndarray]:
    """Window-fused real-DFT bases: frame[w] @ Wc/Ws == windowed rFFT re/im.

    Returns (Wc, Ws), each [win_size, n_fft//2+1]. Zero-padding the frame to
    n_fft is implicit: padded rows would multiply zeros, so the bases only
    cover the first win_size samples.
    """
    w = feature_window(window, win_size).astype(np.float64)
    n = np.arange(win_size)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    wc = (w[:, None] * np.cos(ang)).astype(np.float32)
    ws = (w[:, None] * -np.sin(ang)).astype(np.float32)
    return wc, ws


@functools.lru_cache(maxsize=None)
def dct_matrix(n_mels: int, n_ceps: int) -> np.ndarray:
    """Orthonormal DCT-II matrix [n_mels, n_ceps] (kaldi MFCC convention)."""
    n = np.arange(n_mels)[:, None]
    k = np.arange(n_ceps)[None, :]
    m = np.cos(np.pi * k * (2 * n + 1) / (2.0 * n_mels)) * math.sqrt(2.0 / n_mels)
    m[:, 0] *= 1.0 / math.sqrt(2.0)
    return m.astype(np.float32)


@functools.lru_cache(maxsize=None)
def delta_kernel(window_size: int, order: int) -> np.ndarray:
    """Kaldi delta-coefficient FIR kernels, composed up to `order`.

    Returns [order+1, K] where row r is the kernel producing the r-th
    derivative (row 0 = identity), K = 2*order*window_size+1.
    (ref: src/audio.py Delta — precomputed conv kernels.)
    """
    base = np.array([1.0])
    denom = 2.0 * sum(i * i for i in range(1, window_size + 1))
    d1 = np.arange(-window_size, window_size + 1) / denom
    kernels = [base]
    for _ in range(order):
        kernels.append(np.convolve(kernels[-1], d1))
    k = 2 * order * window_size + 1
    out = np.zeros((order + 1, k), dtype=np.float32)
    for r, ker in enumerate(kernels):
        pad = (k - len(ker)) // 2
        out[r, pad : pad + len(ker)] = ker
    return out


def frame_signal(wav: jnp.ndarray, win_size: int, shift: int) -> jnp.ndarray:
    """[B, N] -> [B, T, win] frames, snip_edges (T = 1+(N-win)//shift)."""
    n = wav.shape[-1]
    t = max(0, 1 + (n - win_size) // shift)
    idx = np.arange(t)[:, None] * shift + np.arange(win_size)[None, :]
    return wav[..., idx]


def num_frames(n_samples, win_size: int, shift: int):
    return jnp.maximum(0, 1 + (n_samples - win_size) // shift)


def _spectrogram_frames(frames: jnp.ndarray, cfg: AudioConfig, n_fft: int) -> jnp.ndarray:
    """[.., T, win] frames -> [.., T, n_mels] log-mel (XLA path)."""
    frames = frames.astype(jnp.float32)
    # per-frame DC removal then pre-emphasis inside the frame (kaldi order)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if cfg.preemphasis > 0:
        first = frames[..., :1] - cfg.preemphasis * frames[..., :1]
        rest = frames[..., 1:] - cfg.preemphasis * frames[..., :-1]
        frames = jnp.concatenate([first, rest], axis=-1)
    wc, ws = dft_matrices(frames.shape[-1], n_fft, cfg.window)
    # full f32 precision: near-floor mel bins are log-amplified, and the
    # frontend is a negligible FLOP fraction of the model
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, jnp.asarray(wc), precision=hi)
    im = jnp.dot(frames, jnp.asarray(ws), precision=hi)
    power = re * re + im * im
    fb = jnp.asarray(
        mel_filterbank(cfg.feat_dim, n_fft, cfg.sample_rate, cfg.low_freq, cfg.high_freq)
    )
    mel = jnp.dot(power, fb, precision=hi)
    return jnp.log(jnp.maximum(mel, 1.1921e-7))  # float32 eps, kaldi-style floor


def apply_deltas(feat: jnp.ndarray, order: int, window_size: int) -> jnp.ndarray:
    """[B, T, D] -> [B, T, D*(order+1)] with replicate edge padding.

    ref: src/audio.py Delta (torchscript conv with precomputed kernels).
    """
    if order == 0:
        return feat
    kernels = delta_kernel(window_size, order)  # [order+1, K]
    k = kernels.shape[1]
    pad = k // 2
    x = jnp.concatenate(
        [jnp.repeat(feat[:, :1], pad, axis=1), feat, jnp.repeat(feat[:, -1:], pad, axis=1)],
        axis=1,
    )
    # conv over time, independent per feature dim: use gather-matmul
    t = feat.shape[1]
    idx = np.arange(t)[:, None] + np.arange(k)[None, :]
    windows = x[:, idx]  # [B, T, K, D]
    outs = [jnp.einsum("btkd,k->btd", windows, jnp.asarray(kernels[r])) for r in range(order + 1)]
    return jnp.concatenate(outs, axis=-1)


def apply_cmvn(feat: jnp.ndarray, feat_len: jnp.ndarray) -> jnp.ndarray:
    """Per-utterance mean/var normalization over *valid* frames.

    ref: src/audio.py CMVN (jit-scripted per-utterance norm). Masked so that
    padding frames don't pollute the statistics (the reference operates on
    unpadded per-utterance tensors; we batch, so we mask).
    """
    mask = (jnp.arange(feat.shape[1])[None, :] < feat_len[:, None])[..., None]
    denom = jnp.maximum(feat_len, 1).astype(feat.dtype)[:, None, None]
    mean = jnp.sum(feat * mask, axis=1, keepdims=True) / denom
    var = jnp.sum((feat - mean) ** 2 * mask, axis=1, keepdims=True) / denom
    return jnp.where(mask, (feat - mean) * jax.lax.rsqrt(var + 1e-10), 0.0)


def compute_features(
    wav: jnp.ndarray,
    wav_len: jnp.ndarray,
    cfg: AudioConfig,
    use_pallas: Optional[bool] = None,
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched waveform -> features. [B, N], [B] -> ([B, T, D_out], [B]).

    Equivalent of the reference's create_transform pipeline (src/audio.py):
    fbank/mfcc -> optional delta -> optional CMVN -> (T, D) layout, but
    batched, masked, and jit-compiled on device.

    Dither (ref: src/audio.py ExtractAudioFeature -> kaldi fbank `dither`):
    train-time-only Gaussian noise, applied when cfg.dither > 0 AND an rng is
    passed (the training step passes one; eval/decode pass none). Divergence
    from kaldi, documented: noise is added to the *waveform* once rather than
    to each overlapping frame, and the scale is in normalized waveform units
    (kaldi dithers int16-scale samples) — use ~1e-5-scale values.
    """
    win = int(cfg.sample_rate * cfg.frame_length / 1000.0)
    shift = int(cfg.sample_rate * cfg.frame_shift / 1000.0)
    n_fft = next_pow2(win)
    feat_len = num_frames(wav_len, win, shift)

    if cfg.feat_type == "raw":
        raise ValueError("feat_type=raw has no frontend")

    if jnp.issubdtype(wav.dtype, jnp.integer):
        # int16 PCM wire format (data.corpus.wire_dtype) -> normalized f32
        wav = wav.astype(jnp.float32) * (1.0 / 32768.0)

    if cfg.dither > 0 and rng is not None:
        wav = wav + cfg.dither * jax.random.normal(rng, wav.shape, jnp.float32)

    pallas = cfg.use_pallas if use_pallas is None else use_pallas
    if pallas:
        from e2e_asr_tpu.ops.frontend_pallas import log_mel_pallas

        logmel = log_mel_pallas(wav, cfg, win, shift, n_fft)
    else:
        frames = frame_signal(wav, win, shift)
        logmel = _spectrogram_frames(frames, cfg, n_fft)

    if cfg.feat_type == "mfcc":
        feat = logmel @ jnp.asarray(dct_matrix(cfg.feat_dim, cfg.num_ceps))
    else:
        feat = logmel

    feat = apply_deltas(feat, cfg.delta_order, cfg.delta_window_size)
    if cfg.apply_cmvn:
        feat = apply_cmvn(feat, feat_len)
    else:
        mask = (jnp.arange(feat.shape[1])[None, :] < feat_len[:, None])[..., None]
        feat = jnp.where(mask, feat, 0.0)
    return feat, feat_len
