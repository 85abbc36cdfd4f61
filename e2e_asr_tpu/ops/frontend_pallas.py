"""Fused Pallas TPU kernel: raw audio -> log-mel spectrogram.

Replaces the reference's CPU torchaudio/Kaldi feature path (src/audio.py)
with a single on-device kernel. Design notes (TPU-first, not a translation):

- DC-offset removal and pre-emphasis are *linear* maps on a frame, so they
  are folded into the windowed real-DFT bases offline:
      frame_processed = A @ frame,  A = E_preemph @ (I - J/win)
      re = frameᵀ (Aᵀ Wc),  im = frameᵀ (Aᵀ Ws)
  leaving the kernel as pure MXU work: two [TB,win]x[win,F] matmuls, a
  VPU square-add, one [TB,F]x[F,M] mel matmul, and a log.
- Framing never materializes in HBM. Each grid step DMAs the audio span it
  needs (overlapping windows) from HBM into VMEM and builds the frame
  matrix by a chunk-reshape + static-slice concat: with hop `shift` and
  K = ceil(win/shift), frame i = concat(chunk[i..i+K-1])[:win].
- Grid = (batch, frame-blocks); weights stay resident in VMEM across steps.

The pure-XLA oracle in ops/frontend.py defines the semantics; tests assert
this kernel matches it to float tolerance.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from e2e_asr_tpu.config import AudioConfig
from e2e_asr_tpu.ops import frontend as fe

_LOG_FLOOR = 1.1921e-7


@functools.lru_cache(maxsize=None)
def fused_bases(
    win: int, n_fft: int, window: str, preemphasis: float, remove_dc: bool = True
) -> Tuple[np.ndarray, np.ndarray]:
    """(Aᵀ Wc, Aᵀ Ws) with DC removal + pre-emphasis folded in. [win, F]."""
    wc, ws = fe.dft_matrices(win, n_fft, window)
    a = np.eye(win, dtype=np.float64)
    if remove_dc:
        a = a - np.full((win, win), 1.0 / win)
    if preemphasis > 0:
        e = np.eye(win, dtype=np.float64)
        idx = np.arange(1, win)
        e[idx, idx - 1] = -preemphasis
        e[0, 0] = 1.0 - preemphasis
        a = e @ a
    return (a.T @ wc).astype(np.float32), (a.T @ ws).astype(np.float32)


def _dot3(x: jnp.ndarray, w_hi: jnp.ndarray, w_lo: jnp.ndarray) -> jnp.ndarray:
    """f32-accurate matmul in 3 bf16 MXU passes (vs 6 for Precision.HIGHEST).

    x and w are split into leading/residual bf16 parts (~16 mantissa bits
    combined); the x_lo @ w_lo cross term (~2^-32 relative) is dropped. The
    weight split is precomputed host-side; x splits on the VPU here.
    """
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    f32 = jnp.float32
    return (
        jnp.dot(x_hi, w_hi, preferred_element_type=f32)
        + jnp.dot(x_hi, w_lo, preferred_element_type=f32)
        + jnp.dot(x_lo, w_hi, preferred_element_type=f32)
    )


def _kernel(wav_ref, wc_ref, wcl_ref, ws_ref, wsl_ref, fb_ref, out_ref, span_ref, sem, *, tb, win, shift, k):
    b = pl.program_id(0)
    j = pl.program_id(1)
    # One aligned DMA of tb+8 chunks (start j*tb and size are sublane-aligned;
    # 8 >= k-1 extra chunks cover the frame overlap into the next block).
    dma = pltpu.make_async_copy(wav_ref.at[b, pl.ds(j * tb, tb + 8), :], span_ref, sem)
    dma.start()
    dma.wait()
    span = span_ref[:]
    # frame i = chunks i..i+k-1: shift with roll so every concat operand
    # sits at sublane offset 0 (Mosaic-friendly), then fuse on the lane dim.
    parts = [
        span[:tb] if i == 0 else pltpu.roll(span, shift=tb + 8 - i, axis=0)[:tb]
        for i in range(k)
    ]
    frames = jnp.concatenate(parts, axis=1)
    re = _dot3(frames, wc_ref[:], wcl_ref[:])
    im = _dot3(frames, ws_ref[:], wsl_ref[:])
    power = re * re + im * im
    # mel matmul is tiny (K=F, N=n_mels) — full HIGHEST precision
    mel = jnp.dot(
        power, fb_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[0] = jnp.log(jnp.maximum(mel, _LOG_FLOOR))


def log_mel_pallas(
    wav: jnp.ndarray,
    cfg: AudioConfig,
    win: int,
    shift: int,
    n_fft: int,
    block_frames: int = 256,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """[B, N] f32 audio -> [B, T, n_mels] log-mel. T = 1+(N-win)//shift."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n = wav.shape
    t = max(1, 1 + (n - win) // shift)
    k = -(-win // shift)  # ceil
    tb = min(block_frames, max(8, ((t + 7) // 8) * 8))  # sublane-aligned DMA
    nblk = -(-t // tb)
    span_samples = (nblk * tb + 8) * shift  # +8 chunks: aligned-DMA overread
    if span_samples > n:
        wav = jnp.pad(wav, ((0, 0), (0, span_samples - n)))
    # Pre-chunk so the in-kernel DMA is a clean 2-D slice (no shape casts).
    # The chunk lane dim must be 128-aligned for sliced DMA, so each
    # shift-sample chunk is padded to `cpad` lanes (zeros are inert: the
    # DFT basis rows at padded positions are zero).
    cpad = ((shift + 127) // 128) * 128
    wav = wav[:, :span_samples].reshape(b, nblk * tb + 8, shift)
    if cpad != shift:
        wav = jnp.pad(wav, ((0, 0), (0, 0), (0, cpad - shift)))

    wc, ws = fused_bases(win, n_fft, cfg.window, cfg.preemphasis)
    fb = fe.mel_filterbank(cfg.feat_dim, n_fft, cfg.sample_rate, cfg.low_freq, cfg.high_freq)
    # scatter basis rows into the padded-chunk layout: frame sample s lives
    # at lane (s // shift) * cpad + s % shift of the [tb, k*cpad] frame matrix
    s_idx = np.arange(win)
    rows = (s_idx // shift) * cpad + s_idx % shift
    wc_p = np.zeros((k * cpad, wc.shape[1]), np.float32)
    ws_p = np.zeros((k * cpad, ws.shape[1]), np.float32)
    wc_p[rows] = wc
    ws_p[rows] = ws
    wc, ws = wc_p, ws_p

    # host-side bf16 hi/lo split of the DFT bases (see _dot3)
    wc_hi = wc.astype(np.float32).astype(jnp.bfloat16)
    wc_lo = (wc - np.asarray(wc_hi, np.float32)).astype(jnp.bfloat16)
    ws_hi = ws.astype(np.float32).astype(jnp.bfloat16)
    ws_lo = (ws - np.asarray(ws_hi, np.float32)).astype(jnp.bfloat16)

    nfreq = wc.shape[1]
    nmel = fb.shape[1]
    wspec = pl.BlockSpec((k * cpad, nfreq), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, tb=tb, win=win, shift=shift, k=k),
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # raw audio stays in HBM
            wspec, wspec, wspec, wspec,
            pl.BlockSpec((nfreq, nmel), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tb, nmel), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nblk * tb, nmel), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tb + 8, cpad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        wav.astype(jnp.float32),
        jnp.asarray(wc_hi), jnp.asarray(wc_lo),
        jnp.asarray(ws_hi), jnp.asarray(ws_lo),
        jnp.asarray(fb),
    )
    return out[:, :t]
