"""Experiment: DFT/mel matmul precision HIGHEST vs HIGH in the Pallas
frontend — accuracy vs the f32 oracle and speed at bench shapes."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from e2e_asr_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from e2e_asr_tpu.config import AudioConfig
from e2e_asr_tpu.ops import frontend as fe
from e2e_asr_tpu.ops import frontend_pallas as fp
from e2e_asr_tpu.utils.profiling import time_fn

cfg = AudioConfig(feat_dim=40)
b, nfr = 128, 1632
n = nfr * 160 + 240
rng = np.random.RandomState(0)
# speech-scale audio incl. loud + near-silent rows
wav = (rng.randn(b, n) * 0.1).astype(np.float32)
wav[1] *= 8.0
wav[2] *= 1e-3
wavj = jnp.asarray(wav)

win, shift, n_fft = 400, 160, 512

f_hi = jax.jit(lambda w: fp.log_mel_pallas(w, cfg, win, shift, n_fft))
f_hi_t = jax.jit(lambda w: fp.log_mel_pallas(w, cfg, win, shift, n_fft).sum())
out_hi = np.asarray(f_hi(wavj))
sec_hi = time_fn(f_hi_t, wavj, iters=5)
print(f"HIGHEST: {sec_hi*1e3:.2f} ms")

# monkeypatch the kernel's precision
import functools

import e2e_asr_tpu.ops.frontend_pallas as mod

src_kernel = mod._kernel


def _kernel_high(*a, **k):
    import jax as _jax

    orig = _jax.lax.Precision.HIGHEST
    # swap by rebinding inside: easiest is to shadow Precision lookup — instead
    # re-implement quickly below.
    raise RuntimeError("unused")


# simpler: copy of the kernel with HIGH precision
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel2(wav_ref, wc_ref, ws_ref, fb_ref, out_ref, span_ref, sem, *, tb, win, shift, k):
    b_ = pl.program_id(0)
    j = pl.program_id(1)
    dma = pltpu.make_async_copy(wav_ref.at[b_, pl.ds(j * tb, tb + 8), :], span_ref, sem)
    dma.start()
    dma.wait()
    span = span_ref[:]
    parts = [
        span[:tb] if i == 0 else pltpu.roll(span, shift=tb + 8 - i, axis=0)[:tb]
        for i in range(k)
    ]
    frames = jnp.concatenate(parts, axis=1)
    hi = jax.lax.Precision.DEFAULT
    re = jnp.dot(frames, wc_ref[:], preferred_element_type=jnp.float32, precision=hi)
    im = jnp.dot(frames, ws_ref[:], preferred_element_type=jnp.float32, precision=hi)
    power = re * re + im * im
    mel = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32, precision=hi)
    out_ref[0] = jnp.log(jnp.maximum(mel, mod._LOG_FLOOR))


mod._kernel = _kernel2
f_h = jax.jit(lambda w: fp.log_mel_pallas(w, cfg, win, shift, n_fft))
# block_frames different so jit cache key differs => recompile with new kernel
out_h = np.asarray(f_h(wavj))
f_h_t = jax.jit(lambda w: fp.log_mel_pallas(w, cfg, win, shift, n_fft).sum())
sec_h = time_fn(f_h_t, wavj, iters=5)
print(f"DEFAULT: {sec_h*1e3:.2f} ms")
mod._kernel = src_kernel

err = np.abs(out_h[:, : out_hi.shape[1]] - out_hi)
print("max abs err (log-mel):", err.max(), " mean:", err.mean())
print("rows: loud max", err[1].max(), " quiet max", err[2].max())
