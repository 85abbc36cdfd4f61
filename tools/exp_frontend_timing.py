"""Time + accuracy of the (bf16x3) Pallas frontend vs the XLA oracle."""

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
wav = (rng.randn(b, n) * 0.1).astype(np.float32)
wav[1] *= 8.0
wav[2] *= 1e-3
wavj = jnp.asarray(wav)
win, shift, n_fft = 400, 160, 512

f_p = jax.jit(lambda w: fp.log_mel_pallas(w, cfg, win, shift, n_fft))
f_pt = jax.jit(lambda w: fp.log_mel_pallas(w, cfg, win, shift, n_fft).sum())
out_p = np.asarray(f_p(wavj)[:4])
print(f"pallas bf16x3: {time_fn(f_pt, wavj, iters=5)*1e3:.2f} ms")

# oracle on a slice (full-batch oracle is slow to move)
out_o = np.asarray(jax.jit(lambda w: fe._spectrogram_frames(
    fe.frame_signal(w, win, shift), cfg, n_fft))(wavj[:4]))
err = np.abs(out_p - out_o[:, : out_p.shape[1]])
print("max abs err vs oracle:", err.max(), " mean:", err.mean())
