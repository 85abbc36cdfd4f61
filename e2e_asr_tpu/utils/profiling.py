"""Profiling / tracing utilities (SURVEY §5: jax.profiler + per-kernel
roofline accounting vs per-chip speed-of-light).

The reference has only a wall-clock Timer (src/util.py); production TPU
training needs (a) Perfetto/TensorBoard traces and (b) a quick analytic
roofline: are we compute-bound or HBM-bound, and how far from peak.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Callable, Dict

import jax
import numpy as np

# TPU v5e (1 chip) nominal peak numbers.
PEAK_BF16_FLOPS = 197e12
PEAK_F32_FLOPS = 49e12
PEAK_HBM_GBPS = 819e9

# MEASURED envelope of the chip behind this session's axon tunnel
# (2026-08-19, on-device microbenchmarks with value-readback timing; see
# BASELINE.md "Measured hardware envelope"). Far below nominal — use these
# for speed-of-light ratios or every roofline reads ~10x pessimistic.
MEASURED_BF16_FLOPS = 77e12  # REFUTED as a chip ceiling round 5 (see below)
MEASURED_HBM_READ_GBPS = 84e9  # REFUTED round 4: real programs sustain ~290 GB/s
MEASURED_HBM_WRITE_GBPS = 54e9
MEASURED_DISPATCH_FLOOR_S = 1.3e-3  # per jitted-call overhead through the tunnel

# Round-5 correction (tools/exp_mxu_envelope.py): a CHAIN of dependent
# 4096^3 bf16 matmuls inside one jitted program sustains 137.9 TF/s — the
# round-1 "77 TF/s measured envelope" timed a single 8k-cube dispatch
# through the tunnel and was dispatch/wall-noise-bound, the same artifact
# that produced the refuted 84 GB/s HBM figure. Speed-of-light ratios use
# this sustained figure (70% of the 197 TF/s nominal peak).
MEASURED_SUSTAINED_BF16_FLOPS = 137.9e12


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median wall seconds per call. `fn` must return something reducible;
    completion is forced by a value readback (the axon tunnel's
    block_until_ready does not synchronize)."""
    for _ in range(warmup):
        out = fn(*args)
    _force(out)
    times = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        _force(out)
        times.append((time.time() - t0) / iters)
    return float(np.median(times))


def _force(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


@dataclass
class Roofline:
    name: str
    seconds: float
    flops: float = 0.0
    bytes_moved: float = 0.0
    dtype_peak: float = MEASURED_BF16_FLOPS
    hbm_peak: float = (MEASURED_HBM_READ_GBPS + MEASURED_HBM_WRITE_GBPS) / 2

    @property
    def achieved_tflops(self) -> float:
        return self.flops / self.seconds / 1e12

    @property
    def sol_compute(self) -> float:
        """Fraction of compute speed-of-light (measured envelope)."""
        return (self.flops / self.dtype_peak) / self.seconds if self.flops else 0.0

    @property
    def sol_memory(self) -> float:
        return (self.bytes_moved / self.hbm_peak) / self.seconds if self.bytes_moved else 0.0

    def report(self) -> str:
        parts = [f"{self.name}: {self.seconds*1e3:.2f} ms"]
        if self.flops:
            parts.append(f"{self.achieved_tflops:.1f} TFLOP/s ({100*self.sol_compute:.0f}% SoL)")
        if self.bytes_moved:
            parts.append(f"{100*self.sol_memory:.0f}% HBM SoL")
        bound = "compute" if self.sol_compute >= self.sol_memory else "memory"
        parts.append(f"{bound}-bound")
        return " | ".join(parts)


def kernel_rooflines(cfg, b: int, t_frames: int, l_tokens: int, vocab: int) -> Dict[str, Roofline]:
    """Analytic FLOP/byte counts for the three headline kernels at a given
    bucket shape (BASELINE.json: STFT, recurrence, beam profiles)."""
    sr = cfg.data.audio.sample_rate
    win = int(sr * cfg.data.audio.frame_length / 1000)
    n_fft = 1 << (win - 1).bit_length()
    n_freq = n_fft // 2 + 1
    mel = cfg.data.audio.feat_dim
    stft_flops = b * t_frames * (2 * 2 * win * n_freq + 2 * n_freq * mel)
    stft_bytes = 4 * b * (t_frames * 160 + t_frames * mel)

    enc = cfg.model.encoder
    t_enc = t_frames // 4  # post-VGG
    d_in = 128 * (mel // 4)
    lstm_flops = 0.0
    for i, h in enumerate(enc.dim):
        gates = 4 * h
        lstm_flops += b * t_enc * 2 * (2 * (d_in * gates + h * gates))  # bi
        d_in = 2 * h
        t_enc //= enc.sample_rate[i]
    lstm_bytes = 0.0
    for h in enc.dim:  # recurrent weights re-read per step is the floor
        lstm_bytes += 2 * (t_frames // 4) * (h * 4 * h) * 2

    return {
        "stft": Roofline("stft+mel", 0.0, stft_flops, stft_bytes, PEAK_F32_FLOPS),
        "recurrence": Roofline("pyramidal BiLSTM", 0.0, lstm_flops, lstm_bytes),
    }
