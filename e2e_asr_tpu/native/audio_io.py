"""Native WAV decode + parallel batch packing (ref: torchaudio load inside
DataLoader worker forks, src/audio.py / src/data.py collect_audio_batch)."""

from __future__ import annotations

import ctypes
from typing import List, Tuple

import numpy as np

from e2e_asr_tpu.native import get_lib


def read_wav(path: str) -> np.ndarray:
    lib = get_lib()
    n = lib.wav_num_samples(path.encode())
    if n < 0:
        raise IOError(f"cannot read wav: {path}")
    out = np.empty(n, np.float32)
    got = lib.read_wav(path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
    if got < 0:
        raise IOError(f"cannot read wav: {path}")
    return out[:got]


def wav_num_samples(path: str) -> int:
    lib = get_lib()
    n = lib.wav_num_samples(path.encode())
    if n < 0:
        raise IOError(f"cannot read wav: {path}")
    return int(n)


def pack_batch(paths: List[str], n_samples: int, n_threads: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """Decode `paths` in parallel into a zero-padded [B, n_samples] batch.

    Returns (wav [B, n_samples] f32, wav_len [B] i64). The decode + pad +
    memcpy runs in C++ threads (no GIL, no worker forks).
    """
    lib = get_lib()
    b = len(paths)
    out = np.zeros((b, n_samples), np.float32)
    lens = np.zeros(b, np.int64)
    arr = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
    lib.pack_wav_batch(
        arr,
        b,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_samples,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_threads,
    )
    return out, lens


def read_flac(path: str) -> np.ndarray:
    """Decode FLAC channel 0 to float32 via the native decoder (csrc/flac.cpp)."""
    lib = get_lib()
    n = lib.flac_num_samples(path.encode())
    if n < 0:
        raise IOError(f"cannot parse flac: {path}")
    if n == 0:
        n = 1 << 26  # STREAMINFO total unknown: generous cap
    out = np.empty(n, np.float32)
    got = lib.flac_decode(path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
    if got < 0:
        raise IOError(f"flac decode failed: {path}")
    return out[:got]


def flac_num_samples(path: str) -> int:
    lib = get_lib()
    n = lib.flac_num_samples(path.encode())
    if n < 0:
        raise IOError(f"cannot parse flac: {path}")
    return int(n)
