"""Native (C++) host runtime: lazy build + ctypes bindings.

Replaces the native code the reference pulls in via dependencies
(`editdistance` pybind module, torchaudio/sox decode in DataLoader
workers — SURVEY §2.3) with a first-party shared library compiled from
csrc/native.cpp on first use (g++ is in the image; no pybind11 needed).
Every entry point has a pure-Python fallback so the framework still works
if the toolchain is absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LIB = None
_LOCK = threading.Lock()
_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_SRCS = [os.path.join(_CSRC, "native.cpp"), os.path.join(_CSRC, "flac.cpp")]
_OUT = os.path.join(os.path.dirname(__file__), "libe2e_native.so")


class NativeUnavailable(RuntimeError):
    pass


def _build() -> str:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC"] + [
        os.path.abspath(s) for s in _SRCS
    ] + ["-o", _OUT, "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)
    return _OUT


def get_lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        try:
            newest_src = max(os.path.getmtime(os.path.abspath(s)) for s in _SRCS)
            if not os.path.exists(_OUT) or os.path.getmtime(_OUT) < newest_src:
                _build()
            lib = ctypes.CDLL(_OUT)
        except Exception as e:  # pragma: no cover
            raise NativeUnavailable(str(e)) from e
        i64, i32p, i64p = ctypes.c_int64, ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.levenshtein.restype = i64
        lib.levenshtein.argtypes = [i32p, i64, i32p, i64]
        lib.levenshtein_batch.restype = None
        lib.levenshtein_batch.argtypes = [i32p, i64p, i32p, i64p, i64, i64p, ctypes.c_int]
        lib.read_wav.restype = i64
        lib.read_wav.argtypes = [ctypes.c_char_p, f32p, i64]
        lib.wav_num_samples.restype = i64
        lib.wav_num_samples.argtypes = [ctypes.c_char_p]
        lib.pack_wav_batch.restype = None
        lib.pack_wav_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), i64, f32p, i64, i64p, ctypes.c_int,
        ]
        lib.flac_num_samples.restype = i64
        lib.flac_num_samples.argtypes = [ctypes.c_char_p]
        lib.flac_sample_rate.restype = i64
        lib.flac_sample_rate.argtypes = [ctypes.c_char_p]
        lib.flac_decode.restype = i64
        lib.flac_decode.argtypes = [ctypes.c_char_p, f32p, i64]
        _LIB = lib
        return _LIB
