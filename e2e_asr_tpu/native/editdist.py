"""Native Levenshtein (ref: the C++ `editdistance` package in src/util.py)."""

from __future__ import annotations

import ctypes
from typing import List, Sequence

import numpy as np

from e2e_asr_tpu.native import get_lib


def _to_ids(seq: Sequence, vocab: dict) -> np.ndarray:
    out = np.empty(len(seq), np.int32)
    for i, s in enumerate(seq):
        out[i] = vocab.setdefault(s, len(vocab))
    return out


def distance(a: Sequence, b: Sequence) -> int:
    """Edit distance between two sequences of hashables (tokens/words)."""
    vocab: dict = {}
    aa = _to_ids(a, vocab)
    bb = _to_ids(b, vocab)
    lib = get_lib()
    pa = aa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    pb = bb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    return int(lib.levenshtein(pa, len(aa), pb, len(bb)))


def distance_batch(pairs: List) -> np.ndarray:
    """[(seq_a, seq_b), ...] -> int64 distances, multithreaded in C++."""
    vocab: dict = {}
    a_parts = [_to_ids(a, vocab) for a, _ in pairs]
    b_parts = [_to_ids(b, vocab) for _, b in pairs]
    a_off = np.zeros(len(pairs) + 1, np.int64)
    b_off = np.zeros(len(pairs) + 1, np.int64)
    np.cumsum([len(x) for x in a_parts], out=a_off[1:])
    np.cumsum([len(x) for x in b_parts], out=b_off[1:])
    a_flat = np.concatenate(a_parts) if a_parts else np.empty(0, np.int32)
    b_flat = np.concatenate(b_parts) if b_parts else np.empty(0, np.int32)
    a_flat = np.ascontiguousarray(a_flat, np.int32)
    b_flat = np.ascontiguousarray(b_flat, np.int32)
    out = np.zeros(len(pairs), np.int64)
    lib = get_lib()
    lib.levenshtein_batch(
        a_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        a_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        b_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(pairs),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        8,
    )
    return out
