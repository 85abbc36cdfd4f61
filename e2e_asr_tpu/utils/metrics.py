"""Error-rate metrics (WER/CER) — host side, eval time only.

Parity with the reference's src/util.py cal_er, which wraps the C++
`editdistance` package. A native C++ Levenshtein extension lives in
csrc/ (built lazily); this module falls back to a pure-Python DP when the
extension is unavailable so the framework stays dependency-free.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _edit_distance_py(a: Sequence, b: Sequence) -> int:
    """Levenshtein distance, O(len(a)*len(b)) numpy DP."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev = np.arange(lb + 1)
    for i in range(1, la + 1):
        cur = np.empty(lb + 1, dtype=np.int64)
        cur[0] = i
        sub = prev[:-1] + (np.asarray([a[i - 1] != x for x in b], dtype=np.int64))
        # cur[j] = min(prev[j]+1, cur[j-1]+1, sub[j-1]) — vectorize via scan
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, sub[j - 1])
        prev = cur
    return int(prev[lb])


_native = None


def edit_distance(a: Sequence, b: Sequence) -> int:
    global _native
    if _native is None:
        try:
            from e2e_asr_tpu.native import editdist as _ed

            _native = _ed.distance
        except Exception:
            _native = _edit_distance_py
    return _native(list(a), list(b))


def cal_er(
    tokenizer,
    pred_ids: np.ndarray,
    truth_ids: np.ndarray,
    mode: str = "wer",
    ctc: bool = False,
    pred_len: Optional[np.ndarray] = None,
    truth_len: Optional[np.ndarray] = None,
    counts: bool = False,
):
    """Batch error rate (ref: src/util.py cal_er).

    pred_ids/truth_ids: [B, L] int arrays (argmax or decoded). `ctc=True`
    collapses repeats before blank removal (greedy CTC decode). mode:
    'wer' (word split) | 'cer' (char split). counts=True returns the raw
    (errors, ref_length) pair instead of the ratio — exact corpus-level
    aggregation across batches/processes.
    """
    total_err, total_len = 0, 0
    for i in range(len(pred_ids)):
        p = pred_ids[i][: None if pred_len is None else int(pred_len[i])]
        t = truth_ids[i][: None if truth_len is None else int(truth_len[i])]
        hyp = tokenizer.decode(p, ignore_repeat=ctc)
        ref = tokenizer.decode(t)
        if not ref:
            continue
        h, r = (hyp.split(), ref.split()) if mode == "wer" else (list(hyp), list(ref))
        total_err += edit_distance(h, r)
        total_len += len(r)
    if counts:
        return total_err, total_len
    return total_err / max(total_len, 1)
