"""Wall-clock phase timer (ref: src/util.py Timer)."""

from __future__ import annotations

import time


class Timer:
    def __init__(self):
        self.prev_t = time.time()
        self.clear()

    def set(self):
        self.prev_t = time.time()

    def cnt(self, mode: str) -> None:
        self.time_table[mode] += time.time() - self.prev_t
        self.set()
        if mode == "bw":
            self.click += 1

    def show(self) -> str:
        total = sum(self.time_table.values())
        if total == 0:
            return ""
        msg = " | ".join(
            f"{k} {v:.2f}s ({100*v/total:.0f}%)" for k, v in self.time_table.items()
        )
        self.clear()
        return msg

    def clear(self):
        self.time_table = {"rd": 0.0, "fw": 0.0, "bw": 0.0}
        self.click = 0
