"""Minimal FLAC *encoder* — test oracle for the native C++ decoder.

Emits spec-conformant streams exercising every decode path: CONSTANT,
VERBATIM, FIXED(0-4), LPC subframes; Rice/Rice2 partitioned residuals with
escape codes; wasted bits are not emitted (decoder covers them but real
encoders rarely use them); mono and stereo with left/right/mid-side
decorrelation. Not an efficient encoder — correctness only.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.cur = 0
        self.nbits = 0

    def bits(self, value: int, n: int):
        value &= (1 << n) - 1
        for i in range(n - 1, -1, -1):
            self.cur = (self.cur << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.bytes.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def sbits(self, value: int, n: int):
        self.bits(value & ((1 << n) - 1), n)

    def align(self):
        while self.nbits:
            self.bits(0, 1)

    def data(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def rice_encode(bw: BitWriter, residual: Sequence[int], param: int, method: int, escape_bits: Optional[int]):
    plen = 4 if method == 0 else 5
    if escape_bits is not None:
        bw.bits((1 << plen) - 1, plen)
        bw.bits(escape_bits, 5)
        for v in residual:
            bw.sbits(v, escape_bits)
        return
    bw.bits(param, plen)
    for v in residual:
        u = (v << 1) if v >= 0 else (-v << 1) - 1
        q = u >> param
        for _ in range(q):  # unary: q zeros then a stop 1
            bw.bits(0, 1)
        bw.bits(1, 1)
        if param:
            bw.bits(u & ((1 << param) - 1), param)


def write_residual(bw: BitWriter, residual: List[int], order: int, blocksize: int,
                   porder: int = 0, param: int = 6, method: int = 0,
                   escape_bits: Optional[int] = None):
    bw.bits(method, 2)
    bw.bits(porder, 4)
    nparts = 1 << porder
    idx = 0
    for p in range(nparts):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        rice_encode(bw, residual[idx : idx + n], param, method, escape_bits)
        idx += n


def write_subframe(bw: BitWriter, samples: List[int], bps: int, kind: str,
                   order: int = 2, lpc_coefs: Optional[List[int]] = None,
                   lpc_shift: int = 5, lpc_precision: int = 12,
                   porder: int = 0, param: int = 6, method: int = 0,
                   escape_bits: Optional[int] = None):
    bw.bits(0, 1)  # pad
    n = len(samples)
    if kind == "constant":
        bw.bits(0, 6)
        bw.bits(0, 1)
        bw.sbits(samples[0], bps)
    elif kind == "verbatim":
        bw.bits(1, 6)
        bw.bits(0, 1)
        for v in samples:
            bw.sbits(v, bps)
    elif kind == "fixed":
        bw.bits(0x08 | order, 6)
        bw.bits(0, 1)
        for v in samples[:order]:
            bw.sbits(v, bps)
        coef = FIXED_COEF[order]
        residual = [
            samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coef))
            for i in range(order, n)
        ]
        write_residual(bw, residual, order, n, porder, param, method, escape_bits)
    elif kind == "lpc":
        assert lpc_coefs is not None
        order = len(lpc_coefs)
        bw.bits(0x20 | (order - 1), 6)
        bw.bits(0, 1)
        for v in samples[:order]:
            bw.sbits(v, bps)
        bw.bits(lpc_precision - 1, 4)
        bw.sbits(lpc_shift, 5)
        for c in lpc_coefs:
            bw.sbits(c, lpc_precision)
        residual = [
            samples[i]
            - (sum(c * samples[i - 1 - j] for j, c in enumerate(lpc_coefs)) >> lpc_shift)
            for i in range(order, n)
        ]
        write_residual(bw, residual, order, n, porder, param, method, escape_bits)
    else:
        raise ValueError(kind)


def write_flac(
    path: str,
    channels: List[List[int]],
    sample_rate: int = 16000,
    bps: int = 16,
    block_size: int = 1024,
    kind: str = "fixed",
    stereo_mode: str = "independent",  # independent | left_side | right_side | mid_side
    **sub_kw,
):
    n = len(channels[0])
    nch = len(channels)
    head = BitWriter()
    head.bytes += b"fLaC"
    # STREAMINFO (last metadata block)
    head.bits(1, 1)
    head.bits(0, 7)
    head.bits(34, 24)
    head.bits(block_size, 16)
    head.bits(block_size, 16)
    head.bits(0, 24)
    head.bits(0, 24)
    head.bits(sample_rate, 20)
    head.bits(nch - 1, 3)
    head.bits(bps - 1, 5)
    head.bits(n, 36)
    for _ in range(16):
        head.bits(0, 8)

    out = bytearray(head.data())
    frame_idx = 0
    for start in range(0, n, block_size):
        bs = min(block_size, n - start)
        fb = BitWriter()
        fb.bits(0x3FFE, 14)
        fb.bits(0, 1)
        fb.bits(0, 1)  # fixed blocksize strategy
        fb.bits(7, 4)  # 16-bit blocksize-1 follows
        fb.bits(0, 4)  # sample rate from STREAMINFO
        ch_code = {"independent": nch - 1, "left_side": 8, "right_side": 9, "mid_side": 10}[stereo_mode]
        fb.bits(ch_code, 4)
        fb.bits(0, 3)  # bps from STREAMINFO
        fb.bits(0, 1)
        assert frame_idx < 128
        fb.bits(frame_idx, 8)  # utf8 single byte
        fb.bits(bs - 1, 16)
        hdr = fb.data()
        fb.bytes.append(crc8(hdr))

        blocks = [ch[start : start + bs] for ch in channels]
        sub_bps = [bps] * nch
        if stereo_mode != "independent":
            l, r = blocks
            side = [a - b for a, b in zip(l, r)]
            if stereo_mode == "left_side":
                blocks = [l, side]
                sub_bps = [bps, bps + 1]
            elif stereo_mode == "right_side":
                blocks = [side, r]
                sub_bps = [bps + 1, bps]
            else:  # mid_side
                mid = [(a + b) >> 1 for a, b in zip(l, r)]
                blocks = [mid, side]
                sub_bps = [bps, bps + 1]
        for cdata, cbps in zip(blocks, sub_bps):
            write_subframe(fb, cdata, cbps, kind, **sub_kw)
        fb.align()
        frame = fb.data()
        c16 = crc16(frame)
        fb.bits(c16, 16)
        out += fb.data()
        frame_idx += 1

    with open(path, "wb") as f:
        f.write(out)
