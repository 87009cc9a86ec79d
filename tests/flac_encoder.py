"""Minimal-but-valid FLAC encoder, used to generate test fixtures for the
first-party native decoder (native/audiodec/flac.cpp).

FLAC is lossless, so `decode(encode(x)) == x` exactly — a perfect golden
test with no reference decoder in the environment. The encoder emits real
streams: STREAMINFO, correct CRC-8/CRC-16, UTF-8 frame numbers, Rice-coded
residuals, CONSTANT / VERBATIM / FIXED(0-2) / LPC subframes, and
independent / left-side / mid-side stereo. No third-party code; written
from the public format spec.
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        if bits == 0:
            return
        value &= (1 << bits) - 1
        self.acc = (self.acc << bits) | value
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, bits: int):
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def _utf8_num(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    if n < 0x800:
        return bytes([0xC0 | (n >> 6), 0x80 | (n & 0x3F)])
    return bytes([0xE0 | (n >> 12), 0x80 | ((n >> 6) & 0x3F),
                  0x80 | (n & 0x3F)])


def _zigzag(r: np.ndarray) -> np.ndarray:
    return np.where(r >= 0, 2 * r, -2 * r - 1).astype(np.int64)


def _write_rice_residual(bw: BitWriter, res: np.ndarray,
                         partition_order: int = 0, order: int = 0,
                         blocksize: int = 0, escape: bool = False):
    bw.write(0, 2)  # method 0: 4-bit rice params
    bw.write(partition_order, 4)
    nparts = 1 << partition_order
    psize = blocksize >> partition_order
    idx = 0
    for p in range(nparts):
        count = psize - (order if p == 0 else 0)
        part = res[idx: idx + count]
        idx += count
        if escape:
            bw.write(0xF, 4)  # escape: raw n-bit samples
            raw_bits = max(int(np.abs(part).max()).bit_length() + 1, 1) \
                if len(part) else 1
            bw.write(raw_bits, 5)
            for v in part:
                bw.write_signed(int(v), raw_bits)
            continue
        zz = _zigzag(part)
        mean = float(zz.mean()) if len(zz) else 0.0
        k = max(int(mean).bit_length() - 1, 0) if mean >= 1 else 0
        k = min(k, 14)
        bw.write(k, 4)
        for v in zz:
            v = int(v)
            bw.write_unary(v >> k)
            if k:
                bw.write(v, k)


def _write_subframe(bw: BitWriter, s: np.ndarray, bps: int, mode: str,
                    partition_order: int = 0, escape: bool = False):
    s = s.astype(np.int64)
    n = len(s)
    bw.write(0, 1)  # padding
    if mode == "constant":
        assert (s == s[0]).all()
        bw.write(0x00, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(int(s[0]), bps)
    elif mode == "verbatim":
        bw.write(0x01, 6)
        bw.write(0, 1)
        for v in s:
            bw.write_signed(int(v), bps)
    elif mode.startswith("fixed"):
        order = int(mode[-1])
        bw.write(0x08 | order, 6)
        bw.write(0, 1)
        for v in s[:order]:
            bw.write_signed(int(v), bps)
        if order == 0:
            res = s
        elif order == 1:
            res = s[1:] - s[:-1]
        elif order == 2:
            res = s[2:] - 2 * s[1:-1] + s[:-2]
        else:
            raise ValueError(mode)
        _write_rice_residual(bw, res, partition_order, order, n, escape)
    elif mode == "lpc":
        # order-2 LPC with fixed coefficients [3, -1], shift 1:
        # pred[i] = (3*s[i-1] - s[i-2]) >> 1  (arithmetic shift)
        order, shift, precision = 2, 1, 12
        coefs = [3, -1]
        bw.write(0x20 | (order - 1), 6)
        bw.write(0, 1)
        for v in s[:order]:
            bw.write_signed(int(v), bps)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, precision)
        pred = (3 * s[1:-1] - s[:-2]) >> 1
        res = s[2:] - pred
        _write_rice_residual(bw, res, partition_order, order, n, escape)
    else:
        raise ValueError(mode)


def encode_flac(samples: np.ndarray, sample_rate: int, *,
                block_size: int = 1024, mode: str = "fixed2",
                stereo: str = "independent", partition_order: int = 0,
                escape: bool = False) -> bytes:
    """samples: int16 (n,) mono or (n, 2) stereo -> FLAC stream bytes."""
    samples = np.asarray(samples, np.int64)
    stereo_file = samples.ndim == 2
    n_total = samples.shape[0]
    nch = 2 if stereo_file else 1
    bps = 16

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = bytearray()
    si += int(block_size).to_bytes(2, "big") * 2         # min/max blocksize
    si += (0).to_bytes(3, "big") * 2                      # min/max framesize
    packed = (sample_rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) \
        | n_total
    si += packed.to_bytes(8, "big")
    si += bytes(16)                                       # md5 (unset)
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si

    for fi, start in enumerate(range(0, n_total, block_size)):
        blk = samples[start: start + block_size]
        bs = blk.shape[0]
        hdr = BitWriter()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1)          # reserved
        hdr.write(0, 1)          # fixed blocking
        hdr.write(7, 4)          # blocksize: 16-bit at end of header
        hdr.write(13, 4)         # sample rate: 16-bit Hz at end of header
        if not stereo_file:
            ch_asgn = 0
        elif stereo == "independent":
            ch_asgn = 1
        elif stereo == "left_side":
            ch_asgn = 8
        elif stereo == "mid_side":
            ch_asgn = 10
        else:
            raise ValueError(stereo)
        hdr.write(ch_asgn, 4)
        hdr.write(4, 3)          # 16-bit samples
        hdr.write(0, 1)          # reserved
        hdr.align()
        hdr_bytes = bytearray(hdr.bytes())
        hdr_bytes += _utf8_num(fi)
        hdr_bytes += int(bs - 1).to_bytes(2, "big")
        hdr_bytes += int(sample_rate).to_bytes(2, "big")
        hdr_bytes.append(crc8(bytes(hdr_bytes)))

        bw = BitWriter()
        if not stereo_file:
            chans = [(blk, bps)]
        elif ch_asgn == 1:
            chans = [(blk[:, 0], bps), (blk[:, 1], bps)]
        elif ch_asgn == 8:       # left/side (side = l - r, bps+1)
            chans = [(blk[:, 0], bps), (blk[:, 0] - blk[:, 1], bps + 1)]
        else:                    # mid/side
            mid = (blk[:, 0] + blk[:, 1]) >> 1
            side = blk[:, 0] - blk[:, 1]
            chans = [(mid, bps), (side, bps + 1)]
        for cs, cbps in chans:
            m = mode
            if m.startswith("fixed") and int(m[-1]) >= len(cs):
                m = "verbatim"
            if m == "lpc" and len(cs) <= 2:
                m = "verbatim"
            if m == "constant" and not (cs == cs[0]).all():
                m = "verbatim"
            po = partition_order if bs % (1 << partition_order) == 0 else 0
            _write_subframe(bw, cs, cbps, m, po, escape)
        bw.align()
        frame = bytes(hdr_bytes) + bw.bytes()
        frame += crc16(frame).to_bytes(2, "big")
        out += frame
    return bytes(out)


def write_flac(path: str, samples: np.ndarray, sample_rate: int, **kw):
    with open(path, "wb") as f:
        f.write(encode_flac(samples, sample_rate, **kw))
