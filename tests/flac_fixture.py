"""Minimal FLAC *encoder* used to generate test fixtures for the native
decoder (aid_tpu/native/flac.cpp). Pure Python, spec-faithful bitstreams:
STREAMINFO, frame headers with CRC-8/CRC-16, UTF-8 frame numbers, subframe
types CONSTANT / VERBATIM / FIXED(0-4) / LPC, Rice residual partitions with
escape codes, and independent / left-side / mid-side stereo.

This is test tooling, not a shipped component — the framework only needs to
*decode* FLAC (the LibriSpeech corpus; reference datasets/librispeech.py:40-48).
"""
import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        assert bits >= 0 and 0 <= value < (1 << bits) if bits else value == 0
        self.acc = (self.acc << bits) | value
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
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

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    for cont in range(1, 7):  # continuation bytes; total = cont + 1
        cap = 6 * cont + (6 - cont if cont < 6 else 0)
        if n < (1 << cap):
            break
    k = cont + 1  # total bytes; lead = k ones, a zero, then payload bits
    lead_prefix = (((1 << (k + 1)) - 2) << (7 - k)) & 0xFF
    shift = 6 * cont
    out = [lead_prefix | (n >> shift)]
    for _ in range(cont):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _write_residual(bw: BitWriter, res: np.ndarray, blocksize: int,
                    order: int, partition_order: int = 0,
                    rice_param=None, method: int = 0):
    """Rice-code `res` (len blocksize-order). rice_param may be an int, a
    list per partition, or 'escape<k>' to force a raw escape partition."""
    bw.write(method, 2)
    plen, escape = (4, 0xF) if method == 0 else (5, 0x1F)
    bw.write(partition_order, 4)
    parts = 1 << partition_order
    psize = blocksize >> partition_order
    assert blocksize % parts == 0 and psize >= order
    idx = 0
    for p in range(parts):
        cnt = psize - order if p == 0 else psize
        chunk = res[idx:idx + cnt]
        idx += cnt
        param = rice_param[p] if isinstance(rice_param, (list, tuple)) else rice_param
        if isinstance(param, str) and param.startswith("escape"):
            raw = int(param[6:])
            bw.write(escape, plen)
            bw.write(raw, 5)
            for v in chunk:
                bw.write_signed(int(v), raw)
            continue
        if param is None:  # pick a workable parameter
            mean = float(np.mean(np.abs(chunk))) if cnt else 0.0
            param = max(0, int(np.ceil(np.log2(mean + 1))) + 1)
            param = min(param, escape - 1)
        bw.write(param, plen)
        for v in chunk:
            u = (abs(int(v)) << 1) - (1 if int(v) < 0 else 0)  # zigzag
            bw.write_unary(u >> param)
            bw.write(u & ((1 << param) - 1), param)


def _write_subframe(bw: BitWriter, x: np.ndarray, bps: int, kind: str,
                    order: int = 2, partition_order: int = 0,
                    rice_param=None, wasted: int = 0,
                    lpc_coef=None, lpc_shift: int = 5, method: int = 0):
    bw.write(0, 1)  # pad
    if wasted:
        assert not np.any(np.asarray(x, np.int64) & ((1 << wasted) - 1))
        xs = np.asarray(x, np.int64) >> wasted
    else:
        xs = np.asarray(x, np.int64)
    eff_bps = bps - wasted
    blocksize = len(xs)
    if kind == "constant":
        assert np.all(xs == xs[0])
        bw.write(0, 6)
        bw.write(1 if wasted else 0, 1)
        if wasted:
            bw.write_unary(wasted - 1)
        bw.write_signed(int(xs[0]), eff_bps)
    elif kind == "verbatim":
        bw.write(1, 6)
        bw.write(1 if wasted else 0, 1)
        if wasted:
            bw.write_unary(wasted - 1)
        for v in xs:
            bw.write_signed(int(v), eff_bps)
    elif kind == "fixed":
        bw.write(0x08 | order, 6)
        bw.write(1 if wasted else 0, 1)
        if wasted:
            bw.write_unary(wasted - 1)
        for v in xs[:order]:
            bw.write_signed(int(v), eff_bps)
        coef = _FIXED_COEF[order]
        res = xs.copy()
        for i in range(order, blocksize):
            pred = sum(c * int(xs[i - 1 - j]) for j, c in enumerate(coef))
            res[i] = int(xs[i]) - pred
        _write_residual(bw, res[order:], blocksize, order, partition_order,
                        rice_param, method)
    elif kind == "lpc":
        coef = [int(c) for c in lpc_coef]
        order = len(coef)
        prec = max(2, max(abs(c) for c in coef).bit_length() + 1)
        bw.write(0x20 | (order - 1), 6)
        bw.write(1 if wasted else 0, 1)
        if wasted:
            bw.write_unary(wasted - 1)
        for v in xs[:order]:
            bw.write_signed(int(v), eff_bps)
        bw.write(prec - 1, 4)
        bw.write_signed(lpc_shift, 5)
        for c in coef:
            bw.write_signed(c, prec)
        res = xs.copy()
        for i in range(order, blocksize):
            acc = sum(c * int(xs[i - 1 - j]) for j, c in enumerate(coef))
            res[i] = int(xs[i]) - (acc >> lpc_shift)
        _write_residual(bw, res[order:], blocksize, order, partition_order,
                        rice_param, method)
    else:
        raise ValueError(kind)


def encode(path: str, channels: "list[np.ndarray]", fs: int, bps: int = 16,
           blocksize: int = 256, kind: str = "fixed", order: int = 2,
           partition_order: int = 0, rice_param=None, wasted: int = 0,
           stereo_mode: str = "independent", lpc_coef=None,
           lpc_shift: int = 5, method: int = 0,
           total_samples_field=None):
    """Write a FLAC file. channels: list of int arrays (equal length)."""
    nch = len(channels)
    n = len(channels[0])
    assert all(len(c) == n for c in channels)

    out = bytearray(b"fLaC")
    si = BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(fs, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n if total_samples_field is None else total_samples_field, 36)
    body = si.getvalue() + b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    for fno, start in enumerate(range(0, n, blocksize)):
        bs = min(blocksize, n - start)
        hdr = BitWriter()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1)
        hdr.write(0, 1)  # fixed blocking
        hdr.write(7, 4)  # 16-bit blocksize-1 follows
        hdr.write(0, 4)  # rate from STREAMINFO
        if nch == 1:
            ch_code = 0
        elif stereo_mode == "independent":
            ch_code = 1
        elif stereo_mode == "left_side":
            ch_code = 8
        elif stereo_mode == "right_side":
            ch_code = 9
        elif stereo_mode == "mid_side":
            ch_code = 10
        else:
            raise ValueError(stereo_mode)
        hdr.write(ch_code, 4)
        hdr.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        hdr.write(0, 1)
        hbytes = hdr.getvalue() + _utf8_number(fno)
        hbytes += (bs - 1).to_bytes(2, "big")
        hbytes += bytes([crc8(hbytes)])

        fw = BitWriter()
        subs = [np.asarray(c[start:start + bs], np.int64) for c in channels]
        if nch == 2 and stereo_mode == "left_side":
            subs = [subs[0], subs[0] - subs[1]]
            bps_per = [bps, bps + 1]
        elif nch == 2 and stereo_mode == "right_side":
            subs = [subs[0] - subs[1], subs[1]]
            bps_per = [bps + 1, bps]
        elif nch == 2 and stereo_mode == "mid_side":
            l, r = subs
            subs = [(l + r) >> 1, l - r]
            bps_per = [bps, bps + 1]
        else:
            bps_per = [bps] * nch
        for sx, sbps in zip(subs, bps_per):
            _write_subframe(fw, sx, sbps, kind, order, partition_order,
                            rice_param, wasted, lpc_coef, lpc_shift, method)
        fw.align()
        frame = hbytes + fw.getvalue()
        frame += crc16(frame).to_bytes(2, "big")
        out += frame

    with open(path, "wb") as f:
        f.write(bytes(out))
    return path
