"""Gorilla-style compressed time-series segments.

Implements the two codecs from the Gorilla paper (Pelkonen et al.,
"Gorilla: A Fast, Scalable, In-Memory Time Series Database", VLDB 2015,
public knowledge):

* timestamps: delta-of-delta with the paper's variable-length ranges
  ('0' | '10'+7b | '110'+9b | '1110'+12b | '1111'+32b);
* values: XOR with leading/trailing-zero window reuse
  ('0' | '10'+reuse | '11'+5b lead+6b len+meaningful bits).

The bit plumbing is vectorized where it counts: encode analyzes all
deltas/XORs with numpy first and only loops to emit bits; decode is a
plain bit cursor.  These are segment codecs for the SegmentCompactor
actor-pool stage (stages/compress.py) — one segment = one series' points
for one tier window range.
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            return bytes(self.buf) + bytes([(self.acc << pad) & 0xFF])
        return bytes(self.buf)


class BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        out = 0
        remaining = bits
        while remaining:
            byte_i, bit_i = divmod(self.pos, 8)
            take = min(8 - bit_i, remaining)
            chunk = self.data[byte_i]
            chunk >>= (8 - bit_i - take)
            out = (out << take) | (chunk & ((1 << take) - 1))
            self.pos += take
            remaining -= take
        return out


def encode_timestamps(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode int64 timestamps (sorted)."""
    ts = np.asarray(ts, dtype=np.int64)
    w = BitWriter()
    n = len(ts)
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    if n == 1:
        return w.getvalue()
    deltas = np.diff(ts)
    w.write(int(deltas[0]) & ((1 << 64) - 1), 64)
    dod = np.diff(deltas)
    for d in dod.tolist():
        if d == 0:
            w.write(0, 1)
        elif -63 <= d <= 64:
            w.write(0b10, 2)
            w.write(d + 63, 7)
        elif -255 <= d <= 256:
            w.write(0b110, 3)
            w.write(d + 255, 9)
        elif -2047 <= d <= 2048:
            w.write(0b1110, 4)
            w.write(d + 2047, 12)
        else:
            # widened from the paper's 32-bit bucket: int64 timestamps can
            # produce arbitrarily large second-order deltas
            w.write(0b1111, 4)
            w.write(d & ((1 << 64) - 1), 64)
    return w.getvalue()


def decode_timestamps(data: bytes) -> np.ndarray:
    r = BitReader(data)
    n = r.read(32)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    first = r.read(64)
    if first >= 1 << 63:
        first -= 1 << 64
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    if n == 1:
        return out
    delta = r.read(64)
    if delta >= 1 << 63:
        delta -= 1 << 64
    out[1] = out[0] + delta
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            dod = r.read(64)
            if dod >= 1 << 63:
                dod -= 1 << 64
        delta += dod
        out[i] = out[i - 1] + delta
    return out


def _clz64(x: int) -> int:
    return 64 - x.bit_length() if x else 64


def _ctz64(x: int) -> int:
    if x == 0:
        return 64
    return (x & -x).bit_length() - 1


def encode_values(values: np.ndarray) -> bytes:
    """Gorilla XOR-encode float64 values."""
    bits = np.asarray(values, dtype=np.float64).view(np.uint64)
    w = BitWriter()
    n = len(bits)
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    prev = int(bits[0])
    w.write(prev, 64)
    lead, tlen = 65, 0  # invalid → force new window on first nonzero xor
    xors = np.bitwise_xor(bits[1:], bits[:-1])
    for x in map(int, xors.tolist()):
        if x == 0:
            w.write(0, 1)
            continue
        l, t = _clz64(x), _ctz64(x)
        l = min(l, 31)
        if lead <= 64 and l >= lead and t >= (64 - lead - tlen):
            w.write(0b10, 2)
            w.write(x >> (64 - lead - tlen), tlen)
        else:
            lead, mlen = l, 64 - l - t
            tlen = mlen
            w.write(0b11, 2)
            w.write(lead, 5)
            w.write(mlen - 1, 6)  # 1..64 stored in 6 bits
            w.write(x >> t, mlen)
    return w.getvalue()


def decode_values(data: bytes) -> np.ndarray:
    r = BitReader(data)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    cur = r.read(64)
    out[0] = cur
    lead = tlen = 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = cur
            continue
        if r.read(1) == 0:  # reuse window
            x = r.read(tlen) << (64 - lead - tlen)
        else:
            lead = r.read(5)
            mlen = r.read(6) + 1
            tlen = mlen
            x = r.read(mlen) << (64 - lead - mlen)
        cur ^= x
        out[i] = cur
    return out.view(np.float64)


def encode_segment(ts: np.ndarray, values: np.ndarray) -> dict:
    """One compressed segment with its lineage fields."""
    tb = encode_timestamps(ts)
    vb = encode_values(values)
    raw = 16 * len(ts)
    comp = len(tb) + len(vb)
    return {
        "n_points": len(ts),
        "t_min": int(ts[0]) if len(ts) else 0,
        "t_max": int(ts[-1]) if len(ts) else 0,
        "ts_bytes": tb,
        "val_bytes": vb,
        "raw_bytes": raw,
        "compressed_bytes": comp,
        "ratio": round(raw / comp, 3) if comp else 0.0,
    }


def decode_segment(seg: dict) -> tuple[np.ndarray, np.ndarray]:
    return decode_timestamps(seg["ts_bytes"]), decode_values(seg["val_bytes"])
