"""Delta-of-delta timestamp + Gorilla XOR value compression.

Implements the two stream codecs from the Gorilla paper (Pelkonen et al.,
VLDB 2015, "Gorilla: A Fast, Scalable, In-Memory Time Series Database"):

- timestamps: delta-of-delta with the paper's bucket code
  {'0', '10'+7b, '110'+9b, '1110'+12b, '1111'+64b};
- values: XOR with leading-zero/meaningful-bit windows
  {'0' identical, '10' fits-prior-window, '11'+5b lead+6b len+bits}.

Encoded per-series inside the same Arrow batch that writes a tier (numpy for
the bulk math — deltas, xors, clz/ctz — a tight Python loop only for bit
emission, bounded by n_tok per series, not by row count). Stored as binary
columns beside the plain arrays used for equality checks.

No reference counterpart (engine addition per the build contract); round-trip
verified by property tests.
"""

from __future__ import annotations

import struct

import numpy as np

_MASK64 = (1 << 64) - 1


class _BitWriter:
    __slots__ = ("acc", "nbits")

    def __init__(self):
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, width: int):
        self.acc = (self.acc << width) | (value & ((1 << width) - 1))
        self.nbits += width

    def bytes(self) -> bytes:
        pad = (-self.nbits) % 8
        acc = self.acc << pad
        return (acc).to_bytes((self.nbits + pad) // 8, "big") if self.nbits else b""


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = int.from_bytes(data, "big") if data else 0
        self.pos = len(data) * 8

    def read(self, width: int) -> int:
        self.pos -= width
        return (self.data >> self.pos) & ((1 << width) - 1)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


def encode_dod(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode an int64 timestamp/bucket array."""
    ts = np.asarray(ts, dtype=np.int64)
    n = ts.size
    head = struct.pack("<I", n)
    if n == 0:
        return head
    head += struct.pack("<q", int(ts[0]))
    if n == 1:
        return head
    deltas = np.diff(ts)
    head += struct.pack("<q", int(deltas[0]))
    w = _BitWriter()
    dods = np.diff(deltas)
    for dod in dods.tolist():
        if dod == 0:
            w.write(0, 1)
        elif -63 <= dod <= 64:
            w.write(0b10, 2)
            w.write(dod + 63, 7)
        elif -255 <= dod <= 256:
            w.write(0b110, 3)
            w.write(dod + 255, 9)
        elif -2047 <= dod <= 2048:
            w.write(0b1110, 4)
            w.write(dod + 2047, 12)
        else:
            w.write(0b1111, 4)
            w.write(dod & _MASK64, 64)
    return head + w.bytes()


def decode_dod(buf: bytes) -> np.ndarray:
    (n,) = struct.unpack_from("<I", buf, 0)
    if n == 0:
        return np.array([], dtype=np.int64)
    (t0,) = struct.unpack_from("<q", buf, 4)
    if n == 1:
        return np.array([t0], dtype=np.int64)
    (d0,) = struct.unpack_from("<q", buf, 12)
    r = _BitReader(buf[20:])
    out = np.empty(n, dtype=np.int64)
    out[0] = t0
    out[1] = t0 + d0
    delta = d0
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


def encode_xor(values: np.ndarray) -> bytes:
    """Gorilla XOR encode a float64 value array."""
    values = np.asarray(values, dtype=np.float64)
    n = values.size
    head = struct.pack("<I", n)
    if n == 0:
        return head
    bits = values.view(np.uint64)
    head += struct.pack("<Q", int(bits[0]))
    if n == 1:
        return head
    xors = (bits[1:] ^ bits[:-1]).tolist()
    w = _BitWriter()
    prev_lead, prev_len = -1, -1
    for x in xors:
        if x == 0:
            w.write(0, 1)
            continue
        lead = min(64 - x.bit_length(), 31)
        trail = (x & -x).bit_length() - 1
        mlen = 64 - lead - trail
        if (
            prev_lead >= 0
            and lead >= prev_lead
            and (64 - prev_lead - prev_len) <= trail
        ):
            # fits the prior window: '10' + prev_len bits
            w.write(0b10, 2)
            w.write(x >> (64 - prev_lead - prev_len), prev_len)
        else:
            w.write(0b11, 2)
            w.write(lead, 5)
            w.write(mlen & 0x3F, 6)  # 64 encodes as 0
            w.write(x >> trail, mlen)
            prev_lead, prev_len = lead, mlen
    return head + w.bytes()


def decode_xor(buf: bytes) -> np.ndarray:
    (n,) = struct.unpack_from("<I", buf, 0)
    if n == 0:
        return np.array([], dtype=np.float64)
    (b0,) = struct.unpack_from("<Q", buf, 4)
    out = np.empty(n, dtype=np.uint64)
    out[0] = b0
    if n == 1:
        return out.view(np.float64)
    r = _BitReader(buf[12:])
    lead, mlen = -1, -1
    prev = b0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 1:
            lead = r.read(5)
            mlen = r.read(6)
            if mlen == 0:
                mlen = 64
        trail = 64 - lead - mlen
        x = r.read(mlen) << trail
        prev ^= x
        out[i] = prev
    return out.view(np.float64)


def encode_series(buckets: np.ndarray, values: np.ndarray) -> tuple[bytes, bytes]:
    return encode_dod(buckets), encode_xor(values)


def decode_series(enc_buckets: bytes, enc_values: bytes) -> tuple[np.ndarray, np.ndarray]:
    return decode_dod(enc_buckets), decode_xor(enc_values)
