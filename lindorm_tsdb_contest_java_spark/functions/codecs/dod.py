"""Delta-of-delta + ZigZag + varint for int64 sequences.

Capability analog of the reference's timestamp codec
(`compress/LongCompress.java:13-30`: sorted deltas + Simple-8b) and its
int-column delta paths (`compress/IntCompress.java:541-`), per the target
spec ("delta-of-delta + ZigZag varint for timestamps/turn_idx").

Wire format: <u64le n> [<i64le first> <zstd(varint zigzag(d0), zigzag(dod_1..))>]
The zstd-3 envelope collapses the long zero runs a regular grid produces
(the reference gets the same effect from Simple-8b's 240-zeros-per-word
selector plus its own zstd envelope). Arithmetic is mod 2^64 on both
sides, so round-trip is exact even for adversarial full-range inputs.
"""

from __future__ import annotations

import struct

import numpy as np

from .framing import zstd_compress, zstd_decompress
from .varint import varint_decode, varint_encode, zigzag_decode, zigzag_encode

_HDR = struct.Struct("<Q")
_I64 = struct.Struct("<q")


def dod_encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.int64)
    n = v.size
    if n == 0:
        return _HDR.pack(0)
    head = _HDR.pack(n) + _I64.pack(int(v[0]))
    if n == 1:
        return head
    deltas = np.diff(v)
    stream = np.empty(n - 1, dtype=np.int64)
    stream[0] = deltas[0]
    np.subtract(deltas[1:], deltas[:-1], out=stream[1:])
    return head + zstd_compress(varint_encode(zigzag_encode(stream)))


def dod_decode(blob: bytes) -> np.ndarray:
    (n,) = _HDR.unpack_from(blob, 0)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    (first,) = _I64.unpack_from(blob, 8)
    if n == 1:
        return np.array([first], dtype=np.int64)
    dod = zigzag_decode(varint_decode(zstd_decompress(blob[16:]), n - 1))
    deltas = np.cumsum(dod)  # wraps mod 2^64, mirroring encode
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    np.add(first, np.cumsum(deltas), out=out[1:])
    return out
