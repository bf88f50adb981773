"""Vectorized ZigZag + LEB128 varint coding for int64/uint64 arrays.

Capability analog of the reference's ZigZag (`util/ZigZagUtil.java:27-45`)
and its Simple-8b packer (`compress/Simple8.java:56-215`) — we use the
standard varint wire format instead (same job: small magnitudes → few
bytes), because it vectorizes cleanly in numpy on both encode and decode.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_MAXB = 10  # max varint bytes for a u64


def zigzag_encode(v: np.ndarray) -> np.ndarray:
    """int64 -> uint64, small magnitudes (either sign) -> small codes."""
    v = np.asarray(v, dtype=np.int64)
    return ((v << 1) ^ (v >> 63)).view(np.uint64)


def zigzag_decode(u: np.ndarray) -> np.ndarray:
    u = np.asarray(u, dtype=np.uint64)
    return ((u >> _U64(1)).view(np.int64)) ^ -((u & _U64(1)).view(np.int64))


def varint_encode(u: np.ndarray) -> bytes:
    """uint64 array -> LEB128 bytes, fully vectorized (no per-row Python)."""
    u = np.ascontiguousarray(u, dtype=np.uint64)
    n = u.size
    if n == 0:
        return b""
    nbytes = np.ones(n, dtype=np.int64)
    for k in range(1, _MAXB):
        nbytes += (u >= _U64(1) << _U64(7 * k)).astype(np.int64)
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=offsets[1:])
    total = int(offsets[-1] + nbytes[-1])
    out = np.zeros(total, dtype=np.uint8)
    for k in range(_MAXB):
        mask = nbytes > k
        if not mask.any():
            break
        vals = (u[mask] >> _U64(7 * k)) & _U64(0x7F)
        cont = np.where(nbytes[mask] - 1 > k, np.uint8(0x80), np.uint8(0))
        out[offsets[mask] + k] = vals.astype(np.uint8) | cont
    return out.tobytes()


def varint_size(u: np.ndarray) -> int:
    """Total LEB128 bytes the array would encode to — without encoding.
    Lets a codec chooser rank candidate streams in a few vector passes."""
    u = np.asarray(u, dtype=np.uint64)
    if u.size == 0:
        return 0
    nbytes = np.ones(u.size, dtype=np.int64)
    for k in range(1, _MAXB):
        nbytes += (u >= _U64(1) << _U64(7 * k)).astype(np.int64)
    return int(nbytes.sum())


def varint_decode(buf: bytes, n: int) -> np.ndarray:
    """LEB128 bytes -> uint64 array of length n, fully vectorized."""
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    ends = np.flatnonzero((b & 0x80) == 0)
    if ends.size < n:
        raise ValueError(f"varint stream truncated: {ends.size} < {n}")
    ends = ends[:n]
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    out = np.zeros(n, dtype=np.uint64)
    for k in range(int(lens.max())):
        mask = lens > k
        out[mask] |= (b[starts[mask] + k] & np.uint8(0x7F)).astype(np.uint64) << _U64(7 * k)
    return out
