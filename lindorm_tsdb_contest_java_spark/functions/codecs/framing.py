"""zstd framing helpers (pyarrow-backed) + section packing.

pyarrow's zstd decompressor needs the uncompressed size, so every
compressed blob here is framed as ``<u64le uncompressed_size><zstd bytes>``.
"""

from __future__ import annotations

import struct

import pyarrow as pa

_U64 = struct.Struct("<Q")


def zstd_compress(data: bytes, level: int = 3) -> bytes:
    """Frame + compress. Level 3 mirrors the reference's default block level
    (IntCompress.java:1292, StringCompress zstd-3)."""
    codec = pa.Codec("zstd", compression_level=level)
    out = codec.compress(data, asbytes=True)
    return _U64.pack(len(data)) + out


def zstd_decompress(blob: bytes) -> bytes:
    (size,) = _U64.unpack_from(blob, 0)
    if size == 0:
        return b""
    codec = pa.Codec("zstd")
    return codec.decompress(blob[8:], decompressed_size=size, asbytes=True)


def pack_sections(*sections: bytes) -> bytes:
    """Concatenate sections with a u64 length header each (analog of the
    reference's 8-byte section-length headers, DoubleCompress.java:221-294)."""
    parts = []
    for s in sections:
        parts.append(_U64.pack(len(s)))
        parts.append(s)
    return b"".join(parts)


def unpack_sections(blob: bytes, n: int) -> list[bytes]:
    out = []
    off = 0
    for _ in range(n):
        (size,) = _U64.unpack_from(blob, off)
        off += 8
        out.append(blob[off : off + size])
        off += size
    return out
