"""Pure-numpy block codecs (no Spark imports here).

These reimplement, from public knowledge (the Gorilla paper, standard
varint/ZigZag coding, zstd), the *capabilities* of the reference engine's
write-path compression (`/root/reference/src/.../compress/`):

- timestamps / int metrics : delta-of-delta + ZigZag + varint
  (capability analog of LongCompress.java:13-30 / IntCompress.java:1178,
  which use Simple-8b + dict bit-packing — different algorithm, same job)
- float metrics            : Gorilla XOR bitstream
  (analog of gorilla/ValueCompressor.java:33-91)
- low-cardinality strings  : per-block dictionary + zstd
  (analog of StringCompress.java:129-250)
- text payloads            : varint lengths + zstd over concatenated UTF-8
  (analog of the big-string path, TSFileService.java:662-667)

All encoders are vectorized numpy (no per-row Python in the hot loop on
the encode side); decoders are vectorized except the Gorilla bitstream
reader, which is inherently sequential (variable-length tokens) and runs
as a tight local-variable loop.
"""

from .varint import zigzag_encode, zigzag_decode, varint_encode, varint_decode
from .dod import dod_encode, dod_decode
from .gorilla import gorilla_encode, gorilla_decode
from .strings import dict_encode, dict_decode, text_encode, text_decode
from .framing import zstd_compress, zstd_decompress

__all__ = [
    "zigzag_encode", "zigzag_decode", "varint_encode", "varint_decode",
    "dod_encode", "dod_decode",
    "gorilla_encode", "gorilla_decode",
    "dict_encode", "dict_decode", "text_encode", "text_decode",
    "zstd_compress", "zstd_decompress",
]
