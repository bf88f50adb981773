"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries are not available in this environment, so
the decode kernels are STUBS behind `_decode_image` (deterministic fake)
— but the Spark-side plumbing is real and tested: schema, Arrow batch
shape, mapInPandas iterator contract, metadata extraction, and
partition-friendly layout all match what a real decoder would slot into.

At scale: payloads stay in their own binary column (parquet keeps them
out of every scan that doesn't project them), metadata columns carry the
filterable facts, and decode runs as mapInPandas over batches so one
executor core streams one Arrow batch of payloads at a time rather than
materializing the partition.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, byte_len bigint, "
    "content_md5 string"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, width int, height int, n_frames int, "
    "feature array<float>"
)


def attach_media(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Build an opaque binary payload column + typed metadata (the test
    data has no real media, so payload = utf-8 bytes of text — the
    plumbing is identical)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        (F.when(F.col(id_col) % 3 == 0, "image")
          .when(F.col(id_col) % 3 == 1, "audio")
          .otherwise("video")).alias("kind"),
        payload.alias("payload"),
        F.octet_length(F.col(text_col)).cast("long").alias("byte_len"),
        F.md5(payload).alias("content_md5"),
    )


def _decode_image(payload: bytes) -> np.ndarray:
    """STUB decoder. A real build would call PIL/libvips here. The fake is
    deterministic: a 4x4 'image' seeded by the payload digest."""
    digest = hashlib.sha256(payload).digest()
    arr = np.frombuffer(digest[:16], dtype=np.uint8).reshape(4, 4)
    return arr


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction: decode → resize/frame-sample →
    pooled feature vector. Decode itself is the stub above; everything
    around it (batching, schema, vectorized pooling) is production-shaped."""

    def run(batches):
        for pdf in batches:
            n = len(pdf)
            feats = np.zeros((n, 4), dtype=np.float32)
            widths = np.zeros(n, dtype=np.int32)
            heights = np.zeros(n, dtype=np.int32)
            frames = np.ones(n, dtype=np.int32)
            for i, (payload, kind) in enumerate(zip(pdf["payload"], pdf["kind"])):
                img = _decode_image(bytes(payload))
                if kind == "video":
                    frames[i] = 1 + (len(payload) % 8)  # frame-sample stub
                widths[i], heights[i] = img.shape[1], img.shape[0]
                feats[i] = img.mean(axis=0)  # pooled feature
            yield pd.DataFrame({
                "media_id": pdf["media_id"], "kind": pdf["kind"],
                "width": widths, "height": heights, "n_frames": frames,
                "feature": list(feats),
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
