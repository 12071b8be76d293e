"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video land as binary columns with a metadata struct; the
decode / feature-extract / resize / frame-sample kernels run as Arrow-batched
pandas functions over mapInPandas. The actual codecs are NOT in this
container, so the decode step is a clearly-marked deterministic stub
(`_fake_decode`) — the Spark-side plumbing (schema, batching, partitioning,
UDF signature) is real and tested, and swapping the stub for PIL/ffmpeg is a
one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = "doc_id bigint, n_bytes bigint, width int, height int"


def attach_binary(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, payload: binary, media_type) — stands in for reading a real
    image/audio blob column; payload bytes ARE the real bytes flowing
    through Arrow."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decoder: derives fake dimensions
    from the byte length. Replace with PIL.Image.open when available."""
    n = len(payload)
    return n, 64 + n % 128, 64 + (n * 7) % 128


def decode_images(df: DataFrame) -> DataFrame:
    """mapInPandas decode: Arrow batches in, decoded metadata out. The
    per-batch loop is vectorizable the moment a real decoder exists."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [d[0] for d in decoded],
                    "width": [d[1] for d in decoded],
                    "height": [d[2] for d in decoded],
                }
            )

    return df.mapInPandas(run, DECODED_SCHEMA)


def resize_images(df: DataFrame, target: int = 224) -> DataFrame:
    """Resize stub: real implementation needs an image library."""
    raise NotImplementedError(
        "image resize requires PIL/opencv (not in this container); "
        "the mapInPandas plumbing is identical to decode_images"
    )


def sample_frames(df: DataFrame, fps: float = 1.0) -> DataFrame:
    """Video frame-sampling stub: real implementation needs ffmpeg."""
    raise NotImplementedError(
        "frame sampling requires ffmpeg (not in this container); "
        "the mapInPandas plumbing is identical to decode_images"
    )
