"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video land as binary columns with a metadata struct; the
decode / feature-extract / resize / frame-sample kernels run as Arrow-batched
pandas functions over mapInPandas. Formats decodable without external
codec libraries are decoded FOR REAL: binary PNM images (P5 grayscale /
P6 RGB — numpy header parse + frombuffer) and PCM WAV audio (stdlib
``wave``). Compressed codecs (JPEG/PNG/MP3/H.264) are not in this
container, so payloads outside those formats fall back to a
clearly-marked deterministic stub (`_fake_decode_pixels`) — everything
downstream (resize resampling, frame timestamp selection, feature
extraction, the Arrow batch shapes and schemas) is real numpy/Spark code
that works unchanged once PIL/ffmpeg replace the fallback.

Scale notes: every kernel is mapInPandas over the payload partitioning —
no shuffle at all; batches stream through Arrow, and per-row payloads never
aggregate to the driver. Resized pixel output is (doc_id, target², ...)
rows, so output size is bounded per row regardless of input image size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = "doc_id bigint, n_bytes bigint, width int, height int"
RESIZED_SCHEMA = (
    "doc_id bigint, width int, height int, pixels array<float>, mean_gray float"
)
FRAMES_SCHEMA = "doc_id bigint, frame_idx int, ts_sec double, frame_hash bigint"


def attach_binary(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, payload: binary, media_type) — stands in for reading a real
    image/audio blob column; payload bytes ARE the real bytes flowing
    through Arrow."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def _parse_pnm(payload: bytes) -> np.ndarray | None:
    """REAL decode for binary PNM images (P5 grayscale, P6 RGB): parse the
    whitespace/comment-tolerant header, frombuffer the raster, average RGB
    to a grayscale plane. Returns None when the payload is not PNM."""
    if len(payload) < 2 or payload[:2] not in (b"P5", b"P6"):
        return None
    rgb = payload[:2] == b"P6"
    # header tokens: magic, width, height, maxval (comments start with #)
    toks: list[int] = []
    i = 2
    while len(toks) < 3 and i < len(payload):
        c = payload[i : i + 1]
        if c == b"#":
            i = payload.index(b"\n", i)
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            toks.append(int(payload[i:j]))
            i = j
    if len(toks) < 3:
        return None
    w, h, maxval = toks
    i += 1  # single whitespace byte after maxval, then the raster
    depth = 3 if rgb else 1
    dt = np.dtype(">u2") if maxval > 255 else np.uint8
    need = w * h * depth
    raster = np.frombuffer(payload, dtype=dt, count=need, offset=i).astype(np.float64)
    if maxval != 255:
        raster = raster * (255.0 / maxval)
    img = raster.reshape(h, w, depth).mean(axis=2)
    return img.astype(np.uint8)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a compressed-image header parse: derives
    dimensions from the byte length. The PNM path never reaches this."""
    n = len(payload)
    return n, 64 + n % 128, 64 + (n * 7) % 128


def _fake_decode_pixels(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for compressed codecs' byte->pixel step: tiles
    the raw payload bytes into the (height, width) uint8 plane the fake
    header declares. THIS is the only function a real deployment replaces
    (PIL.Image.open(...).convert("L") -> np.asarray); PNM payloads are
    decoded for real by _parse_pnm, and the resize and feature math
    downstream is production code either way."""
    _, w, h = _fake_decode(payload)
    raw = np.frombuffer(payload, dtype=np.uint8)
    if raw.size == 0:
        raw = np.zeros(1, dtype=np.uint8)
    reps = -(-(w * h) // raw.size)  # ceil
    return np.tile(raw, reps)[: w * h].reshape(h, w)


def _decode_pixels(payload: bytes) -> np.ndarray:
    img = _parse_pnm(bytes(payload))
    return img if img is not None else _fake_decode_pixels(payload)


def _decode_header(payload: bytes) -> tuple[int, int, int]:
    img = _parse_pnm(bytes(payload))
    if img is not None:
        return len(payload), img.shape[1], img.shape[0]
    return _fake_decode(payload)


def decode_images(df: DataFrame) -> DataFrame:
    """mapInPandas decode: Arrow batches in, decoded metadata out. The
    per-batch loop is vectorizable the moment a real decoder exists."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_header(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [d[0] for d in decoded],
                    "width": [d[1] for d in decoded],
                    "height": [d[2] for d in decoded],
                }
            )

    return df.mapInPandas(run, DECODED_SCHEMA)


def _nn_resize(img: np.ndarray, target: int) -> np.ndarray:
    """Nearest-neighbour resample to (target, target) — pure-numpy index
    gather, the same sampling PIL's Image.NEAREST performs."""
    h, w = img.shape
    rows = np.minimum((np.arange(target) * h) // target, h - 1)
    cols = np.minimum((np.arange(target) * w) // target, w - 1)
    return img[rows][:, cols]


def resize_images(df: DataFrame, target: int = 16) -> DataFrame:
    """(doc_id, width, height, pixels[target²], mean_gray) — decode each
    payload and nearest-neighbour-resample to a fixed target grid, emitting
    the flattened normalized pixel vector plus a cheap brightness feature.
    Resampling, normalization and the Arrow batch shape are real; only the
    byte->pixel codec is the documented stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = _decode_pixels(payload)
                small = _nn_resize(img, target).astype(np.float32) / 255.0
                out_rows.append(
                    (
                        int(doc_id),
                        img.shape[1],
                        img.shape[0],
                        small.ravel().tolist(),
                        float(small.mean()),
                    )
                )
            yield pd.DataFrame(
                out_rows,
                columns=["doc_id", "width", "height", "pixels", "mean_gray"],
            )

    return df.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(df: DataFrame, fps: float = 1.0, duration_s: float = 10.0) -> DataFrame:
    """(doc_id, frame_idx, ts_sec, frame_hash) — video frame sampling at
    ``fps`` over a declared clip duration: the timestamp grid, per-frame
    byte-slicing and stable content hash are real; only the ffmpeg demux
    (absent from this container) is stubbed by slicing the payload into
    equal 'frames'."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(1, int(duration_s * fps))
                b = bytes(payload)
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    chunk = b[i * step : (i + 1) * step] or b"\x00"
                    h = int.from_bytes(hashlib.md5(chunk).digest()[:6], "big")
                    rows.append((int(doc_id), i, i / fps, h))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "ts_sec", "frame_hash"]
            )

    return df.mapInPandas(run, FRAMES_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id bigint, sample_rate int, n_channels int, n_samples bigint, "
    "duration_s double, rms double"
)


def decode_audio(df: DataFrame) -> DataFrame:
    """(doc_id, sample_rate, n_channels, n_samples, duration_s, rms) —
    REAL PCM WAV decode via the stdlib ``wave`` module + numpy (16/8-bit
    PCM); non-WAV payloads yield a deterministic byte-length-derived
    fallback row (sample_rate = -1 flags it), the same honest-stub policy
    as the image path. mapInPandas, no shuffle."""
    import io
    import wave

    def one(doc_id: int, payload: bytes):
        try:
            with wave.open(io.BytesIO(bytes(payload))) as wf:
                sr, nch, nsamp = wf.getframerate(), wf.getnchannels(), wf.getnframes()
                width = wf.getsampwidth()
                raw = wf.readframes(nsamp)
            if width == 2:
                x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
            elif width == 1:
                x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
            else:
                x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) / 255.0
            rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
            return (doc_id, sr, nch, nsamp, nsamp / sr if sr else 0.0, rms)
        except Exception:
            n = len(payload)
            return (doc_id, -1, 1, n, 0.0, 0.0)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [one(int(d), p) for d, p in zip(pdf["doc_id"], pdf["payload"])]
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_channels", "n_samples",
                    "duration_s", "rms",
                ],
            )

    return df.mapInPandas(run, AUDIO_SCHEMA)
