"""Multimodal (binary-column) plumbing.

Images / audio / video ride through the engine as opaque ``binary`` columns
with typed metadata structs — the Spark-side contract (schema, partitioning,
Arrow batch shape, UDF signatures) is real and tested; the actual codecs are
stubbed (no image/audio libraries in this container) behind
``DecoderRegistry``: a deterministic fake decoder for tests, and a
``NotImplementedError`` decoder marking where PIL/ffmpeg drop in.

Pattern: ``mapInPandas`` over (id, content, media_type) — per Arrow batch
the decoder yields fixed-shape feature rows. Batch-bounded memory: one batch
of decoded frames lives at a time, never a partition's worth.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("content_hash", T.StringType(), True),
        T.StructField("status", T.StringType(), False),
    ]
)


def real_decoder(content: bytes, media_type: str) -> np.ndarray:
    """Drop-in point for PIL/librosa/ffmpeg — not available in this container."""
    raise NotImplementedError(
        "media codecs are not installed in this environment; "
        "register a real decoder via DecoderRegistry for production"
    )


def fake_decoder(content: bytes, media_type: str, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in: feature = normalized bytes of sha256(content)."""
    digest = hashlib.sha256(content).digest()
    arr = np.frombuffer(digest[:dim], dtype=np.uint8).astype(np.float32)
    return arr / 255.0


def real_resizer(content: bytes, width: int, height: int) -> bytes:
    """Drop-in point for PIL.Image.resize — not available in this container."""
    raise NotImplementedError(
        "PIL/ffmpeg are not installed in this environment; "
        "register a real resizer via DecoderRegistry.register_resizer"
    )


def fake_resizer(content: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in: content XOR-folded to width·height bytes."""
    n = width * height
    folded = bytearray(n)
    for i, b in enumerate(content):
        folded[i % n] ^= b
    return bytes(folded)


class DecoderRegistry:
    _decoders: dict[str, Callable] = {"fake": fake_decoder, "real": real_decoder}
    _resizers: dict[str, Callable] = {"fake": fake_resizer, "real": real_resizer}

    @classmethod
    def get(cls, name: str) -> Callable:
        return cls._decoders[name]

    @classmethod
    def register(cls, name: str, fn: Callable) -> None:
        cls._decoders[name] = fn

    @classmethod
    def get_resizer(cls, name: str) -> Callable:
        return cls._resizers[name]

    @classmethod
    def register_resizer(cls, name: str, fn: Callable) -> None:
        cls._resizers[name] = fn


def extract_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """media(MEDIA_SCHEMA) → FEATURE_SCHEMA via one Arrow stage.

    The decoder is resolved to a CALLABLE on the driver and shipped in the
    closure — resolving the name worker-side would only see the registry
    entries present at module import, so a custom
    ``DecoderRegistry.register``-ed decoder (the documented production
    path) would KeyError on every executor. Per-row degradation: a blob
    the decoder rejects (truncated image, bad codec) yields a
    ``decode_error`` status row instead of failing the task — at scale one
    corrupt blob must not abort the job."""
    decode = DecoderRegistry.get(decoder)  # driver-side resolution

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats, sizes, hashes, status = [], [], [], [], []
            for mid, mtype, content in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"]
            ):
                ids.append(mid)
                if content is None:
                    feats.append(None)
                    sizes.append(None)
                    hashes.append(None)
                    status.append("null_content")
                    continue
                content = bytes(content)
                sizes.append(len(content))
                hashes.append(hashlib.md5(content).hexdigest())
                try:
                    feats.append(decode(content, mtype).tolist())
                    status.append("ok")
                except NotImplementedError:
                    feats.append(None)
                    status.append("decoder_unavailable")
                except Exception:
                    feats.append(None)
                    status.append("decode_error")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "feature": feats,
                    "n_bytes": pd.array(sizes, dtype="Int32"),
                    "content_hash": hashes,
                    "status": status,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("status", T.StringType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def resize_media(
    media: DataFrame, width: int = 64, height: int = 64, decoder: str = "fake"
) -> DataFrame:
    """media → RESIZED_SCHEMA, one Arrow stage per batch of blobs.

    The 'fake' resizer is a deterministic byte-fold standing in for
    PIL.Image.resize (not installed here): output = content folded to
    width·height bytes. Same contract as :func:`extract_features`: the
    resizer is resolved driver-side through the registry (so
    ``register_resizer``-ed callables reach executors) and failures
    degrade PER ROW — ``decoder_unavailable`` for an unimplemented
    resizer, ``decode_error`` for a blob it rejects — never a task
    abort."""
    resize = DecoderRegistry.get_resizer(decoder)  # driver-side resolution

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, blobs, status = [], [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                ids.append(mid)
                if content is None:
                    ws.append(None); hs.append(None); blobs.append(None)
                    status.append("null_content")
                    continue
                try:
                    out = resize(bytes(content), width, height)
                    ws.append(width); hs.append(height)
                    blobs.append(out); status.append("ok")
                except NotImplementedError:
                    ws.append(None); hs.append(None); blobs.append(None)
                    status.append("decoder_unavailable")
                except Exception:
                    ws.append(None); hs.append(None); blobs.append(None)
                    status.append("decode_error")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "content": blobs,
                    "status": status,
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    frame_bytes: int = 256,
) -> DataFrame:
    """video media → one row per sampled frame (FRAME_SCHEMA).

    Deterministic fake framing: the blob is treated as a contiguous byte
    stream, frame k = bytes [k·frame_bytes, (k+1)·frame_bytes). A real
    ffmpeg seek-decode drops in at the marked line. Emitting rows (not an
    array column) keeps frames independently partitionable downstream —
    the point of the plumbing at 100 TB."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                buf = bytes(content)
                n_frames = min(max_frames, max(len(buf) // frame_bytes, 0))
                for k in range(n_frames):
                    ids.append(mid)
                    idxs.append(k)
                    tss.append(k * every_ms)
                    # real decoder drops in here (ffmpeg seek + decode)
                    frames.append(buf[k * frame_bytes : (k + 1) * frame_bytes])
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "ts_ms": pd.array(tss, dtype="int32"),
                    "frame": frames,
                }
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def pages_html_as_media(pages: DataFrame) -> DataFrame:
    """Adapter: the pages table's html binary column as a media table."""
    return pages.select(
        F.col("url").alias("media_id"),
        F.lit("text/html").alias("media_type"),
        F.col("html").alias("content"),
        F.lit(None)
        .cast(MEDIA_SCHEMA["meta"].dataType)
        .alias("meta"),
    )
