"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A training-data pipeline at 100 TB carries media as ``binary`` columns
with a typed metadata struct, processed by Arrow-batched ``mapInPandas``
stages.  The Spark-side plumbing here is real and tested — schemas,
batch shapes, partition-size control, error quarantine — while the
actual media decoding is stubbed: image/audio libraries are not in this
container, so ``decode_image`` runs a clearly-marked deterministic fake
(header sniff + synthetic dimensions) and raises ``NotImplementedError``
from the real-codec seam when ``strict=True``.

Scale notes: media rows are large, so the operators repartition by
``pmod(xxhash64(media_id), n)`` before the Python stage to bound batch
memory (maxRecordsPerBatch alone is not enough when one row is 100 MB),
and metadata-only transforms never touch the binary column (column
pruning keeps it out of the scan).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),      # image | audio | video
    StructField("media_type", StringType(), True),  # MIME
    StructField("payload", BinaryType(), True),
    StructField("source", StringType(), True),
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("ok", StringType(), False),         # "ok" | error kind
    StructField("format", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_bytes", IntegerType(), False),
    StructField("phash", StringType(), True),       # perceptual-hash stand-in
])

_MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"GIF8": "gif",
    b"RIFF": "riff",
}


def synthesize_media(spark: SparkSession, n_rows: int) -> DataFrame:
    """Deterministic fake media corpus (binary payloads from row ids)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                seed = hashlib.sha256(str(i).encode()).digest()
                kind = ("image", "audio", "video")[i % 3]
                magic = (b"\x89PNG", b"\xff\xd8\xff", b"RIFF")[i % 3]
                payload = magic + seed * (1 + i % 4)
                rows.append((i, kind, f"{kind}/x-fake", payload, f"src{i % 5}"))
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return spark.range(n_rows).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_image_stub(payload: bytes, strict: bool):
    """The real-codec seam.  STUB: deterministic fake decode.

    With an imaging library present this is `PIL.Image.open(BytesIO(...))`;
    here we sniff the magic and derive synthetic dimensions from the
    payload hash so the full pipeline shape is exercised end-to-end.
    """
    if strict:
        raise NotImplementedError(
            "real image decoding requires an imaging library not present "
            "in this environment; run with strict=False for the "
            "deterministic fake decoder")
    fmt = None
    for magic, name in _MAGIC.items():
        if payload.startswith(magic):
            fmt = name
            break
    if fmt is None:
        raise ValueError("unrecognized image format")
    h = hashlib.sha256(payload).digest()
    width = 64 + struct.unpack(">H", h[0:2])[0] % 1985
    height = 64 + struct.unpack(">H", h[2:4])[0] % 1985
    phash = h[:8].hex()
    return fmt, width, height, phash


def image_features(media: DataFrame, strict: bool = False,
                   partitions: int | None = None) -> DataFrame:
    """Decode + feature-extract image rows (Arrow-batched, quarantined)."""
    imgs = media.filter(F.col("kind") == "image")
    if partitions:
        imgs = imgs.repartition(partitions,
                                F.pmod(F.xxhash64("media_id"), F.lit(partitions)))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                try:
                    fmt, w, hgt, ph = _decode_image_stub(payload, strict)
                    rows.append((int(mid), "ok", fmt, w, hgt, len(payload), ph))
                except NotImplementedError:
                    raise
                except Exception as e:
                    rows.append((int(mid), type(e).__name__, None, None, None,
                                 len(payload), None))
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return imgs.select("media_id", "payload").mapInPandas(
        fn, schema=IMAGE_FEATURES_SCHEMA)


RESIZE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("width", IntegerType(), False),
    StructField("height", IntegerType(), False),
    StructField("payload", BinaryType(), False),
])


def resize_images(media: DataFrame, width: int, height: int,
                  strict: bool = False) -> DataFrame:
    """Resize stage (STUB transform: re-hash payload to target dims)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                if strict:
                    raise NotImplementedError("real resize needs an imaging lib")
                fake = hashlib.sha256(
                    payload + f"{width}x{height}".encode()).digest()
                rows.append((int(mid), width, height, fake))
            yield pd.DataFrame(rows,
                               columns=[f.name for f in RESIZE_SCHEMA.fields])

    return (media.filter(F.col("kind") == "image")
            .select("media_id", "payload")
            .mapInPandas(fn, schema=RESIZE_SCHEMA))


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("ts_ms", LongType(), False),
    StructField("frame", BinaryType(), False),
])


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  max_frames: int = 8, strict: bool = False) -> DataFrame:
    """Video frame sampling (STUB: deterministic frames; real seam marked).

    1 video row -> N frame rows: the fan-out happens inside mapInPandas,
    keeping frame payloads in the same Arrow batch as their source.
    """
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                if strict:
                    raise NotImplementedError("real demux needs an av lib")
                n = 1 + (payload[-1] if payload else 0) % max_frames
                for k in range(n):
                    frame = hashlib.sha256(payload + bytes([k])).digest()
                    rows.append((int(mid), k, k * every_ms, frame))
            yield pd.DataFrame(rows,
                               columns=[f.name for f in FRAME_SCHEMA.fields])

    return (media.filter(F.col("kind") == "video")
            .select("media_id", "payload")
            .mapInPandas(fn, schema=FRAME_SCHEMA))
