"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched
``mapInPandas`` (north-star operator, SURVEY §2 Tier C).

The decode kernels themselves are STUBBED (image/audio libraries are
not in this environment — see ``decode_image``): the Spark-side
contract — schema, batch iteration, partition-preserving shape,
deterministic fake features — is real and tested.  Swapping the stub
for PIL/librosa is a kernel change only; the plan shape (scan →
mapInPandas → downstream relational ops) is what scales.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "FEATURE_SCHEMA",
    "decode_image",
    "extract_media_features",
    "documents_as_media",
]

# Canonical media-table schema: payload is opaque binary; metadata is
# typed columns (not a stringly blob) so filters/pruning stay native.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("checksum", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def decode_image(payload: bytes) -> tuple[int, int]:
    """Decode an image payload to (width, height).

    STUB: real decoding needs an image library not present in this
    container.  Raises so callers must opt into the deterministic
    fake used by ``extract_media_features``.
    """
    raise NotImplementedError(
        "image decoding requires an imaging library (e.g. PIL); "
        "use fake_decode=True for the deterministic test kernel"
    )


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Resize an image payload.  STUB (no imaging library here); the
    Spark-side plumbing is ``resize_media``."""
    raise NotImplementedError("image resizing requires an imaging library")


def sample_frames(payload: bytes, every_n: int) -> list[bytes]:
    """Sample frames from a video payload.  STUB (no codec library);
    the Spark-side plumbing is ``sample_media_frames``."""
    raise NotImplementedError("frame sampling requires a video codec library")


def _fake_dims(payload: bytes) -> tuple[int, int]:
    # Deterministic fake: dimensions derived from payload bytes, so
    # tests validate the full Arrow round-trip without a codec.
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1


def extract_media_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """binary payload → typed features via Arrow-batched mapInPandas.

    Batch-at-a-time (not row-at-a-time UDF): each pandas batch is
    vectorized Python, amortizing the Python boundary exactly like
    the bi5 source's Arrow batches.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in it:
            payloads = pdf["payload"]
            dims = [
                _fake_dims(p) if fake_decode else decode_image(p)
                for p in payloads.fillna(b"")
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0),
                    "checksum": payloads.map(
                        lambda p: zlib.crc32(p) if p is not None else 0
                    ),
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter used by tests/queries: treat document text bytes as a
    binary payload so the media pipeline is exercised end-to-end on
    the driver-provided tables."""
    from pyspark.sql import functions as F

    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
    )


def resize_media(media: DataFrame, width: int, height: int, fake_decode: bool = True) -> DataFrame:
    """Image resize over Arrow batches (mapInPandas): payload → resized
    payload + new dims.  Fake kernel = deterministic truncation/padding
    of the byte payload to width*height bytes, so the batch plumbing,
    schema, and size accounting are real and testable without codecs."""

    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), True),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in it:
            if fake_decode:
                resized = [
                    (bytes(p or b"") + b"\0" * target)[:target]
                    for p in pdf["payload"]
                ]
            else:
                resized = [resize_image(p, width, height) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": resized,
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(batches, schema=out_schema)


def sample_media_frames(media: DataFrame, every_n: int = 10, fake_decode: bool = True) -> DataFrame:
    """Video frame sampling (1→N rows per input): each sampled frame
    becomes its own row — the exploding shape a real decoder needs.
    Fake kernel = fixed-size byte windows over the payload."""

    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_no", IntegerType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )
    FRAME = 64  # fake frame = 64-byte window

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nos, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(p or b"")
                if fake_decode:
                    all_frames = [
                        payload[i : i + FRAME]
                        for i in range(0, max(len(payload), 1), FRAME)
                    ]
                else:
                    all_frames = sample_frames(payload, every_n)
                for no, fr in enumerate(all_frames[::every_n]):
                    ids.append(mid)
                    nos.append(no)
                    frames.append(fr)
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return media.mapInPandas(batches, schema=out_schema)
