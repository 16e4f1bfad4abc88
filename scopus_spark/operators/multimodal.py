"""Multimodal column handling (SURVEY §2.L).

Contract: image/audio/video payloads are opaque BinaryType columns with a
typed metadata struct; decode / feature-extraction / resize / frame-sample
run as Arrow-batched pandas functions over mapInPandas. The container has
no codec libraries, so the actual decode is STUBBED (NotImplementedError,
clearly marked); everything Spark-side — schema, batch iteration, UDF
signatures, partitioning — is real and tested (tests/test_operators.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, byte_len long, first_byte int, last_byte int, "
    "payload_sha string"
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """documents -> media table shape: utf-8 bytes stand in for real blobs."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(0).alias("width"),
            F.lit(0).alias("height"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """STUB: real deployments plug Pillow/ffmpeg here; this container ships
    no codec libraries (task brief: stub the decode step)."""
    raise NotImplementedError(
        "image/audio decode requires codec libraries not present in this "
        "container; plug a decoder into extract_features()'s per-batch loop"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The feature set here (lengths, boundary bytes, sha) is a deterministic
    stand-in for embedding/codec features — the mapInPandas plumbing
    (batch iteration, binary columns through Arrow, schema contract) is
    exactly what a real decoder uses.
    """
    import hashlib

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": payloads.map(len),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1),
                    "last_byte": payloads.map(lambda b: b[-1] if len(b) else -1),
                    "payload_sha": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                }
            )

    return media.mapInPandas(feats, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stand-in: one row per byte-offset sample — the same
    explode-shaped plumbing as video frame extraction (media_id, frame_no,
    frame payload slice)."""
    n_frames = F.greatest(
        (F.length("payload") / every_n_bytes).cast("int"), F.lit(1)
    )
    return media.select(
        "media_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1),
                lambda i: F.substring(
                    F.col("payload").cast("string"), i * every_n_bytes + 1, every_n_bytes
                ).cast("binary"),
            )
        ).alias("frame_no", "frame"),
    )


RESIZED_SCHEMA = "media_id long, payload binary, width int, height int"


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: Arrow-batched payload transform to the target
    dimensions. The resample kernel is a deterministic stand-in (cycle/
    truncate the bytes to width*height — a real deployment plugs
    Pillow's resize into the same per-batch loop; see decode_image for
    why it's stubbed). Batch shape, binary round-trip, and the
    (payload, dims) output contract are the real thing."""

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            def fake_resample(b) -> bytes:
                raw = bytes(b) if b is not None else b""
                if not raw:
                    return bytes(target)
                return (raw * (target // len(raw) + 1))[:target]

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"].map(fake_resample),
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(rs, RESIZED_SCHEMA)
