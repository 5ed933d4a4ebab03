"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark side — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested; the actual codec work is STUBBED
(this container ships no image/audio libraries): ``decode_image``
parses a deterministic fake header our own ``fake_image_bytes``
writes, and raises ``NotImplementedError`` for real formats. Swapping
in Pillow/libav happens inside one function body; the distributed
plumbing does not change.

Batch-shape rule: media blobs are large, so all decode/feature UDFs
run via ``mapInPandas`` with a capped Arrow batch size (set
``spark.sql.execution.arrow.maxRecordsPerBatch`` ≈ 64 for multi-MB
blobs) and rows should be bucketed by content hash so one partition
never holds all the hot items.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

_MAGIC = b"FAKEIMG1"


def fake_image_bytes(width: int, height: int, mean_byte: int) -> bytes:
    """Deterministic stand-in blob: 8-byte magic + packed header +
    (width*height % 4096) filler bytes."""
    body_len = (width * height) % 4096
    return _MAGIC + struct.pack("<IIB", width, height, mean_byte) + bytes(
        (mean_byte + i) % 256 for i in range(body_len)
    )


def decode_image_bytes(payload: bytes) -> dict:
    """Pure core: parse the fake header → metadata. Real formats raise
    NotImplementedError (clearly-marked stub — wire Pillow here)."""
    if payload is None or len(payload) < len(_MAGIC):
        return {"width": None, "height": None, "mean_byte": None, "ok": False}
    if not payload.startswith(_MAGIC):
        raise NotImplementedError(
            "real image codecs are not available in this environment; "
            "only the deterministic FAKEIMG1 container is decodable"
        )
    w, h, m = struct.unpack_from("<IIB", payload, len(_MAGIC))
    return {"width": w, "height": h, "mean_byte": m, "ok": True}


DECODED_SCHEMA = (
    "media_id long, width int, height int, mean_byte int, ok boolean, n_bytes long"
)


def decode_images(df: DataFrame) -> DataFrame:
    """mapInPandas decode: batches of (media_id, payload) → metadata.

    The pattern to copy for real decoders: per-batch loop over binary
    cells inside an Arrow batch, output a narrow typed frame, never
    carry the blob forward.
    """
    import pandas as pd

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = decode_image_bytes(bytes(payload) if payload is not None else None)
                rows.append(
                    {
                        "media_id": mid,
                        "width": d["width"],
                        "height": d["height"],
                        "mean_byte": d["mean_byte"],
                        "ok": d["ok"],
                        "n_bytes": len(payload) if payload is not None else 0,
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(_decode, schema=DECODED_SCHEMA)


def resize_stub(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize plumbing: metadata-only transform on the fake container
    (the real kernel would rewrite payload bytes inside the same
    mapInPandas shape)."""
    decoded = decode_images(df)
    return decoded.where("ok").select(
        "media_id",
        F.lit(target_w).alias("width"),
        F.lit(target_h).alias("height"),
        (F.col("mean_byte")).alias("mean_byte"),
    )


def frame_sample_stub(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode a deterministic frame
    index list per media row (real impl would emit decoded frames)."""
    decoded = decode_images(df)
    n_frames = (F.col("n_bytes") % 120 + 1).cast("int")
    return decoded.where("ok").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
