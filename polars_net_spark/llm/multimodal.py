"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, partitioning, Arrow-batched UDF signatures)
is real and tested; the actual media decode is STUBBED — the image/audio
libraries are not in this container.  Each stub either raises
NotImplementedError (decode_*) or produces a deterministic fake
(fake_image_features) so pipelines are testable end-to-end.

Pattern: media rows are wide (binary payload) → always process via
mapInPandas so batches stream through Python without materializing a
partition, and repartition by a size-balanced key before heavy UDFs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..frame import LazyFrame

__all__ = [
    "MEDIA_SCHEMA",
    "IMAGE_FEATURE_SCHEMA",
    "attach_media_metadata",
    "extract_image_features",
    "sample_video_frames",
]

# Canonical media column group: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("byte_histogram", T.ArrayType(T.LongType()), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_media_metadata(frame: "LazyFrame | SparkDF", payload_col: str = "payload") -> LazyFrame:
    """Cheap metadata derivable without decoding: byte length + magic-number
    sniffing for the mime type.  Pure Column expressions."""
    sdf = frame._sdf if isinstance(frame, LazyFrame) else frame
    payload = F.col(payload_col)
    head = F.hex(F.substring(payload, 1, 4))
    mime = (
        F.when(head.startswith("FFD8"), F.lit("image/jpeg"))
        .when(head.startswith("89504E47"), F.lit("image/png"))
        .when(head.startswith("47494638"), F.lit("image/gif"))
        .when(head.startswith("52494646"), F.lit("audio/wav"))
        .otherwise(F.lit("application/octet-stream"))
    )
    return LazyFrame(
        sdf.withColumn("n_bytes", F.octet_length(payload).cast("long")).withColumn(
            "sniffed_mime", mime
        )
    )


def _decode_image(payload: bytes):
    """STUB: real implementation needs PIL/opencv (not in this container)."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; container has neither. "
        "Wire a real decoder here; the surrounding Spark plumbing is complete."
    )


def extract_image_features(
    frame: "LazyFrame | SparkDF",
    payload_col: str = "payload",
    id_col: str = "media_id",
    feature_dim: int = 8,
    use_fake_decoder: bool = True,
) -> LazyFrame:
    """Feature extraction over binary payloads via mapInPandas (Arrow batches).

    With use_fake_decoder=True (default — container has no media libs) the
    'features' are a deterministic function of the bytes (normalized byte
    histogram folded to feature_dim), so the distributed plumbing — batch
    iteration, schema, partition balance — is fully exercised and testable.
    """
    sdf = frame._sdf if isinstance(frame, LazyFrame) else frame

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    out_rows.append((mid, 0, [0] * 16, [0.0] * feature_dim))
                    continue
                if not use_fake_decoder:
                    _decode_image(bytes(payload))  # raises NotImplementedError
                b = bytes(payload)
                hist = [0] * 16
                for byte in b:
                    hist[byte >> 4] += 1
                total = max(len(b), 1)
                feats = [
                    float(sum(hist[i::feature_dim])) / total for i in range(feature_dim)
                ]
                out_rows.append((mid, len(b), hist, feats))
            yield pd.DataFrame(
                out_rows, columns=["media_id", "n_bytes", "byte_histogram", "features"]
            )

    out = sdf.select(id_col, payload_col).mapInPandas(_batches, IMAGE_FEATURE_SCHEMA)
    return LazyFrame(out)


def sample_video_frames(
    frame: "LazyFrame | SparkDF",
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_ms: int = 1000,
):
    """STUB: frame sampling needs ffmpeg/opencv.  The real operator is
    mapInPandas producing one row per sampled frame with schema
    (media_id, frame_idx, ts_ms, frame_png binary)."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg; plumbing pattern is identical "
        "to extract_image_features (mapInPandas, one→many rows)"
    )
