"""Multimodal column operators (north-star extension).

Images/audio/video are opaque `binary` columns plus typed metadata
structs. The Spark-side plumbing — schemas, Arrow-batched
`mapInPandas` iteration, partition-size control — is real and tested;
the codec calls themselves are stubbed behind ``_decode_image_bytes``
(the image/audio libraries are not in this container) with a
deterministic fake so the pipeline shape is verifiable end-to-end.

Scale notes: mapInPandas streams Arrow record batches, so a 100 TB
corpus of ~1 MB blobs never materializes more than
``spark.sql.execution.arrow.maxRecordsPerBatch`` blobs per worker at a
time; repartition upstream on size so a batch of blobs fits executor
memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("content", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", IntegerType(), True),
    ]
)

IMAGE_FEATURES_DDL = (
    "media_id string, n_bytes int, sha1 string, "
    "decoded_width int, decoded_height int, mean_luma double"
)


def _decode_image_bytes(blob: bytes) -> tuple[int, int, float]:
    """STUB — real impl would use PIL/libvips (not in this container).

    Deterministic fake derived from the bytes so tests can assert the
    plumbing end-to-end: width/height from the first bytes, "luma"
    from a byte-sum. Raises on empty blobs like a real decoder would.
    """
    if not blob:
        raise ValueError("empty media payload")
    w = 1 + blob[0] % 64
    h = 1 + blob[-1] % 64
    luma = (sum(blob[:256]) % 25600) / 100.0
    return w, h, luma


def extract_image_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary image content."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(blob) if blob is not None else b""
                try:
                    w, h, luma = _decode_image_bytes(blob)
                except ValueError:
                    w = h = None
                    luma = None
                rows.append(
                    {
                        "media_id": mid,
                        "n_bytes": len(blob),
                        "sha1": hashlib.sha1(blob).hexdigest(),
                        "decoded_width": w,
                        "decoded_height": h,
                        "mean_luma": luma,
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("media_id", "content").mapInPandas(run, IMAGE_FEATURES_DDL)


def with_byte_stats(df: DataFrame) -> DataFrame:
    """Metadata that needs no decode: pure JVM expressions."""
    return df.withColumns(
        {
            "n_bytes_actual": F.length(F.col("content")),
            "content_sha2": F.sha2(F.col("content"), 256),
            "is_empty": F.col("content").isNull() | (F.length(F.col("content")) == 0),
        }
    )


def sample_frames(df: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video rows: emits (media_id, frame_idx)
    pairs without decoding — the decode stub slots into the same
    mapInPandas shape as extract_image_features."""
    n_frames = (F.length(F.col("content")) / every_nth).cast("int")
    return df.filter(F.col("media_type") == "video").select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias(
            "frame_idx"
        ),
    )
