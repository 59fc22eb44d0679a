"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with Arrow-batched processing plumbing.

The decode/resize/feature kernels are STUBBED (the image/audio libraries are
not in this environment): ``decode_image`` raises ``NotImplementedError``
unless ``fake=True``, in which case a deterministic fake decoder produces
reproducible outputs so the Spark-side plumbing — schema, batching,
``mapInPandas`` signatures, partitioning — is fully real and testable.

Design for 100 TB of media:

- media rides as one ``binary`` column next to a metadata struct; Parquet
  stores it page-compressed and column pruning means metadata-only queries
  never read the bytes;
- per-record work happens in ``mapInPandas`` (Arrow batches, zero-copy into
  pandas) with batch size controlled by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` — never per-row Python;
- outputs are fixed-size feature vectors / resized blobs, so downstream
  joins/aggs stay columnar.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("format", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sha256", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def decode_image(content: bytes, fake: bool = False) -> "Any":
    """Decode an image blob to an HxWx3 uint8 array.

    ``fake=True`` returns a deterministic pseudo-image derived from the
    bytes' sha256 so downstream plumbing is testable without media
    libraries. The real path uses Pillow WHEN INSTALLED (optional
    dependency — it rides to executors inside the UDF closure's import,
    so nothing else changes); without it, a loud ``NotImplementedError``
    points at the supported paths.
    """
    if fake:
        digest = hashlib.sha256(content or b"").digest()
        rng = np.random.RandomState(np.frombuffer(digest[:4], dtype=np.uint32)[0])
        return rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    try:
        from PIL import Image  # optional dependency, absent in this env
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires Pillow (pip install Pillow); "
            "re-run with fake=True for the deterministic test decoder"
        ) from e
    import io

    with Image.open(io.BytesIO(content)) as img:
        return np.asarray(img.convert("RGB"), dtype=np.uint8)


def image_features(df: DataFrame, fake: bool = True, feature_dim: int = 16) -> DataFrame:
    """Extract per-image features via Arrow-batched mapInPandas.

    The feature kernel is the stub decoder + an 8x8 mean-pool flatten; with
    a real decoder only ``decode_image`` changes — the distributed plumbing
    (schema, batching, partition behavior) is identical.
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(content) if content is not None else b""
                img = decode_image(blob, fake=fake).astype(np.float32)
                pooled = img.mean(axis=2).flatten()[:feature_dim] / 255.0
                out.append(
                    {
                        "media_id": media_id,
                        "sha256": hashlib.sha256(blob).hexdigest(),
                        "n_bytes": len(blob),
                        "features": pooled.tolist(),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return df.select("media_id", "content").mapInPandas(compute, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Plan frame-sampling work for video rows WITHOUT decoding: expand each
    video into (media_id, frame_ts_ms) rows from metadata only — pure
    Catalyst (sequence + explode), no Python, no byte reads (column pruning
    keeps ``content`` out of the scan)."""
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only stats: touches ONLY ``kind`` and ``meta``, so column
    pruning keeps the ``content`` blobs out of the parquet scan entirely
    (check ReadSchema in .explain — pinned by tests)."""
    return df.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.avg(F.col("meta.width") * F.col("meta.height")).alias("avg_pixels"),
        F.avg("meta.duration_ms").alias("avg_duration_ms"),
    )


def media_byte_stats(df: DataFrame) -> DataFrame:
    """Byte-level stats: necessarily READS every blob (``length(content)``
    cannot come from metadata) — keep it a separate, deliberate full-scan
    pass rather than a rider on ``media_stats``."""
    return df.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum(F.length("content")).alias("total_bytes"),
        F.avg(F.length("content")).alias("avg_bytes"),
    )
