"""Multimodal column conventions + processing plumbing.

Convention: a multimodal asset is a row with
  - ``content``: BinaryType — the opaque payload (image/audio/video bytes)
  - ``media_type``: StringType — MIME-ish tag ('image/png', 'audio/wav')
  - ``meta``: StructType — typed metadata (width/height/duration/...)

The Spark-side plumbing (schema, partitioning, Arrow batch shape through
``mapInPandas``) is real and tested; the actual codec work is stubbed
behind ``decode_image``/``decode_audio`` because the codec libraries
(PIL/librosa/ffmpeg) are not in this container — swap the stub body, keep
the operator. A deterministic fake "feature extractor" (byte histogram)
exercises the full path end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical multimodal asset row.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("content", BinaryType(), True),
        StructField("media_type", StringType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("n_chars", LongType(), True),
                    StructField("lang", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

# Feature-extraction output schema for mapInPandas (must be declared up
# front — streaming-safe, no schema inference at runtime).
FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), True),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", IntegerType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def decode_image(content: bytes) -> object:
    """Stub: decode image bytes → pixel array. Requires PIL/opencv, not
    available in this container."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv; wire your codec here"
    )


def decode_audio(content: bytes) -> object:
    """Stub: decode audio bytes → waveform. Requires soundfile/librosa."""
    raise NotImplementedError(
        "audio decoding requires soundfile/librosa; wire your codec here"
    )


def byte_histogram(content: bytes, bins: int = 16) -> list[float]:
    """Deterministic fake feature extractor: normalized histogram of byte
    values — stands in for an image/audio embedding so the distributed
    plumbing is testable without codecs."""
    if content is None or len(content) == 0:
        return [0.0] * bins
    counts = [0] * bins
    for byt in content:
        counts[byt * bins // 256] += 1
    n = float(len(content))
    return [c / n for c in counts]


def extract_features(
    assets: DataFrame,
    *,
    id_col: str = "asset_id",
    content_col: str = "content",
    media_type_col: str = "media_type",
    bins: int = 16,
) -> DataFrame:
    """Arrow-batched feature extraction over binary content via
    ``mapInPandas`` — the pattern for any decode/resize/frame-sample step.

    Each partition streams through as pandas batches; per-batch Python
    cost is amortized over thousands of rows. At 100 TB, repartition by a
    size-balanced key first so no single task gets all the 4K videos.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col],
                    "media_type": pdf[media_type_col],
                    "n_bytes": pdf[content_col].map(
                        lambda b: 0 if b is None else len(b)
                    ),
                    "features": pdf[content_col].map(
                        lambda b: byte_histogram(b, bins)
                    ),
                }
            )

    cols = [id_col, content_col, media_type_col]
    return assets.select(*cols).mapInPandas(run, FEATURE_SCHEMA)


def text_as_binary_assets(docs: DataFrame) -> DataFrame:
    """Build a multimodal-shaped asset table from the documents fixture
    (text bytes as payload) — deterministic stand-in for real media."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("content"),
        F.lit("text/plain").alias("media_type"),
        F.struct(
            F.col("n_chars").alias("n_chars"), F.col("lang").alias("lang")
        ).alias("meta"),
    )
