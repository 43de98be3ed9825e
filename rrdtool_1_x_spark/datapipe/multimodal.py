"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side design is real and tested — schema, partition-friendly batch
iteration, Arrow-batched UDF signatures — while the codec layer is stubbed:
this container has no image/audio libraries, so decode produces a
deterministic fake (documented below) or raises NotImplementedError when
``strict=True``. Swapping in a real codec (Pillow/ffmpeg/torchaudio) only
replaces ``_decode_stub``.

Schema convention:
    media(doc_id long, kind string, content binary,
          meta struct<mime string, width int, height int,
                      sample_rate int, duration_ms int>)

``mapInPandas`` is used (not a scalar UDF) so each Arrow batch can be
decoded with amortized per-batch setup (codec init, model load), the
pattern that matters at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("content", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_FIELDS = "doc_id long, kind string, feat array<float>, feat_dim int"


def _decode_stub(content: bytes, kind: str, strict: bool) -> np.ndarray:
    """Deterministic fake decode: bytes → pseudo-pixels/samples.

    Real implementation would be Pillow (image) / ffmpeg (video frames) /
    soundfile (audio). The fake hashes the payload into a fixed-length
    float vector so tests exercise realistic shapes end-to-end."""
    if strict:
        raise NotImplementedError(
            f"no codec available for kind={kind!r}; install a decoder or use strict=False"
        )
    if content is None:
        content = b""
    arr = np.frombuffer(content[:256].ljust(256, b"\0"), dtype=np.uint8)
    # float64 domain until the final float32 cast: the pooling then has one
    # well-defined rounding point, reproducible in any engine (the DuckDB
    # oracle mirrors byte/255.0 sums exactly)
    return arr.astype(np.float64) / 255.0


def extract_features(
    media: DataFrame,
    feat_dim: int = 64,
    strict: bool = False,
) -> DataFrame:
    """media table → (doc_id, kind, feat array<float>, feat_dim).

    Batched decode + pooled features; resize/frame-sample would happen in
    the same per-batch loop."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content, kind in zip(pdf["content"], pdf["kind"]):
                raw = _decode_stub(content, kind, strict)
                # mean-pool into feat_dim buckets (stands in for a real
                # embedding/resize step); float32 rounding happens once
                pad = (-len(raw)) % feat_dim
                pooled = np.pad(raw, (0, pad)).reshape(feat_dim, -1).mean(axis=1)
                feats.append(pooled.astype(np.float32))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "feat": [f.tolist() for f in feats],
                    "feat_dim": feat_dim,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_FIELDS)


def synthesize_media(spark, docs: DataFrame, kind: str = "image") -> DataFrame:
    """Build a media table from the documents fixture (payload = utf-8 text
    bytes), for exercising the plumbing without real codecs."""
    return docs.select(
        F.col("doc_id").cast("long"),
        F.lit(kind).alias("kind"),
        F.col("text").cast("binary").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(16).alias("width"),
            F.lit(16).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
