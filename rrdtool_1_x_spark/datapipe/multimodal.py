"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side design — schema, partition-friendly batch iteration,
Arrow-batched UDF signatures — is real and tested, and so is the codec
layer for the stdlib-decodable formats: PNG (zlib inflate + unfilter), WAV
(RIFF PCM/float), and PGM/PPM are decoded to real pixels/samples by
``datapipe.codecs`` (no third-party library needed). Payloads whose format
the stdlib genuinely cannot decode (JPEG, MP3, video containers) fall back
to a deterministic fake (documented below) or raise NotImplementedError
when ``strict=True``. Swapping in a full codec stack (Pillow/ffmpeg)
only widens the ``codecs.sniff`` dispatch.

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


def _decode_fake(content: bytes) -> np.ndarray:
    """Deterministic fake decode for formats the stdlib cannot handle:
    bytes → pseudo-pixels. float64 domain until the final float32 cast so
    the pooling has one well-defined rounding point, reproducible in any
    engine (the DuckDB oracle mirrors byte/255.0 sums exactly)."""
    if content is None:
        content = b""
    arr = np.frombuffer(content[:256].ljust(256, b"\0"), dtype=np.uint8)
    return arr.astype(np.float64) / 255.0


def _decode(content: bytes, kind: str, strict: bool) -> np.ndarray:
    """Decode one payload to a flat float64 signal array.

    Recognized formats (PNG/WAV/PGM/PPM) decode for real via
    ``datapipe.codecs``; anything else uses the deterministic fake, or
    raises in ``strict`` mode."""
    from . import codecs

    if content is not None and codecs.sniff(bytes(content)) is not None:
        try:
            return codecs.decode_any(bytes(content))
        except NotImplementedError:
            raise
        except Exception:
            # magic-byte collision or truncated stream: a real pipeline
            # quarantines; here the fake keeps the row (strict mode refuses)
            if strict:
                raise
    elif strict:
        raise NotImplementedError(
            f"no stdlib codec for this payload (kind={kind!r}); "
            "supported in-container: PNG, WAV, PGM/PPM"
        )
    return _decode_fake(content)


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
                raw = _decode(content, kind, strict)
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


def synthesize_media_real(spark, docs: DataFrame, kind: str = "image") -> DataFrame:
    """Build a media table whose payloads are REAL encoded files (PNG for
    ``image``, 8-bit PCM WAV for ``audio``, binary PGM for ``pnm``), with
    the signal = the document's first 256 utf-8 bytes zero-padded.

    Because the signal bytes are known, a SQL oracle can recompute the
    decoded values from ``documents.text`` directly — a bit-exact
    end-to-end test of encode → Spark binary column → stdlib decode."""
    from . import codecs

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for text in pdf["text"]:
                raw = (text or "").encode("utf-8")[:256].ljust(256, b"\0")
                if kind == "image":
                    img = np.frombuffer(raw, dtype=np.uint8).reshape(16, 16)
                    payloads.append(codecs.encode_png(img))
                    metas.append(("image/png", 16, 16, None, None))
                elif kind == "audio":
                    payloads.append(codecs.encode_wav_pcm8_bytes(raw, 8000))
                    metas.append(("audio/wav", None, None, 8000, 32))
                elif kind == "pnm":
                    img = np.frombuffer(raw, dtype=np.uint8).reshape(16, 16)
                    payloads.append(codecs.encode_pnm(img))
                    metas.append(("image/x-portable-graymap", 16, 16, None, None))
                else:
                    raise ValueError(f"unknown media kind {kind!r}")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "kind": kind,
                    "content": payloads,
                    "meta": [
                        {
                            "mime": m[0],
                            "width": m[1],
                            "height": m[2],
                            "sample_rate": m[3],
                            "duration_ms": m[4],
                        }
                        for m in metas
                    ],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(enc, schema=MEDIA_SCHEMA)


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
