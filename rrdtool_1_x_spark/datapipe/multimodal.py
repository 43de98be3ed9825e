"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side design — schema, partition-friendly batch iteration,
Arrow-batched UDF signatures — is real and tested, and so is the codec
layer: PNG (zlib inflate + unfilter), WAV (RIFF PCM/float), PGM/PPM, BMP,
baseline JPEG (``datapipe.jpeg``: Huffman + DCT from the T.81 spec), and
GIF incl. animation (``datapipe.gif``: the LZW variant) all decode to real
pixels/samples with zero third-party code. Payloads whose format the
stdlib genuinely cannot decode (MP3, video containers like MP4/WebM) fall
back to a deterministic fake (documented below) or raise
NotImplementedError when ``strict=True``. Swapping in a full codec stack
(Pillow/ffmpeg) only widens the ``codecs.sniff`` dispatch. Animated GIF
stands in as the real multi-frame container for video frame-sampling
(``sample_video_frames``).

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
            f"no stdlib codec for this payload (kind={kind!r}); supported "
            "in-container: PNG, WAV, PGM/PPM, BMP, JPEG (baseline), GIF, FLAC"
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


PROBE_FIELDS = (
    "doc_id long, kind string, mime string, width int, height int, "
    "sample_rate int, n_samples int, duration_ms int"
)


def probe_media(media: DataFrame) -> DataFrame:
    """Parse each payload's REAL header into typed metadata — the
    metadata-extraction pass a training pipeline runs before deciding what
    to decode. PNG: IHDR dims; WAV: fmt/data chunks (rate, frames,
    duration); PNM: header dims. Unrecognized payloads yield NULL fields.

    Header-only: no pixel/sample decode happens, so this is cheap even for
    payloads whose full decode is expensive."""
    import struct

    from . import codecs

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, kind, content in zip(
                pdf["doc_id"], pdf["kind"], pdf["content"]
            ):
                mime = width = height = rate = nsamp = dur = None
                data = bytes(content) if content is not None else b""
                sniffed = codecs.sniff(data)
                try:
                    if sniffed == "png":
                        mime = "image/png"
                        for ctype, body in codecs._png_chunks(data):
                            if ctype == b"IHDR":
                                width, height = struct.unpack(">II", body[:8])
                                break
                    elif sniffed == "wav":
                        mime = "audio/wav"
                        samples, rate = codecs.decode_wav(data)
                        nsamp = samples.shape[0]
                        dur = int(nsamp * 1000 // rate)
                    elif sniffed == "pnm":
                        mime = (
                            "image/x-portable-pixmap"
                            if data[:2] in (b"P3", b"P6")
                            else "image/x-portable-graymap"
                        )
                        (width, height, _mx), _ = codecs._pnm_tokens(data, 3)
                    elif sniffed == "jpeg":
                        from . import jpeg as jpeg_codec

                        mime = "image/jpeg"
                        for marker, body, _ss in jpeg_codec._segments(data):
                            if marker in (0xC0, 0xC1, 0xC2):  # SOFn carries dims
                                height, width = struct.unpack(">HH", body[1:5])
                                break
                    elif sniffed == "gif":
                        from . import gif as gif_codec

                        mime = "image/gif"
                        width, height, nsamp, delay_cs = gif_codec.probe_gif(data)
                        dur = delay_cs * 10  # centiseconds → ms
                    elif sniffed == "bmp":
                        mime = "image/bmp"
                        width, h_signed = struct.unpack("<ii", data[18:26])
                        height = abs(h_signed)
                    elif sniffed == "aiff":
                        mime = "audio/aiff"
                        samples, rate = codecs.decode_aiff(data)
                        nsamp = samples.shape[0]
                        dur = int(nsamp * 1000 // rate) if rate else None
                    elif sniffed == "tiff":
                        mime = "image/tiff"
                        img = codecs.decode_tiff(data)
                        height, width = img.shape[:2]
                    elif sniffed is None and codecs.is_mp3(data):
                        # metadata-only surface: the frame headers are
                        # documented 4-byte records; DECODE stays refused
                        # (no stdlib path to the ISO huffman tables)
                        mime = "audio/mpeg"
                        rate, nsamp, dur = codecs.probe_mp3(data)
                    elif sniffed is None and codecs.is_mp4(data):
                        # ISO-BMFF box walk: mvhd duration, tkhd dims —
                        # metadata-only, like MP3
                        mime = "video/mp4"
                        dur, _ts, width, height = codecs.probe_mp4(data)
                        width = width or None
                        height = height or None
                    elif sniffed is None and codecs.is_webp(data):
                        mime = "image/webp"
                        width, height, _variant = codecs.probe_webp(data)
                    elif sniffed is None and codecs.is_ogg(data):
                        codec, rate, _ch, dur = codecs.probe_ogg(data)
                        mime = f"audio/ogg; codecs={codec}"
                    elif sniffed == "flac":
                        mime = "audio/flac"
                        # STREAMINFO is the first metadata block: header
                        # at byte 4, body at byte 8; rate/channels/bits/
                        # total packed from body offset 10
                        packed = int.from_bytes(data[18:26], "big")
                        rate = packed >> 44
                        nsamp = packed & ((1 << 36) - 1)
                        if rate:
                            dur = int(nsamp * 1000 // rate)
                except Exception:
                    mime = None  # corrupt header: all fields NULL
                rows.append((doc_id, kind, mime, width, height, rate, nsamp, dur))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "kind", "mime", "width", "height",
                    "sample_rate", "n_samples", "duration_ms",
                ],
            )

    return media.mapInPandas(run, schema=PROBE_FIELDS)


def resize_images(media: DataFrame, height: int, width: int) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode PNG, batched in Arrow.
    The pipeline step that normalizes image dims before feature extraction;
    non-image / undecodable payloads pass through unchanged."""
    from . import codecs

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import gif as gif_codec
        from . import jpeg as jpeg_codec

        for pdf in batches:
            out = []
            for content in pdf["content"]:
                data = bytes(content) if content is not None else b""
                kind = codecs.sniff(data)
                try:
                    if kind == "png":
                        img = codecs.decode_png(data)
                    elif kind == "pnm":
                        img = codecs.decode_pnm(data)
                    elif kind == "jpeg":
                        img = jpeg_codec.decode_jpeg(data)
                    elif kind == "gif":
                        img = gif_codec.decode_gif(data)
                    elif kind == "bmp":
                        img = codecs.decode_bmp(data)
                    else:
                        out.append(content)
                        continue
                    h0, w0 = img.shape[:2]
                    yi = (np.arange(height) * h0 // height).clip(0, h0 - 1)
                    xi = (np.arange(width) * w0 // width).clip(0, w0 - 1)
                    out.append(codecs.encode_png(img[yi][:, xi]))
                except Exception:
                    out.append(content)
            res = pdf.copy()
            res["content"] = out
            yield res

    return media.mapInPandas(run, schema=media.schema)


AHASH_FIELDS = "doc_id long, kind string, ahash long, n_dark int"


def image_ahash(media: DataFrame, strict: bool = False) -> DataFrame:
    """Perceptual average-hash over REAL decoded pixels — the image
    near-dup primitive: decode → grayscale → nearest-neighbor 8x8 →
    bit i set iff pixel i > the 8x8 mean. Emits the 64-bit hash (as a
    signed long) plus the dark-pixel count. Hamming-close hashes mark
    near-duplicate images; pairing composes with the generic banding
    machinery (datapipe.dedup.signature_near_duplicates operates on any
    64-bit signature column).

    Exactness: the 8x8 mean is sum/64 — a power-of-two divisor, so the
    threshold compare is exact in doubles and any engine reproduces the
    hash bit-for-bit (the DuckDB oracle recomputes it from the fixture
    bytes). Non-image/undecodable payloads yield NULL hash."""
    from . import codecs
    from . import gif as gif_codec
    from . import jpeg as jpeg_codec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, kind, content in zip(
                pdf["doc_id"], pdf["kind"], pdf["content"]
            ):
                data = bytes(content) if content is not None else b""
                sniffed = codecs.sniff(data)
                img = None
                try:
                    if sniffed == "png":
                        img = codecs.decode_png(data)
                    elif sniffed == "pnm":
                        img = codecs.decode_pnm(data)
                    elif sniffed == "bmp":
                        img = codecs.decode_bmp(data)
                    elif sniffed == "jpeg":
                        img = jpeg_codec.decode_jpeg(data)
                    elif sniffed == "gif":
                        img = gif_codec.decode_gif(data)
                    elif sniffed == "tiff":
                        img = codecs.decode_tiff(data)
                    elif strict:
                        raise NotImplementedError(
                            f"no image codec for payload (kind={kind!r})"
                        )
                except NotImplementedError:
                    raise
                except Exception:
                    if strict:
                        raise
                    img = None
                if img is None:
                    rows.append((doc_id, kind, None, None))
                    continue
                gray = img.astype(np.float64).mean(axis=2)
                h0, w0 = gray.shape
                yi = (np.arange(8) * h0 // 8).clip(0, h0 - 1)
                xi = (np.arange(8) * w0 // 8).clip(0, w0 - 1)
                small = gray[yi][:, xi]
                mean = small.sum() / 64.0
                bits = (small.ravel() > mean)
                hash_u = int(np.packbits(bits.astype(np.uint8)).view(">u8")[0])
                hash_s = hash_u - (1 << 64) if hash_u >= 1 << 63 else hash_u
                rows.append((doc_id, kind, hash_s, int((~bits).sum())))
            yield pd.DataFrame(
                rows, columns=["doc_id", "kind", "ahash", "n_dark"]
            )

    return media.mapInPandas(run, schema=AHASH_FIELDS)


def image_phash(media: DataFrame, strict: bool = False) -> DataFrame:
    """DCT perceptual hash (pHash): decode → grayscale → 32x32 nearest
    neighbor → 2-D DCT (the JPEG codec's orthonormal basis, batched
    matmul) → bit i set iff low-frequency coefficient i exceeds the
    median of the 8x8 top-left block (DC excluded). Robust where the
    average-hash is not: survives lossy JPEG re-encode and brightness
    shifts because it keys on coefficient RANKS, not absolute levels.

    Float medians make this deliberately library-surface only (no hash
    oracle gate — a cross-engine DCT would chase ulps); robustness is
    pinned by invariance tests instead. Schema matches image_ahash."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C32 = None
        for pdf in batches:
            rows = []
            for doc_id, kind, content in zip(
                pdf["doc_id"], pdf["kind"], pdf["content"]
            ):
                data = bytes(content) if content is not None else b""
                img = _decode_image(data)
                if img is None:
                    if strict:
                        raise NotImplementedError(
                            f"no image codec for payload (kind={kind!r})"
                        )
                    rows.append((doc_id, kind, None, None))
                    continue
                gray = img.astype(np.float64).mean(axis=2)
                h0, w0 = gray.shape
                yi = (np.arange(32) * h0 // 32).clip(0, h0 - 1)
                xi = (np.arange(32) * w0 // 32).clip(0, w0 - 1)
                small = gray[yi][:, xi]
                if C32 is None:
                    x = np.arange(32)
                    u = x[:, None]
                    C32 = np.sqrt(2.0 / 32) * np.cos((2 * x + 1) * u * np.pi / 64)
                    C32[0] *= 1.0 / np.sqrt(2.0)
                coef = C32 @ small @ C32.T
                low = coef[:8, :8].ravel()[1:]  # drop DC
                med = np.median(low)
                bits = np.concatenate([[False], low > med])  # 64 bits, DC=0
                hash_u = int(np.packbits(bits.astype(np.uint8)).view(">u8")[0])
                hash_s = hash_u - (1 << 64) if hash_u >= 1 << 63 else hash_u
                rows.append((doc_id, kind, hash_s, int((~bits).sum())))
            yield pd.DataFrame(
                rows, columns=["doc_id", "kind", "ahash", "n_dark"]
            ).rename(columns={"ahash": "phash", "n_dark": "n_low"})

    schema = "doc_id long, kind string, phash long, n_low int"
    return media.mapInPandas(run, schema=schema)


def _decode_image(data: bytes):
    """Shared image-decode dispatch for the perceptual hashes."""
    from . import codecs
    from . import gif as gif_codec
    from . import jpeg as jpeg_codec

    sniffed = codecs.sniff(data)
    try:
        if sniffed == "png":
            return codecs.decode_png(data)
        if sniffed == "pnm":
            return codecs.decode_pnm(data)
        if sniffed == "bmp":
            return codecs.decode_bmp(data)
        if sniffed == "jpeg":
            return jpeg_codec.decode_jpeg(data)
        if sniffed == "gif":
            return gif_codec.decode_gif(data)
        if sniffed == "tiff":
            return codecs.decode_tiff(data)
    except Exception:
        return None
    return None


def audio_fingerprint(
    media: DataFrame, n_frames: int = 16, n_bands: int = 4
) -> DataFrame:
    """Chromaprint-style spectral fingerprint: decode audio → mono →
    split into ``n_frames`` equal frames → per-frame FFT band energies →
    bit = energy delta positive across consecutive (frame, band) cells.
    (n_frames-1) x n_bands bits packed MSB-first into a signed 64-bit
    signature. Robust to volume scaling (energy RATIOS drive the bits)
    and to lossy re-encode; hamming-close fingerprints mark duplicate
    recordings. Library surface with invariance tests (float FFT keeps
    it out of the hash-oracle gates, like image_phash)."""
    from . import codecs
    from . import flac as flac_codec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, kind, content in zip(
                pdf["doc_id"], pdf["kind"], pdf["content"]
            ):
                data = bytes(content) if content is not None else b""
                sniffed = codecs.sniff(data)
                samples = None
                try:
                    if sniffed == "wav":
                        samples, _r = codecs.decode_wav(data)
                    elif sniffed == "flac":
                        samples, _r = flac_codec.decode_flac(data)
                    elif sniffed == "aiff":
                        samples, _r = codecs.decode_aiff(data)
                except Exception:
                    samples = None
                if samples is None or samples.shape[0] < n_frames * 2:
                    rows.append((doc_id, kind, None))
                    continue
                mono = samples.mean(axis=1)
                frame_len = len(mono) // n_frames
                frames = mono[: frame_len * n_frames].reshape(n_frames, frame_len)
                spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
                nb = spec.shape[1] - 1  # drop DC bin
                band_w = max(1, nb // n_bands)
                bands = np.stack(
                    [
                        spec[:, 1 + b * band_w : 1 + (b + 1) * band_w].sum(axis=1)
                        for b in range(n_bands)
                    ],
                    axis=1,
                )  # (n_frames, n_bands)
                delta = np.diff(bands, axis=0) > 0  # (n_frames-1, n_bands)
                bits = np.zeros(64, dtype=bool)
                flat = delta.ravel()[:64]
                bits[: len(flat)] = flat
                hash_u = int(np.packbits(bits.astype(np.uint8)).view(">u8")[0])
                hash_s = hash_u - (1 << 64) if hash_u >= 1 << 63 else hash_u
                rows.append((doc_id, kind, hash_s))
            yield pd.DataFrame(rows, columns=["doc_id", "kind", "afp"])

    return media.mapInPandas(run, schema="doc_id long, kind string, afp long")


def sample_video_frames(media: DataFrame, every_n: int) -> DataFrame:
    """Keep every Nth frame of multi-frame payloads — the video
    frame-sampling step of a training pipeline. Animated GIF is the real
    in-container container format (index-level lossless re-encode via
    datapipe.gif.resample_gif); other payloads pass through unchanged."""
    from . import codecs
    from . import gif as gif_codec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for content in pdf["content"]:
                data = bytes(content) if content is not None else b""
                if codecs.sniff(data) != "gif":
                    out.append(content)
                    continue
                try:
                    out.append(gif_codec.resample_gif(data, every_n))
                except Exception:
                    out.append(content)
            res = pdf.copy()
            res["content"] = out
            yield res

    return media.mapInPandas(run, schema=media.schema)


FRAME_FEATURE_FIELDS = (
    "doc_id long, kind string, frame_idx int, delay_cs int, "
    "feat array<float>, feat_dim int"
)


def extract_frame_features(
    media: DataFrame, feat_dim: int = 64, strict: bool = False
) -> DataFrame:
    """Per-FRAME pooled features — the video analogue of extract_features.

    Multi-frame payloads (animated GIF) emit one row per composited frame
    with its delay in centiseconds; single-frame/audio payloads emit one
    row with frame_idx 0 and NULL delay. Pooling matches extract_features
    (float64 mean into feat_dim buckets, one float32 rounding)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs
        from . import gif as gif_codec

        for pdf in batches:
            rows = []
            for doc_id, kind, content in zip(
                pdf["doc_id"], pdf["kind"], pdf["content"]
            ):
                data = bytes(content) if content is not None else b""
                if codecs.sniff(data) == "gif":
                    frames, delays = gif_codec.decode_gif_frames(data)
                    signals = [
                        (i, int(d), f.astype(np.float64).ravel() / 255.0)
                        for i, (f, d) in enumerate(zip(frames, delays))
                    ]
                else:
                    signals = [(0, None, _decode(data, kind, strict))]
                for idx, delay, raw in signals:
                    pad = (-len(raw)) % feat_dim
                    pooled = np.pad(raw, (0, pad)).reshape(feat_dim, -1).mean(axis=1)
                    rows.append(
                        (doc_id, kind, idx, delay, pooled.astype(np.float32).tolist())
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "kind", "frame_idx", "delay_cs", "feat"]
            ).assign(feat_dim=feat_dim)

    return media.mapInPandas(run, schema=FRAME_FEATURE_FIELDS)


def sample_audio_frames(media: DataFrame, every_n: int) -> DataFrame:
    """Keep every Nth audio frame (decode → stride → re-encode 16-bit PCM)
    — the audio analogue of video frame-sampling; non-audio payloads pass
    through."""
    from . import codecs

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import flac as flac_codec

        for pdf in batches:
            out = []
            for content in pdf["content"]:
                data = bytes(content) if content is not None else b""
                kind = codecs.sniff(data)
                try:
                    if kind == "wav":
                        samples, rate = codecs.decode_wav(data)
                        out.append(
                            codecs.encode_wav(
                                samples[::every_n], max(1, rate // every_n), bits=16
                            )
                        )
                    elif kind == "flac":
                        samples, rate = flac_codec.decode_flac(data)
                        ints = np.clip(
                            np.round(samples[::every_n] * 32768.0), -32768, 32767
                        ).astype(np.int64)
                        out.append(
                            flac_codec.encode_flac(
                                ints, max(1, rate // every_n), bits=16
                            )
                        )
                    else:
                        out.append(content)
                except Exception:
                    out.append(content)
            res = pdf.copy()
            res["content"] = out
            yield res

    return media.mapInPandas(run, schema=media.schema)


def synthesize_media_real(
    spark, docs: DataFrame, kind: str = "image", var_dims: bool = False
) -> DataFrame:
    """Build a media table whose payloads are REAL encoded files (PNG for
    ``image``, 8-bit PCM WAV for ``audio``, binary PGM for ``pnm``, 24-bit
    BMP for ``bmp``, single-frame gray GIF for ``gif``, block-flat
    quality-100 baseline JPEG for ``jpeg`` (gray) / ``jpeg_rgb`` (4:2:0
    color), 4-frame animated GIF for ``video``, Rice/LPC-coded FLAC for
    ``flac`` with sample i = (byte_i-128)*256 at 16 bit), with the signal
    = the document's first 256 utf-8 bytes zero-padded.

    Because the signal bytes are known, a SQL oracle can recompute the
    decoded values from ``documents.text`` directly — a bit-exact
    end-to-end test of encode → Spark binary column → stdlib decode. The
    JPEG kinds exploit the quality-100 exactness property (all-ones quant
    tables + per-8x8-flat blocks reconstruct bit-exactly, including
    through 4:2:0 chroma when R=G=B): byte i paints the whole 8x8 block at
    grid position i of an 8x8 block grid (64x64 px from the first 64
    bytes). ``video`` packs bytes 64f..64f+63 as frame f (8x8 gray) with
    delay 2+(doc_id+f)%5 centisec.

    ``var_dims`` derives per-doc dimensions from doc_id (image width
    8 + id%9, audio rate 4000 + 100*(id%20)) so a header-probe oracle has
    a nontrivial mapping to verify through the actual encoded bytes."""
    from . import codecs
    from . import flac as flac_codec
    from . import gif as gif_codec
    from . import jpeg as jpeg_codec

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = (text or "").encode("utf-8")[:256].ljust(256, b"\0")
                if kind == "image":
                    w = 8 + int(doc_id) % 9 if var_dims else 16
                    h = -(-256 // w)
                    raw = raw.ljust(w * h, b"\0")
                    img = np.frombuffer(raw, dtype=np.uint8).reshape(h, w)
                    payloads.append(codecs.encode_png(img))
                    metas.append(("image/png", w, h, None, None))
                elif kind == "audio":
                    rate = 4000 + 100 * (int(doc_id) % 20) if var_dims else 8000
                    payloads.append(codecs.encode_wav_pcm8_bytes(raw, rate))
                    metas.append(("audio/wav", None, None, rate, 256000 // rate))
                elif kind == "pnm":
                    img = np.frombuffer(raw, dtype=np.uint8).reshape(16, 16)
                    payloads.append(codecs.encode_pnm(img))
                    metas.append(("image/x-portable-graymap", 16, 16, None, None))
                elif kind == "bmp":
                    img = np.frombuffer(raw, dtype=np.uint8).reshape(16, 16)
                    payloads.append(codecs.encode_bmp(img))
                    metas.append(("image/bmp", 16, 16, None, None))
                elif kind == "gif":
                    img = np.frombuffer(raw, dtype=np.uint8).reshape(16, 16)
                    payloads.append(gif_codec.encode_gif(img))
                    metas.append(("image/gif", 16, 16, None, None))
                elif kind in ("jpeg", "jpeg_rgb"):
                    vals = np.frombuffer(raw[:64], dtype=np.uint8).reshape(8, 8)
                    img = np.repeat(np.repeat(vals, 8, 0), 8, 1)  # 64x64, block-flat
                    if kind == "jpeg_rgb":
                        img = np.stack([img] * 3, axis=2)
                        payloads.append(
                            jpeg_codec.encode_jpeg(img, quality=100, subsample="420")
                        )
                    else:
                        payloads.append(jpeg_codec.encode_jpeg(img, quality=100))
                    metas.append(("image/jpeg", 64, 64, None, None))
                elif kind == "g711":
                    rate = 4000 + 100 * (int(doc_id) % 20) if var_dims else 8000
                    payloads.append(codecs.encode_wav_g711_bytes(raw, rate))
                    metas.append(("audio/wav", None, None, rate, 256000 // rate))
                elif kind == "flac":
                    # sample i = (byte_i - 128) * 256 at 16 bit, so the
                    # decoded value is (byte_i - 128)/128 exactly like the
                    # 8-bit WAV fixture — but through Rice/LPC coding
                    rate = 4000 + 100 * (int(doc_id) % 20) if var_dims else 8000
                    ints = (
                        np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
                    ) * 256
                    payloads.append(
                        flac_codec.encode_flac(ints, rate, bits=16, block_size=64)
                    )
                    metas.append(("audio/flac", None, None, rate, 256000 // rate))
                elif kind == "video":
                    frames = [
                        np.frombuffer(raw[64 * f : 64 * f + 64], dtype=np.uint8)
                        .reshape(8, 8)
                        for f in range(4)
                    ]
                    delays = [2 + (int(doc_id) + f) % 5 for f in range(4)]
                    payloads.append(gif_codec.encode_gif(frames, delays=delays))
                    metas.append(("image/gif", 8, 8, None, sum(delays) * 10))
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
