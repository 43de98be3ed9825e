"""Pure-stdlib media codecs: PNG, WAV (PCM), PPM/PGM, BMP — plus the
baseline JPEG codec in ``datapipe.jpeg`` and the GIF (incl. animation)
codec in ``datapipe.gif``, both reachable through ``sniff``/``decode_any``.

No external image/audio libraries exist in the target container, so the
decodable subset is implemented from the published file-format specs with
only ``zlib``/``struct``/``numpy``:

* PNG (ISO/IEC 15948): zlib-inflate the IDAT stream, undo the five
  scanline filters (None/Sub/Up/Average/Paeth), de-serialize bit depth
  1/2/4/8/16, expand palette, merge Adam7 interlace passes.
* WAV (RIFF/WAVE): chunk walk for ``fmt ``/``data``; PCM 8/16/24/32-bit
  and IEEE float32/64, any channel count, WAVE_FORMAT_EXTENSIBLE
  subformat unwrapping.
* PPM/PGM (netpbm P5/P6 binary, P2/P3 ASCII).
* BMP (BITMAPINFOHEADER): BI_RGB 24/32-bit and 8-bit palette.
* JPEG (ITU-T T.81 baseline sequential): see ``datapipe.jpeg``.
* GIF (87a/89a incl. LZW, interlace, animation): see ``datapipe.gif``.
* FLAC (RFC 9639 native subset incl. LPC, Rice partitions, stereo
  decorrelation, CRC verification): see ``datapipe.flac``.
* AIFF/AIFC (big-endian PCM, 80-bit extended-float rate, 'sowt').
* TIFF (baseline: both byte orders, strips, PackBits, 8-bit gray/RGB[A],
  WhiteIsZero inversion).
* G.711 mu-law/A-law WAV (formats 7/6) and MP3 frame-header probing.

Encoders for the same subset exist so tests and oracle gates can build
bit-exact fixtures without any third-party writer.

Decoded output convention (shared with datapipe.multimodal): images decode
to ``(height, width, channels) uint8/uint16``; audio decodes to
``(frames, channels) float64`` normalized to [-1, 1).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> raw channels


def is_png(data: bytes) -> bool:
    return data is not None and data[:8] == PNG_MAGIC


def _png_chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        yield ctype, body
        pos += 12 + length  # length + type + crc
        if ctype == b"IEND":
            return


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> bytearray:
    """Undo PNG scanline filtering. ``stride`` is bytes per scanline
    (without the filter byte); ``bpp`` is the filter pixel unit in bytes."""
    out = bytearray(height * stride)
    pos = 0
    prev_off = -stride
    for y in range(height):
        ftype = raw[pos]
        line = raw[pos + 1 : pos + 1 + stride]
        pos += 1 + stride
        off = y * stride
        if ftype == 0:  # None
            out[off : off + stride] = line
        elif ftype == 1:  # Sub
            for i in range(stride):
                left = out[off + i - bpp] if i >= bpp else 0
                out[off + i] = (line[i] + left) & 0xFF
        elif ftype == 2:  # Up
            if y == 0:
                out[off : off + stride] = line
            else:
                up = np.frombuffer(bytes(out[off + prev_off : off]), dtype=np.uint8)
                cur = np.frombuffer(line, dtype=np.uint8)
                out[off : off + stride] = ((cur + up) & 0xFF).astype(np.uint8).tobytes()
        elif ftype == 3:  # Average
            for i in range(stride):
                left = out[off + i - bpp] if i >= bpp else 0
                up = out[off + prev_off + i] if y > 0 else 0
                out[off + i] = (line[i] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = out[off + i - bpp] if i >= bpp else 0
                up = out[off + prev_off + i] if y > 0 else 0
                ul = out[off + prev_off + i - bpp] if (y > 0 and i >= bpp) else 0
                out[off + i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype} on row {y}")
    return out


def _unpack_bits(line: np.ndarray, bit_depth: int, count: int) -> np.ndarray:
    """Expand sub-byte samples (bit depth 1/2/4) to one value per entry."""
    bits = np.unpackbits(line)
    vals = bits.reshape(-1, bit_depth)
    weights = 1 << np.arange(bit_depth - 1, -1, -1)
    return (vals * weights).sum(axis=1).astype(np.uint8)[:count]


_ADAM7 = (  # (x_start, y_start, x_step, y_step) for the 7 passes
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _decode_subimage(
    raw: bytes, width: int, height: int, bit_depth: int, channels: int
) -> np.ndarray:
    """Unfilter + de-serialize one (sub)image; returns (h, w, channels)."""
    bits_per_px = bit_depth * channels
    stride = (width * bits_per_px + 7) // 8
    bpp = max(1, bits_per_px // 8)
    flat = _unfilter(raw, height, stride, bpp)
    if bit_depth == 16:
        arr = np.frombuffer(bytes(flat), dtype=">u2").astype(np.uint16)
        return arr.reshape(height, width, channels)
    if bit_depth == 8:
        return np.frombuffer(bytes(flat), dtype=np.uint8).reshape(
            height, width, channels
        )
    rows = []
    for y in range(height):
        line = np.frombuffer(bytes(flat[y * stride : (y + 1) * stride]), dtype=np.uint8)
        rows.append(_unpack_bits(line, bit_depth, width))
    return np.stack(rows).reshape(height, width, 1)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, channels) uint8 (or uint16 for 16-bit).

    Palette images are expanded through PLTE (+tRNS alpha when present).
    Adam7-interlaced streams are de-interlaced (7 sub-images merged on
    their pass grids). Raises ValueError on malformed streams.
    """
    if not is_png(data):
        raise ValueError("not a PNG stream")
    width = height = None
    bit_depth = color_type = interlace = 0
    idat = bytearray()
    plte = None
    trns = None
    for ctype, body in _png_chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if comp != 0 or filt != 0:
                raise ValueError("PNG: unsupported compression/filter method")
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None:
        raise ValueError("PNG: missing IHDR")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"PNG: unknown color type {color_type}")
    channels = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    if interlace:  # Adam7: 7 independently-filtered sub-images
        dtype = np.uint16 if bit_depth == 16 else np.uint8
        img = np.zeros((height, width, channels), dtype=dtype)
        pos = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = (width - x0 + xs - 1) // xs
            ph = (height - y0 + ys - 1) // ys
            if pw <= 0 or ph <= 0:
                continue
            stride = (pw * bit_depth * channels + 7) // 8
            sub = _decode_subimage(
                raw[pos : pos + ph * (stride + 1)], pw, ph, bit_depth, channels
            )
            pos += ph * (stride + 1)
            img[y0::ys, x0::xs] = sub
    else:
        bits_per_px = bit_depth * channels
        stride = (width * bits_per_px + 7) // 8
        if len(raw) != height * (stride + 1):
            raise ValueError("PNG: IDAT size does not match dimensions")
        img = _decode_subimage(raw, width, height, bit_depth, channels)

    if color_type == 3:  # palette expand
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        idx = img.reshape(height, width)
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full((height, width, 1), 255, dtype=np.uint8)
            lut = np.full(256, 255, dtype=np.uint8)
            lut[: len(trns)] = trns
            alpha[..., 0] = lut[idx]
            return np.concatenate([rgb, alpha], axis=2)
        return rgb
    return img


def encode_png(img: np.ndarray) -> bytes:
    """(h, w) or (h, w, c) uint8/uint16 → PNG bytes (filter 0, no interlace)."""
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    if arr.dtype == np.uint16:
        bit_depth, payload = 16, arr.astype(">u2").tobytes()
        stride = w * c * 2
    else:
        bit_depth, payload = 8, arr.astype(np.uint8).tobytes()
        stride = w * c
    raw = b"".join(
        b"\x00" + payload[y * stride : (y + 1) * stride] for y in range(h)
    )

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE)
# ---------------------------------------------------------------------------


def is_wav(data: bytes) -> bool:
    return (
        data is not None
        and len(data) >= 12
        and data[:4] == b"RIFF"
        and data[8:12] == b"WAVE"
    )


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((frames, channels) float64 in [-1, 1), sample_rate).

    PCM 8-bit is unsigned (centered at 128); 16/24/32-bit are signed
    little-endian; format 3 is IEEE float. Chunk walk skips unknown chunks
    (LIST, fact, ...) per the RIFF spec.
    """
    if not is_wav(data):
        raise ValueError("not a WAV stream")
    pos = 12
    fmt = None
    fmt_body = b""
    frames_raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif cid == b"data":
            frames_raw = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or frames_raw is None:
        raise ValueError("WAV: missing fmt/data chunk")
    audio_fmt, channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if audio_fmt == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: subformat GUID leads
        if len(fmt_body) < 40:
            raise ValueError("WAV: truncated extensible fmt chunk")
        (audio_fmt,) = struct.unpack("<H", fmt_body[24:26])  # GUID data1 low
    if audio_fmt == 3:  # IEEE float
        dtype = "<f4" if bits == 32 else "<f8"
        samples = np.frombuffer(frames_raw, dtype=dtype).astype(np.float64)
    elif audio_fmt in (6, 7):  # G.711 A-law / mu-law (8-bit companded)
        codes = np.frombuffer(frames_raw, dtype=np.uint8)
        lin = _alaw_decode(codes) if audio_fmt == 6 else _mulaw_decode(codes)
        samples = lin.astype(np.float64) / 32768.0
    elif audio_fmt == 1:  # PCM
        if bits == 8:
            samples = (
                np.frombuffer(frames_raw, dtype=np.uint8).astype(np.float64) - 128.0
            ) / 128.0
        elif bits == 16:
            samples = np.frombuffer(frames_raw, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            b = np.frombuffer(frames_raw, dtype=np.uint8).reshape(-1, 3)
            vals = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            samples = vals.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            samples = np.frombuffer(frames_raw, dtype="<i4").astype(np.float64) / float(
                1 << 31
            )
        else:
            raise NotImplementedError(f"WAV: PCM bit depth {bits} not supported")
    else:
        raise NotImplementedError(f"WAV: audio format {audio_fmt} not supported")
    n = (len(samples) // channels) * channels
    return samples[:n].reshape(-1, channels), sample_rate


def _mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """ITU-T G.711 mu-law byte → 16-bit linear PCM (table-free form)."""
    u = (~codes.astype(np.int64)) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = ((mant << 3) + 0x84 << exp) - 0x84
    return np.where(sign != 0, -mag, mag)


def _alaw_decode(codes: np.ndarray) -> np.ndarray:
    """ITU-T G.711 A-law byte → 16-bit linear PCM (sign bit SET means
    positive, per the G.711 tables)."""
    a = codes.astype(np.int64) ^ 0x55
    sign = a & 0x80
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    mag = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << (exp - 1))
    return np.where(sign != 0, mag, -mag)


def _companding_encoder(decode_fn):
    """Exact inverse of a companding decoder: quantize each sample to the
    NEAREST decodable level (the optimal companding quantizer), realized
    as a sorted-level table + searchsorted — immune to exponent/segment
    formula slips by construction."""
    codes = np.arange(256, dtype=np.uint8)
    levels = decode_fn(codes)
    order = np.argsort(levels, kind="stable")
    sorted_levels = levels[order]
    sorted_codes = codes[order]
    mids = (sorted_levels[1:] + sorted_levels[:-1]) / 2.0

    def encode(lin: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(mids, lin.astype(np.float64))
        return sorted_codes[idx]

    return encode


def _mulaw_encode(lin: np.ndarray) -> np.ndarray:
    global _MULAW_ENC
    if _MULAW_ENC is None:
        _MULAW_ENC = _companding_encoder(_mulaw_decode)
    return _MULAW_ENC(lin)


def _alaw_encode(lin: np.ndarray) -> np.ndarray:
    global _ALAW_ENC
    if _ALAW_ENC is None:
        _ALAW_ENC = _companding_encoder(_alaw_decode)
    return _ALAW_ENC(lin)


_MULAW_ENC = None
_ALAW_ENC = None


def encode_wav_g711(
    samples: np.ndarray, sample_rate: int = 8000, law: str = "mulaw"
) -> bytes:
    """float [-1, 1] → 8-bit G.711 companded WAV (format 7 mu-law / 6
    A-law) — the telephony codec pair a speech corpus actually contains."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    channels = arr.shape[1]
    lin = np.clip(arr * 32768.0, -32768, 32767).astype(np.int64)
    if law == "mulaw":
        payload = _mulaw_encode(lin.ravel()).tobytes()
        fmt_code = 7
    elif law == "alaw":
        payload = _alaw_encode(lin.ravel()).tobytes()
        fmt_code = 6
    else:
        raise ValueError("law must be 'mulaw' or 'alaw'")
    fmt = struct.pack(
        "<HHIIHH", fmt_code, channels, sample_rate, sample_rate * channels,
        channels, 8,
    )
    data_chunk = b"data" + struct.pack("<I", len(payload)) + payload
    fmt_chunk = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body = b"WAVE" + fmt_chunk + data_chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_g711_bytes(raw: bytes, sample_rate: int = 8000) -> bytes:
    """Raw bytes used VERBATIM as mu-law codes in a format-7 WAV — the
    fixture/gate shape: decoded sample i is exactly
    mulaw_decode(raw[i]) / 32768, which a SQL oracle can recompute with
    integer bit math."""
    payload = bytes(raw)
    fmt = struct.pack("<HHIIHH", 7, 1, sample_rate, sample_rate, 1, 8)
    data_chunk = b"data" + struct.pack("<I", len(payload)) + payload
    fmt_chunk = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body = b"WAVE" + fmt_chunk + data_chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav(
    samples: np.ndarray, sample_rate: int = 8000, bits: int = 16
) -> bytes:
    """(frames,) or (frames, channels) float in [-1, 1] → PCM WAV bytes."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    channels = arr.shape[1]
    if bits == 8:
        payload = np.clip(arr * 128.0 + 128.0, 0, 255).astype(np.uint8).tobytes()
    elif bits == 16:
        payload = np.clip(arr * 32768.0, -32768, 32767).astype("<i2").tobytes()
    else:
        raise NotImplementedError(f"encode_wav: bits={bits}")
    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, bits
    )
    data_chunk = b"data" + struct.pack("<I", len(payload)) + payload
    fmt_chunk = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body = b"WAVE" + fmt_chunk + data_chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_pcm8_bytes(raw: bytes, sample_rate: int = 8000) -> bytes:
    """Raw bytes interpreted as 8-bit unsigned PCM mono — the fixture/gate
    shape: decoded sample i is exactly (raw[i] - 128) / 128."""
    payload = bytes(raw)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate, 1, 8)
    data_chunk = b"data" + struct.pack("<I", len(payload)) + payload
    fmt_chunk = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body = b"WAVE" + fmt_chunk + data_chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# PPM / PGM (netpbm)
# ---------------------------------------------------------------------------


def is_pnm(data: bytes) -> bool:
    # require the whitespace separator after the magic — "P3xxx" prose in a
    # text corpus must not sniff as an image
    return (
        data is not None
        and len(data) >= 3
        and data[0:1] == b"P"
        and data[1:2] in b"2356"
        and data[2] in b" \t\r\n"
    )


def _pnm_tokens(data: bytes, count: int) -> tuple[list[int], int]:
    """Read ``count`` whitespace-separated integer tokens after the magic,
    skipping ``#`` comments; returns (tokens, offset just past last token)."""
    toks: list[int] = []
    pos = 2
    n = len(data)
    while len(toks) < count and pos < n:
        ch = data[pos]
        if ch in b" \t\r\n":
            pos += 1
        elif ch == ord("#"):
            while pos < n and data[pos] not in b"\r\n":
                pos += 1
        else:
            start = pos
            while pos < n and data[pos] not in b" \t\r\n#":
                pos += 1
            toks.append(int(data[start:pos]))
    return toks, pos


def decode_pnm(data: bytes) -> np.ndarray:
    """PGM/PPM bytes → (h, w, channels) uint8/uint16 (1 channel for PGM)."""
    if not is_pnm(data):
        raise ValueError("not a PGM/PPM stream")
    magic = data[:2]
    channels = 3 if magic in (b"P3", b"P6") else 1
    (w, h, maxval), pos = _pnm_tokens(data, 3)
    if magic in (b"P5", b"P6"):
        pos += 1  # exactly one whitespace byte after maxval
        count = w * h * channels
        if maxval > 255:
            arr = np.frombuffer(data, dtype=">u2", count=count, offset=pos).astype(
                np.uint16
            )
        else:
            arr = np.frombuffer(data, dtype=np.uint8, count=count, offset=pos)
    else:  # ASCII
        vals = data[pos:].split()
        arr = np.array([int(v) for v in vals[: w * h * channels]], dtype=np.uint16)
        if maxval <= 255:
            arr = arr.astype(np.uint8)
    return arr.reshape(h, w, channels)


def encode_pnm(img: np.ndarray, maxval: int = 255) -> bytes:
    """(h, w) or (h, w, {1,3}) uint8 → binary PGM (P5) / PPM (P6) bytes."""
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    magic = b"P6" if c == 3 else b"P5"
    header = magic + b"\n%d %d\n%d\n" % (w, h, maxval)
    if maxval > 255:
        return header + arr.astype(">u2").tobytes()
    return header + arr.astype(np.uint8).tobytes()


# ---------------------------------------------------------------------------
# BMP (Windows BITMAPINFOHEADER, uncompressed)
# ---------------------------------------------------------------------------


def is_bmp(data: bytes) -> bool:
    return data is not None and len(data) >= 18 and bytes(data[:2]) == b"BM"


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → (h, w, channels) uint8. Supports BI_RGB 24/32-bit
    (BGR[A], bottom-up or top-down) and 8-bit palette images."""
    if not is_bmp(data):
        raise ValueError("not a BMP stream")
    data = bytes(data)
    (pix_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise NotImplementedError("BMP: BITMAPCOREHEADER not supported")
    w, h_signed = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0:
        raise NotImplementedError(f"BMP: compression {compression} not supported")
    top_down = h_signed < 0
    h = abs(h_signed)
    if bpp == 8:
        (ncolors,) = struct.unpack("<I", data[46:50])
        ncolors = ncolors or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            data[pal_off : pal_off + 4 * ncolors], dtype=np.uint8
        ).reshape(-1, 4)[:, :3][:, ::-1]  # BGRX → RGB
        stride = (w + 3) & ~3
        rows = np.frombuffer(
            data[pix_off : pix_off + stride * h], dtype=np.uint8
        ).reshape(h, stride)[:, :w]
        if not top_down:
            rows = rows[::-1]
        lut = np.zeros((256, 3), dtype=np.uint8)
        lut[: len(pal)] = pal
        return lut[rows]
    if bpp in (24, 32):
        nbytes = bpp // 8
        stride = (w * nbytes + 3) & ~3
        rows = np.frombuffer(
            data[pix_off : pix_off + stride * h], dtype=np.uint8
        ).reshape(h, stride)[:, : w * nbytes].reshape(h, w, nbytes)
        if not top_down:
            rows = rows[::-1]
        if nbytes == 3:
            return rows[:, :, ::-1].copy()  # BGR → RGB
        bgra = rows
        return np.concatenate([bgra[:, :, 2::-1], bgra[:, :, 3:4]], axis=2).copy()
    raise NotImplementedError(f"BMP: {bpp}-bit not supported")


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 → 24-bit BI_RGB BMP (bottom-up)."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=2)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("encode_bmp: 3 channels required")
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    payload = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(payload), 2835, 2835, 0, 0)
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(payload), 0, 0, 14 + 40)
    return header + info + payload


# ---------------------------------------------------------------------------
# AIFF (big-endian PCM inside IFF chunks)
# ---------------------------------------------------------------------------


def is_aiff(data: bytes) -> bool:
    return (
        data is not None
        and len(data) >= 12
        and bytes(data[:4]) == b"FORM"
        and bytes(data[8:12]) in (b"AIFF", b"AIFC")
    )


def _read_extended80(b: bytes) -> float:
    """80-bit IEEE 754 extended float (the COMM sample-rate field)."""
    (se,) = struct.unpack(">H", b[:2])
    mant = int.from_bytes(b[2:10], "big")
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def _write_extended80(v: float) -> bytes:
    if v == 0:
        return b"\x00" * 10
    sign = 0x8000 if v < 0 else 0
    v = abs(v)
    exp = 16383 + 63
    while v < (1 << 63):
        v *= 2.0
        exp -= 1
    while v >= (1 << 64):
        v /= 2.0
        exp += 1
    return struct.pack(">H", sign | exp) + int(v).to_bytes(8, "big")


def decode_aiff(data: bytes) -> tuple[np.ndarray, int]:
    """AIFF bytes → ((frames, channels) float64 in [-1, 1), sample_rate).
    PCM 8/16/24/32-bit big-endian; AIFC accepted only for the 'NONE'
    compression type."""
    if not is_aiff(data):
        raise ValueError("not an AIFF stream")
    data = bytes(data)
    pos = 12
    comm = None
    ssnd = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack(">I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"COMM":
            channels, nframes, bits = struct.unpack(">HIH", body[:8])
            rate = int(round(_read_extended80(body[8:18])))
            if len(body) >= 22 and body[18:22] not in (b"NONE", b"sowt"):
                raise NotImplementedError(
                    f"AIFC compression {body[18:22]!r} not supported"
                )
            little = len(body) >= 22 and body[18:22] == b"sowt"
            comm = (channels, nframes, bits, rate, little)
        elif cid == b"SSND":
            (off, _blk) = struct.unpack(">II", body[:8])
            ssnd = body[8 + off :]
        pos += 8 + clen + (clen & 1)
    if comm is None or ssnd is None:
        raise ValueError("AIFF: missing COMM/SSND chunk")
    channels, nframes, bits, rate, little = comm
    order = "<" if little else ">"
    if bits == 8:
        samples = np.frombuffer(ssnd, dtype=np.int8).astype(np.float64) / 128.0
    elif bits == 16:
        samples = np.frombuffer(ssnd, dtype=f"{order}i2").astype(np.float64) / 32768.0
    elif bits == 24:
        b3 = np.frombuffer(ssnd, dtype=np.uint8)
        b3 = b3[: len(b3) // 3 * 3].reshape(-1, 3)
        if little:
            b3 = b3[:, ::-1]
        vals = (
            (b3[:, 0].astype(np.int64) << 16)
            | (b3[:, 1].astype(np.int64) << 8)
            | b3[:, 2].astype(np.int64)
        )
        vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
        samples = vals.astype(np.float64) / float(1 << 23)
    elif bits == 32:
        samples = np.frombuffer(ssnd, dtype=f"{order}i4").astype(np.float64) / float(
            1 << 31
        )
    else:
        raise NotImplementedError(f"AIFF: {bits}-bit not supported")
    n = (len(samples) // channels) * channels
    return samples[:n].reshape(-1, channels), rate


def encode_aiff(
    samples: np.ndarray, sample_rate: int = 8000, bits: int = 16
) -> bytes:
    """(frames,) or (frames, channels) float in [-1, 1] → AIFF PCM."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    nframes, channels = arr.shape
    if bits == 8:
        payload = np.clip(arr * 128.0, -128, 127).astype(np.int8).tobytes()
    elif bits == 16:
        payload = np.clip(arr * 32768.0, -32768, 32767).astype(">i2").tobytes()
    else:
        raise NotImplementedError(f"encode_aiff: bits={bits}")
    comm = struct.pack(">HIH", channels, nframes, bits) + _write_extended80(
        float(sample_rate)
    )
    ssnd = struct.pack(">II", 0, 0) + payload
    chunks = b"COMM" + struct.pack(">I", len(comm)) + comm
    chunks += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    if len(ssnd) & 1:
        chunks += b"\x00"
    body = b"AIFF" + chunks
    return b"FORM" + struct.pack(">I", len(body)) + body


# ---------------------------------------------------------------------------
# TIFF (baseline: uncompressed + PackBits strips, 8-bit samples)
# ---------------------------------------------------------------------------


def is_tiff(data: bytes) -> bool:
    return (
        data is not None
        and len(data) >= 8
        and bytes(data[:4]) in (b"II*\x00", b"MM\x00*")
    )


def packbits_decode(data: bytes) -> bytearray:
    """Apple PackBits RLE (TIFF compression 32773)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        i += 1
        if c < 128:  # literal run of c+1 bytes
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:  # repeat next byte 257-c times
            if i < n:
                out += bytes([data[i]]) * (257 - c)
                i += 1
        # c == 128: noop
    return out


def packbits_encode(data: bytes) -> bytes:
    """PackBits encoder (repeat runs >= 3 bytes, literals otherwise)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and (i - lit_start) < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += 1
        out += bytes([i - lit_start - 1]) + data[lit_start:i]
    return bytes(out)


def decode_tiff(data: bytes) -> np.ndarray:
    """Baseline TIFF → (h, w, channels) uint8: both byte orders, strips,
    compression 1 (none) and 32773 (PackBits), 8-bit gray/RGB[A]."""
    if not is_tiff(data):
        raise ValueError("not a TIFF stream")
    data = bytes(data)
    bo = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(bo + "I", data[4:8])
    (n_entries,) = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])
    tags: dict[int, tuple[int, int, bytes]] = {}
    for i in range(n_entries):
        e = data[ifd_off + 2 + 12 * i : ifd_off + 14 + 12 * i]
        tag, typ, count = struct.unpack(bo + "HHI", e[:8])
        tags[tag] = (typ, count, e[8:12])

    def val(tag: int, default=None):
        if tag not in tags:
            return default
        typ, count, raw = tags[tag]
        size = {1: 1, 3: 2, 4: 4}.get(typ)
        if size is None:
            raise NotImplementedError(f"TIFF: field type {typ}")
        total = size * count
        buf = raw[:total] if total <= 4 else data[
            struct.unpack(bo + "I", raw)[0] :
        ][:total]
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        vals = struct.unpack(bo + fmt * count, buf)
        return list(vals)

    width_vals = val(256)
    height_vals = val(257)
    if not width_vals or not height_vals:
        raise ValueError("TIFF: missing required ImageWidth/ImageLength tag")
    width = width_vals[0]
    height = height_vals[0]
    spp = val(277, [1])[0]
    bits = val(258, [8] * spp)
    comp = val(259, [1])[0]
    offsets = val(273)
    counts = val(279)
    rows_per_strip = val(278, [height])[0]
    if any(b != 8 for b in bits):
        raise NotImplementedError("TIFF: only 8-bit samples supported")
    if comp not in (1, 32773):
        raise NotImplementedError(f"TIFF: compression {comp} not supported")
    if offsets is None or counts is None:
        raise ValueError("TIFF: missing strip offsets/counts")
    raw = bytearray()
    for off, cnt in zip(offsets, counts):
        strip = data[off : off + cnt]
        raw += packbits_decode(strip) if comp == 32773 else strip
    need = width * height * spp
    if len(raw) < need:
        raise ValueError("TIFF: short strip data")
    img = np.frombuffer(bytes(raw[:need]), dtype=np.uint8).reshape(
        height, width, spp
    )
    photometric = val(262, [1])[0]
    if photometric == 0:  # WhiteIsZero: invert
        img = 255 - img
    return img


def encode_tiff(img: np.ndarray, compression: int = 1) -> bytes:
    """(h, w[, c]) uint8 → single-strip little-endian TIFF (compression
    1 = none or 32773 = PackBits)."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    payload = arr.tobytes()
    if compression == 32773:
        payload = packbits_encode(payload)
    elif compression != 1:
        raise NotImplementedError(f"encode_tiff: compression {compression}")
    # layout: header(8) + payload + IFD
    strip_off = 8
    ifd_off = strip_off + len(payload)
    if ifd_off & 1:
        payload += b"\x00"
        ifd_off += 1
    entries = [
        (256, 3, 1, w),  # ImageWidth
        (257, 3, 1, h),  # ImageLength
        (258, 3, 1, 8),  # BitsPerSample (one value; all samples 8)
        (259, 3, 1, compression),
        (262, 3, 1, 1 if c == 1 else 2),  # BlackIsZero / RGB
        (273, 4, 1, strip_off),  # StripOffsets
        (277, 3, 1, c),  # SamplesPerPixel
        (278, 3, 1, h),  # RowsPerStrip
        (279, 4, 1, len(payload)),  # StripByteCounts
    ]
    ifd = struct.pack("<H", len(entries))
    for tag, typ, count, value in entries:
        ifd += struct.pack("<HHI", tag, typ, count)
        ifd += struct.pack("<I", value) if typ == 4 else struct.pack("<HH", value, 0)
    ifd += struct.pack("<I", 0)  # next IFD
    return b"II*\x00" + struct.pack("<I", ifd_off) + payload + ifd


# ---------------------------------------------------------------------------
# MP3 (MPEG audio) — HEADER WALK ONLY
# ---------------------------------------------------------------------------
# Full MP3 decode needs the ISO huffman/scalefactor tables and a synthesis
# filterbank — out of reach for stdlib-only code, so decode stays a
# documented fake. The FRAME HEADERS, however, are four documented bytes:
# probe_mp3 walks them for exact rate/duration metadata, which is what a
# curation pipeline needs before deciding whether to ship audio to a real
# decoder fleet.

_MP3_BITRATES = {
    # (version_group, layer) -> kbps table, index 1..14 (0 = free, 15 = bad)
    (1, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (1, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (1, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (2, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (2, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
              0: (11025, 12000, 8000)}


def _mp3_frame(data: bytes, pos: int):
    """Parse one MPEG audio frame header at ``pos``; returns
    (frame_bytes, samples, rate, layer) or None."""
    if pos + 4 > len(data) or data[pos] != 0xFF or (data[pos + 1] & 0xE0) != 0xE0:
        return None
    b1, b2 = data[pos + 1], data[pos + 2]
    version_bits = (b1 >> 3) & 0x3  # 0=2.5, 2=MPEG2, 3=MPEG1
    layer_bits = (b1 >> 1) & 0x3  # 1=III, 2=II, 3=I
    if version_bits == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits  # 1/2/3
    vgroup = 1 if version_bits == 3 else 2
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 0x3
    padding = (b2 >> 1) & 1
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    bitrate = _MP3_BITRATES[(vgroup, layer)][br_idx] * 1000
    rate = _MP3_RATES[version_bits][sr_idx]
    if layer == 1:
        nbytes = (12 * bitrate // rate + padding) * 4
        samples = 384
    else:
        samples = 1152 if (layer == 2 or vgroup == 1) else 576
        nbytes = samples // 8 * bitrate // rate + padding
    return nbytes, samples, rate, layer


def is_mp3(data: bytes) -> bool:
    """True when the payload starts with an ID3v2 tag or a valid MPEG
    audio frame header (not just sync bytes — the tables must accept it)."""
    if data is None or len(data) < 4:
        return False
    data = bytes(data)
    if data[:3] == b"ID3":
        return True
    return _mp3_frame(data, 0) is not None


def probe_mp3(data: bytes) -> tuple[int, int, int]:
    """Walk the frame chain: (sample_rate, total_samples, duration_ms).
    Skips a leading ID3v2 tag (syncsafe length)."""
    data = bytes(data)
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        size = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) | (
            (data[8] & 0x7F) << 7
        ) | (data[9] & 0x7F)
        pos = 10 + size
    rate = None
    total = 0
    while pos + 4 <= len(data):
        fr = _mp3_frame(data, pos)
        if fr is None:
            if rate is None:
                pos += 1  # hunt for the first sync
                continue
            break  # trailing garbage/tag after a valid chain
        nbytes, samples, r, _layer = fr
        rate = rate or r
        total += samples
        pos += max(nbytes, 4)
    if rate is None:
        raise ValueError("MP3: no valid frame header found")
    return rate, total, int(total * 1000 // rate)


def encode_mp3_stub(
    n_frames: int = 4, rate_idx: int = 0, bitrate_idx: int = 9
) -> bytes:
    """Build a structurally valid MPEG1 Layer III frame chain whose AUDIO
    payload is zeros — enough for header-walk tests/fixtures (a real
    encoder is out of scope, like the decoder)."""
    out = bytearray()
    for _ in range(n_frames):
        b2 = (bitrate_idx << 4) | (rate_idx << 2)
        hdr = bytes([0xFF, 0xFB, b2, 0x00])
        fr = _mp3_frame(hdr + b"\x00" * 4, 0)
        out += hdr + b"\x00" * (fr[0] - 4)
    return bytes(out)


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF and Ogg — HEADER WALKS ONLY
# ---------------------------------------------------------------------------
# Like MP3: the codec payloads (H.264/AAC/Vorbis/Opus) are out of stdlib
# reach, but the container structure is a documented byte walk — the
# metadata a pipeline needs to route assets to a real decode fleet.


def is_mp4(data: bytes) -> bool:
    return (
        data is not None
        and len(data) >= 12
        and bytes(data[4:8]) in (b"ftyp", b"moov", b"mdat", b"free", b"wide")
    )


def _mp4_boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        body_off = pos + 8
        if size == 1:  # 64-bit size
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body_off = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8:
            return
        yield btype, body_off, pos + size
        pos += size


def probe_mp4(data: bytes) -> tuple[int, int, int, int]:
    """ISO-BMFF box walk → (duration_ms, timescale, width, height).
    Duration from moov/mvhd; dims from the first non-zero trak/tkhd."""
    data = bytes(data)
    duration_ms = timescale = 0
    width = height = 0
    for btype, off, end in _mp4_boxes(data, 0, len(data)):
        if btype != b"moov":
            continue
        for b2, off2, end2 in _mp4_boxes(data, off, end):
            if b2 == b"mvhd":
                version = data[off2]
                if version == 1:
                    timescale, dur = struct.unpack(
                        ">IQ", data[off2 + 20 : off2 + 32]
                    )
                else:
                    timescale, dur = struct.unpack(
                        ">II", data[off2 + 12 : off2 + 20]
                    )
                if timescale:
                    duration_ms = int(dur * 1000 // timescale)
            elif b2 == b"trak":
                for b3, off3, _end3 in _mp4_boxes(data, off2, end2):
                    if b3 != b"tkhd":
                        continue
                    version = data[off3]
                    base = off3 + (96 if version == 1 else 84)
                    # width/height are 16.16 fixed point at the box tail
                    w_fx, h_fx = struct.unpack(">II", data[base - 8 : base])
                    if w_fx and h_fx and not (width and height):
                        width, height = w_fx >> 16, h_fx >> 16
    if not timescale:
        raise ValueError("MP4: no mvhd box")
    return duration_ms, timescale, width, height


def is_webp(data: bytes) -> bool:
    return (
        data is not None
        and len(data) >= 16
        and bytes(data[:4]) == b"RIFF"
        and bytes(data[8:12]) == b"WEBP"
    )


def probe_webp(data: bytes) -> tuple[int, int, str]:
    """WebP chunk walk → (width, height, variant). VP8X carries a 24-bit
    canvas size minus one; VP8L packs 14-bit dims after its signature
    byte; lossy VP8 stores dims in the frame header past the start code."""
    data = bytes(data)
    if not is_webp(data):
        raise ValueError("not a WebP stream")
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"VP8X":
            w = int.from_bytes(body[4:7], "little") + 1
            h = int.from_bytes(body[7:10], "little") + 1
            return w, h, "vp8x"
        if cid == b"VP8L":
            if body[0] != 0x2F:
                raise ValueError("WebP: bad VP8L signature")
            bits = int.from_bytes(body[1:5], "little")
            return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1, "vp8l"
        if cid == b"VP8 ":
            # frame tag (3) + start code 9d 01 2a + 16-bit dims (14 used)
            if body[3:6] != b"\x9d\x01\x2a":
                raise ValueError("WebP: bad VP8 start code")
            (w,) = struct.unpack("<H", body[6:8])
            (h,) = struct.unpack("<H", body[8:10])
            return w & 0x3FFF, h & 0x3FFF, "vp8"
        pos += 8 + clen + (clen & 1)
    raise ValueError("WebP: no image chunk found")


def is_ogg(data: bytes) -> bool:
    return data is not None and len(data) >= 4 and bytes(data[:4]) == b"OggS"


def probe_ogg(data: bytes) -> tuple[str, int, int, int]:
    """Ogg page walk → (codec, sample_rate, channels, duration_ms).
    Codec from the first packet's magic (Vorbis id header / OpusHead);
    duration from the LAST page's granule position (PCM sample count)."""
    data = bytes(data)
    if not is_ogg(data):
        raise ValueError("not an Ogg stream")
    # first page: segment table then the id packet
    nsegs = data[26]
    body = data[27 + nsegs :]
    codec, rate, channels = "unknown", 0, 0
    pre_skip = 0
    if body[:7] == b"\x01vorbis":
        channels = body[11]
        (rate,) = struct.unpack("<I", body[12:16])
        codec = "vorbis"
    elif body[:8] == b"OpusHead":
        channels = body[9]
        (pre_skip,) = struct.unpack("<H", body[10:12])
        rate = 48000  # Opus granules are always 48 kHz
        codec = "opus"
    # last page: scan backwards for the final OggS capture
    last = data.rfind(b"OggS")
    granule = struct.unpack("<q", data[last + 6 : last + 14])[0] if last >= 0 else 0
    dur = 0
    if rate and granule > 0:
        dur = int(max(0, granule - pre_skip) * 1000 // rate)
    return codec, rate, channels, dur


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------


def sniff(data: bytes) -> str | None:
    """Return the codec name for a payload, or None if unrecognized."""
    from . import flac as _flac
    from . import gif as _gif
    from . import jpeg as _jpeg

    if data is None:
        return None
    if is_png(data):
        return "png"
    if is_wav(data):
        return "wav"
    if is_pnm(data):
        return "pnm"
    if _jpeg.is_jpeg(bytes(data)):
        return "jpeg"
    if _gif.is_gif(bytes(data)):
        return "gif"
    if is_bmp(data):
        return "bmp"
    if _flac.is_flac(bytes(data)):
        return "flac"
    if is_aiff(data):
        return "aiff"
    if is_tiff(data):
        return "tiff"
    return None


def decode_any(data: bytes) -> np.ndarray:
    """Decode a recognized payload to a flat float64 array normalized to
    the multimodal convention: images → pixel/maxval in [0, 1]; audio →
    samples in [-1, 1). Raises ValueError for unrecognized payloads."""
    from . import gif as _gif
    from . import jpeg as _jpeg

    kind = sniff(data)
    if kind == "png":
        img = decode_png(data)
        maxval = 65535.0 if img.dtype == np.uint16 else 255.0
        return img.astype(np.float64).ravel() / maxval
    if kind == "wav":
        samples, _sr = decode_wav(data)
        return samples.astype(np.float64).ravel()
    if kind == "pnm":
        img = decode_pnm(data)
        maxval = 65535.0 if img.dtype == np.uint16 else 255.0
        return img.astype(np.float64).ravel() / maxval
    if kind == "jpeg":
        return _jpeg.decode_jpeg(bytes(data)).astype(np.float64).ravel() / 255.0
    if kind == "gif":
        # first composited frame; animations are frame-sampled upstream
        return _gif.decode_gif(bytes(data)).astype(np.float64).ravel() / 255.0
    if kind == "bmp":
        return decode_bmp(data).astype(np.float64).ravel() / 255.0
    if kind == "flac":
        from . import flac as _flac

        samples, _sr = _flac.decode_flac(bytes(data))
        return samples.astype(np.float64).ravel()
    if kind == "aiff":
        samples, _sr = decode_aiff(data)
        return samples.astype(np.float64).ravel()
    if kind == "tiff":
        return decode_tiff(data).astype(np.float64).ravel() / 255.0
    raise ValueError("unrecognized media payload (no magic match)")
