"""Pure-stdlib codec tests (datapipe.codecs): PNG round-trips across color
types / bit depths, all five PNG filters, palette + tRNS, WAV PCM/float,
netpbm binary + ASCII — no Spark session needed."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from rrdtool_1_x_spark.datapipe import codecs as C
from rrdtool_1_x_spark.datapipe.multimodal import _decode


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


@pytest.mark.parametrize(
    "shape,dtype",
    [
        ((16, 16), np.uint8),      # gray
        ((7, 5, 3), np.uint8),     # rgb
        ((4, 9, 4), np.uint8),     # rgba
        ((3, 3, 2), np.uint8),     # gray+alpha
        ((5, 6), np.uint16),       # 16-bit gray
        ((4, 4, 3), np.uint16),    # 16-bit rgb
    ],
)
def test_png_roundtrip(shape, dtype):
    rng = np.random.default_rng(hash(shape) % 2**31)
    hi = 65535 if dtype == np.uint16 else 255
    img = rng.integers(0, hi + 1, size=shape).astype(dtype)
    dec = C.decode_png(C.encode_png(img))
    ref = img if img.ndim == 3 else img[:, :, None]
    assert dec.shape == ref.shape and (dec == ref).all()


def test_png_all_filters():
    """Hand-filter rows with types 0-4 (Sub/Up/Average/Paeth) and verify
    the unfilter reconstructs the original pixels."""
    rng = np.random.default_rng(7)
    w, h = 8, 6
    img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    rows = []
    prev = np.zeros(w * 3, dtype=np.uint8)

    def paeth(a, b, c):
        p = a.astype(int) + b.astype(int) - c.astype(int)
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)).astype(np.uint8)

    for y in range(h):
        line = img[y].ravel()
        f = y % 5
        left = np.concatenate([np.zeros(3, dtype=np.uint8), line[:-3]])
        up = prev
        ul = np.concatenate([np.zeros(3, dtype=np.uint8), prev[:-3]])
        if f == 0:
            filt = line.astype(int)
        elif f == 1:
            filt = line.astype(int) - left.astype(int)
        elif f == 2:
            filt = line.astype(int) - up.astype(int)
        elif f == 3:
            filt = line.astype(int) - ((left.astype(int) + up.astype(int)) >> 1)
        else:
            filt = line.astype(int) - paeth(left, up, ul).astype(int)
        rows.append(bytes([f]) + bytes((filt & 0xFF).astype(np.uint8)))
        prev = line
    png = (
        C.PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )
    assert (C.decode_png(png) == img).all()


def test_png_palette_and_trns():
    rng = np.random.default_rng(3)
    plte = rng.integers(0, 256, size=(16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, size=(5, 7)).astype(np.uint8)
    raw = b"".join(b"\x00" + bytes(idx[y]) for y in range(5))
    base = C.PNG_MAGIC + _chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 5, 8, 3, 0, 0, 0))
    png = base + _chunk(b"PLTE", plte.tobytes()) + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    assert (C.decode_png(png) == plte[idx]).all()
    trns = bytes(range(16))
    png2 = (
        base
        + _chunk(b"PLTE", plte.tobytes())
        + _chunk(b"tRNS", trns)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    dec = C.decode_png(png2)
    assert dec.shape == (5, 7, 4)
    assert (dec[..., :3] == plte[idx]).all()
    assert (dec[..., 3] == idx).all()


def test_png_subbyte_depth():
    rng = np.random.default_rng(5)
    w, h = 6, 3
    vals = rng.integers(0, 16, size=(h, w)).astype(np.uint8)

    def pack4(row):
        out = bytearray()
        for i in range(0, len(row), 2):
            lo = row[i + 1] if i + 1 < len(row) else 0
            out.append((row[i] << 4) | lo)
        return bytes(out)

    raw = b"".join(b"\x00" + pack4(vals[y]) for y in range(h))
    png = (
        C.PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 4, 0, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    assert (C.decode_png(png).reshape(h, w) == vals).all()


def _adam7_encode(img: np.ndarray) -> bytes:
    """Build an Adam7-interlaced PNG by hand (filter 0 on every sub-image
    scanline) so the decoder's de-interlacing can be verified."""
    h, w, c = img.shape
    raw = bytearray()
    for x0, y0, xs, ys in C._ADAM7:
        sub = img[y0::ys, x0::xs]
        if sub.size == 0:
            continue
        for row in sub:
            raw += b"\x00" + row.astype(np.uint8).tobytes()
    color_type = {1: 0, 3: 2, 4: 6}[c]
    return (
        C.PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1))
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("shape", [(2, 2, 1), (9, 7, 3), (16, 16, 1), (5, 11, 4), (1, 1, 1)])
def test_png_adam7_interlace(shape):
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, size=shape).astype(np.uint8)
    assert np.array_equal(C.decode_png(_adam7_encode(img)), img)


@pytest.mark.parametrize("bits", [8, 16])
def test_wav_roundtrip(bits):
    rng = np.random.default_rng(11)
    s = rng.uniform(-0.9, 0.9, size=(100, 2))
    dec, sr = C.decode_wav(C.encode_wav(s, 44100, bits=bits))
    assert sr == 44100 and dec.shape == (100, 2)
    assert np.abs(dec - s).max() < (1 / 64 if bits == 8 else 1 / 16384)


def test_wav_pcm8_bytes_exact():
    rng = np.random.default_rng(13)
    raw = bytes(rng.integers(0, 256, size=64).astype(np.uint8))
    dec, sr = C.decode_wav(C.encode_wav_pcm8_bytes(raw, 8000))
    expect = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    assert sr == 8000 and (dec.ravel() == expect).all()


def test_wav_float_and_24bit():
    s = np.linspace(-1, 1, 50, endpoint=False)
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
    payload = s.astype("<f4").tobytes()
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 24 + 8 + len(payload)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    dec, _ = C.decode_wav(wav)
    assert np.abs(dec.ravel() - s).max() < 1e-7
    # 24-bit PCM
    vals = (s * (1 << 23)).astype(np.int64)
    vals = np.clip(vals, -(1 << 23), (1 << 23) - 1)
    b24 = bytearray()
    for v in vals:
        u = int(v) & 0xFFFFFF
        b24 += bytes((u & 0xFF, (u >> 8) & 0xFF, (u >> 16) & 0xFF))
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    wav24 = (
        b"RIFF" + struct.pack("<I", 4 + 24 + 8 + len(b24)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(b24)) + bytes(b24)
    )
    dec24, _ = C.decode_wav(wav24)
    assert np.abs(dec24.ravel() - s).max() < 1e-6


def test_wav_extensible():
    """WAVE_FORMAT_EXTENSIBLE wraps PCM/float behind a subformat GUID —
    decode must read the real tag from the GUID's leading bytes."""
    s = (np.arange(64) - 32).astype(np.float64) / 64.0
    base = C.encode_wav(s, 8000, bits=16)
    # rebuild with an extensible fmt chunk (cbSize 22, PCM subformat GUID)
    guid = struct.pack("<H", 1) + b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    fmt = struct.pack("<HHIIHHHHI", 0xFFFE, 1, 8000, 16000, 2, 16, 22, 16, 0) + guid
    payload = np.clip(s * 32768.0, -32768, 32767).astype("<i2").tobytes()
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    ext = b"RIFF" + struct.pack("<I", len(body)) + body
    a, ra = C.decode_wav(base)
    b, rb = C.decode_wav(ext)
    assert ra == rb == 8000
    assert np.array_equal(a, b)
    with pytest.raises(ValueError):
        C.decode_wav(ext[:40])  # truncated extensible fmt


def test_wav_g711_mulaw_alaw():
    """G.711 companded WAV (formats 7/6): every decodable level survives
    a re-encode (level identity), the encoder is the nearest-level
    quantizer, and the end-to-end error stays within the 8-bit companding
    bound. Spot values from the published tables."""
    for law, dec, enc in (("mulaw", C._mulaw_decode, C._mulaw_encode),
                          ("alaw", C._alaw_decode, C._alaw_encode)):
        codes = np.arange(256, dtype=np.uint8)
        lin = dec(codes)
        assert np.array_equal(dec(enc(lin)), lin)
        s = np.sin(np.arange(500) / 15) * 0.7
        w = C.encode_wav_g711(s, 8000, law)
        d, rate = C.decode_wav(w)
        assert rate == 8000
        assert np.abs(d[:, 0] - s).max() < 0.02
    # table spot checks: mu-law 0xFF is +0, 0x80 the positive maximum;
    # A-law 0xAA maps to the positive maximum 32256
    assert C._mulaw_decode(np.array([0xFF], dtype=np.uint8))[0] == 0
    assert C._mulaw_decode(np.array([0x80], dtype=np.uint8))[0] == 32124
    assert C._alaw_decode(np.array([0xAA], dtype=np.uint8))[0] == 32256


def test_mp3_header_probe():
    """MP3 stays undecodable by design, but the frame-header walk yields
    exact rate/duration metadata; ID3v2 tags are skipped via the syncsafe
    length."""
    mp3 = C.encode_mp3_stub(n_frames=5, rate_idx=0, bitrate_idx=9)
    assert C.is_mp3(mp3)
    assert C.sniff(mp3) is None  # not in the decodable dispatch
    rate, nsamp, dur = C.probe_mp3(mp3)
    assert (rate, nsamp) == (44100, 5 * 1152)
    assert dur == 5 * 1152 * 1000 // 44100
    # ID3v2 prefix: 10-byte header + 20-byte body, syncsafe size
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x14" + b"\x00" * 20
    assert C.is_mp3(id3 + mp3)
    assert C.probe_mp3(id3 + mp3) == (rate, nsamp, dur)
    with pytest.raises(ValueError):
        C.probe_mp3(b"\xff\xe0 not a real frame")
    assert not C.is_mp3(b"plain text")


def test_pnm_roundtrip_and_ascii():
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(9, 4, 3)).astype(np.uint8)
    assert (C.decode_pnm(C.encode_pnm(img)) == img).all()
    g = rng.integers(0, 256, size=(5, 5)).astype(np.uint8)
    assert (C.decode_pnm(C.encode_pnm(g)).reshape(5, 5) == g).all()
    p2 = b"P2\n# comment\n3 2\n255\n0 10 20\n30 40 250\n"
    assert (C.decode_pnm(p2).reshape(2, 3) == [[0, 10, 20], [30, 40, 250]]).all()


def test_sniff_rejects_prose():
    assert C.sniff(b"P3xxx is a standard") is None
    assert C.sniff(b"Plain text") is None
    assert C.sniff(b"P5 2 2 255 " + b"\0" * 4) == "pnm"


def test_decode_dispatch_and_strict():
    png = C.encode_png(np.arange(256, dtype=np.uint8).reshape(16, 16))
    assert np.allclose(_decode(png, "image", True), np.arange(256) / 255.0)
    with pytest.raises(Exception):
        _decode(b"\xff\xd8\xffjunk-jpeg", "image", True)  # corrupt JPEG: strict raises
    with pytest.raises(NotImplementedError):
        _decode(b"\xff\xfb\x90\x00mp3-frame", "audio", True)  # MP3: no stdlib codec
    assert len(_decode(b"hello", "image", False)) == 256  # fake fallback
    # sniffed-but-corrupt payload: fake in lenient mode, raise in strict
    corrupt = C.PNG_MAGIC + b"\x00\x00\x00\x01IHDRxx"
    assert len(_decode(corrupt, "image", False)) == 256
    with pytest.raises(Exception):
        _decode(corrupt, "image", True)


def test_probe_resize_framesample(spark):
    """Spark-side multimodal ops over real payloads: probe_media reads the
    actual headers, resize_images re-encodes at the target dims,
    sample_audio_frames strides the PCM stream."""
    from rrdtool_1_x_spark.datapipe.multimodal import (
        MEDIA_SCHEMA,
        probe_media,
        resize_images,
        sample_audio_frames,
    )

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(20, 10, 3)).astype(np.uint8)
    wav = C.encode_wav(rng.uniform(-0.5, 0.5, size=400), 8000, bits=16)
    rows = [
        (1, "image", bytearray(C.encode_png(img)), ("image/png", 10, 20, None, None)),
        (2, "audio", bytearray(wav), ("audio/wav", None, None, 8000, 50)),
        (3, "text", bytearray(b"not media"), (None, None, None, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    probed = {r.doc_id: r for r in probe_media(media).collect()}
    assert (probed[1].width, probed[1].height) == (10, 20)
    assert probed[1].mime == "image/png"
    assert (probed[2].sample_rate, probed[2].n_samples, probed[2].duration_ms) == (8000, 400, 50)
    assert probed[3].mime is None

    resized = {r.doc_id: bytes(r.content) for r in resize_images(media, 5, 4).collect()}
    out = C.decode_png(resized[1])
    assert out.shape == (5, 4, 3)
    # nearest-neighbor: pixel (y,x) comes from (y*20//5, x*10//4)
    assert (out[2, 3] == img[8, 7]).all()
    assert resized[3] == b"not media"  # pass-through

    sampled = {r.doc_id: bytes(r.content) for r in sample_audio_frames(media, 4).collect()}
    s, rate = C.decode_wav(sampled[2])
    assert s.shape[0] == 100 and rate == 2000
    orig, _ = C.decode_wav(wav)
    assert np.abs(s[:, 0] - orig[::4, 0]).max() < 1e-4
    assert sampled[3] == b"not media"
