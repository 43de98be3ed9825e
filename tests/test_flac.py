"""FLAC codec tests (datapipe.flac): lossless round trips across every
encoder mode (verbatim / constant / fixed / LPC, all four channel
assignments), CRC verification, and hand-assembled streams for the
decoder-only features (escape partitions, wasted bits)."""

from __future__ import annotations

import numpy as np
import pytest

from rrdtool_1_x_spark.datapipe import codecs as C
from rrdtool_1_x_spark.datapipe import flac as FL


def _sig(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (2500 * np.sin(t / 40) + rng.normal(0, 25, n)).astype(np.int64)


@pytest.mark.parametrize("mode", ["verbatim", "fixed", "lpc"])
def test_flac_mono_roundtrip(mode):
    s = _sig()
    enc = FL.encode_flac(s, 8000, bits=16, block_size=1024, mode=mode)
    dec, rate = FL.decode_flac(enc)
    assert rate == 8000
    assert np.array_equal(dec[:, 0], s / 32768.0)


@pytest.mark.parametrize("stereo", [None, "left_side", "right_side", "mid_side"])
@pytest.mark.parametrize("mode", ["fixed", "lpc"])
def test_flac_stereo_assignments(stereo, mode):
    L = _sig(seed=1)
    R = (L * 0.9).astype(np.int64) + _sig(seed=2) // 50
    st = np.stack([L, R], axis=1)
    enc = FL.encode_flac(st, 44100, bits=16, block_size=2048, mode=mode, stereo=stereo)
    dec, _ = FL.decode_flac(enc)
    assert np.array_equal(dec, st / 32768.0)


def test_flac_compresses():
    """LPC must beat fixed on tonal content; decorrelation must beat
    independent channels on correlated stereo — both checks catch a
    predictor that silently degenerates to verbatim."""
    L = _sig(seed=3)
    st = np.stack([L, (L * 0.95).astype(np.int64)], axis=1)
    sizes = {
        (m, s): len(FL.encode_flac(st, 8000, bits=16, mode=m, stereo=s))
        for m in ("verbatim", "fixed", "lpc")
        for s in (None, "mid_side")
    }
    assert sizes[("lpc", None)] < sizes[("fixed", None)] < sizes[("verbatim", None)]
    assert sizes[("lpc", "mid_side")] < sizes[("lpc", None)]


def test_flac_constant_blocks_and_bit_depths():
    c = np.full(500, 77, dtype=np.int64)
    enc = FL.encode_flac(c, 8000, bits=16, block_size=100)
    assert len(enc) < 200  # constant subframes are a few bytes per block
    dec, _ = FL.decode_flac(enc)
    assert np.array_equal(dec[:, 0], c / 32768.0)
    for bits, scale in ((8, 128), (24, 1 << 23)):
        s = (_sig(700) // (32768 // scale if bits == 24 else 300)).astype(np.int64)
        s = np.clip(s, -scale, scale - 1)
        dec, _ = FL.decode_flac(FL.encode_flac(s, 8000, bits=bits, block_size=128))
        assert np.array_equal(dec[:, 0], s / scale)


def test_flac_crc_detects_corruption():
    enc = bytearray(FL.encode_flac(_sig(600), 8000, bits=16))
    enc[-3] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        FL.decode_flac(bytes(enc))


def test_flac_utf8_number_roundtrip():
    for v in (0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10FFFF, (1 << 31)):
        raw = FL._write_utf8_number(v)
        br = FL._Bits(raw)
        assert FL._read_utf8_number(br) == v, v


def _custom_frame_stream(build_subframe, n=64, bits=16):
    """Assemble a minimal 1-channel FLAC stream whose single frame's
    subframe bits are produced by ``build_subframe(bw)`` — lets tests
    exercise decoder features the encoder never emits."""
    import struct

    out = bytearray(FL.FLAC_MAGIC)
    si = bytearray()
    si += struct.pack(">HH", n, n)
    si += b"\x00\x00\x00" * 2
    packed = (8000 << 44) | (0 << 41) | ((bits - 1) << 36) | n
    si += packed.to_bytes(8, "big")
    si += b"\x00" * 16
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + bytes(si)

    bw = FL._BitW()
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(7, 4)  # 16-bit block size at end
    bw.write(0, 4)
    bw.write(0, 4)  # 1 channel
    bw.write(4, 3)  # 16-bit
    bw.write(0, 1)
    bw.write(0, 8)  # frame number 0
    bw.write(n - 1, 16)
    bw.write(FL.crc8(bytes(bw.out)), 8)
    build_subframe(bw)
    bw.align()
    bw.write(FL.crc16(bytes(bw.out)), 16)
    return bytes(out) + bytes(bw.out)


def test_flac_escape_partition_decode():
    """Residual partitions with the escape code store raw k-bit values;
    hand-build a fixed-order-0 subframe using an escaped partition."""
    vals = np.array([5, -3, 0, 7] * 16, dtype=np.int64)

    def sub(bw):
        bw.write(0, 1)
        bw.write(8, 6)  # FIXED order 0
        bw.write(0, 1)
        bw.write(0, 2)  # residual method 0
        bw.write(0, 4)  # partition order 0
        bw.write(0xF, 4)  # escape
        bw.write(6, 5)  # 6 raw bits per residual
        for v in vals:
            bw.write(int(v), 6)

    dec, _ = FL.decode_flac(_custom_frame_stream(sub))
    assert np.array_equal(dec[:, 0], vals / 32768.0)


def test_flac_wasted_bits_decode():
    """A subframe with k wasted bits stores samples >> k; the decoder
    must shift them back."""
    vals = (np.arange(64, dtype=np.int64) - 32) * 4  # all divisible by 4

    def sub(bw):
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(1, 1)  # wasted-bits flag
        bw.write(1, 2)  # unary "01" → count-1 = 1 → wasted = 2
        for v in vals >> 2:
            bw.write(int(v), 14)  # 16 - 2 wasted

    dec, _ = FL.decode_flac(_custom_frame_stream(sub))
    assert np.array_equal(dec[:, 0], vals / 32768.0)


def test_flac_multiframe_partition_orders():
    """Longer stream: verify partitioned residuals (order > 0) actually
    get chosen and decode across several frames."""
    rng = np.random.default_rng(4)
    # piecewise: quiet half, loud half → per-partition params differ
    s = np.concatenate([
        rng.integers(-40, 40, 2048), rng.integers(-8000, 8000, 2048),
        rng.integers(-40, 40, 2048),
    ]).astype(np.int64)
    enc = FL.encode_flac(s, 8000, bits=16, block_size=4096, mode="fixed")
    dec, _ = FL.decode_flac(enc)
    assert np.array_equal(dec[:, 0], s / 32768.0)


def test_flac_dispatch_and_probe(spark):
    """sniff/decode_any integration + probe_media STREAMINFO fields +
    FLAC-aware sample_audio_frames striding."""
    from rrdtool_1_x_spark.datapipe.multimodal import (
        MEDIA_SCHEMA,
        probe_media,
        sample_audio_frames,
    )

    s = ((np.arange(400) % 256) - 128) * 256
    enc = FL.encode_flac(s.astype(np.int64), 8000, bits=16, block_size=128)
    assert C.sniff(enc) == "flac"
    assert np.allclose(C.decode_any(enc), s / 32768.0)

    rows = [(1, "audio", bytearray(enc), ("audio/flac", None, None, 8000, 50))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    p = probe_media(media).collect()[0]
    assert (p.mime, p.sample_rate, p.n_samples, p.duration_ms) == (
        "audio/flac", 8000, 400, 50,
    )
    sampled = bytes(sample_audio_frames(media, 4).collect()[0].content)
    assert C.sniff(sampled) == "flac"
    dec, rate = FL.decode_flac(sampled)
    assert rate == 2000
    assert np.array_equal(dec[:, 0], s[::4] / 32768.0)
