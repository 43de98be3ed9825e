"""Property + fuzz tests for the codec layer: lossless round trips hold
for arbitrary content, and mutated/truncated streams fail CLEANLY
(ValueError/NotImplementedError) — never hang, crash, or silently return
wrong shapes. The quarantine path in multimodal._decode relies on this
contract."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from rrdtool_1_x_spark.datapipe import codecs as C
from rrdtool_1_x_spark.datapipe import flac as FL
from rrdtool_1_x_spark.datapipe import gif as G
from rrdtool_1_x_spark.datapipe import jpeg as J

_DIMS = st.tuples(st.integers(1, 24), st.integers(1, 24))


@settings(max_examples=40, deadline=None)
@given(dims=_DIMS, channels=st.sampled_from([1, 3, 4]), data=st.data())
def test_png_lossless_any_content(dims, channels, data):
    h, w = dims
    seed = data.draw(st.integers(0, 2**31 - 1))
    img = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, channels), dtype=np.uint8
    )
    if channels == 1:
        img = img[:, :, 0]
        assert np.array_equal(C.decode_png(C.encode_png(img))[:, :, 0], img)
    else:
        assert np.array_equal(C.decode_png(C.encode_png(img)), img)


@settings(max_examples=40, deadline=None)
@given(dims=_DIMS, data=st.data())
def test_gif_bmp_lossless_any_content(dims, data):
    h, w = dims
    seed = data.draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    assert np.array_equal(
        G.decode_gif(G.encode_gif(idx)), np.stack([idx] * 3, axis=2)
    )
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(C.decode_bmp(C.encode_bmp(rgb)), rgb)


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 4000),
    block=st.sampled_from([64, 256, 1024]),
    mode=st.sampled_from(["fixed", "lpc", "verbatim"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_flac_lossless_any_content(n, block, mode, seed):
    s = np.random.default_rng(seed).integers(-32768, 32768, n).astype(np.int64)
    dec, _ = FL.decode_flac(FL.encode_flac(s, 8000, 16, block, mode))
    assert np.array_equal(dec[:, 0], s / 32768.0)


@settings(max_examples=30, deadline=None)
@given(gw=st.integers(1, 6), gh=st.integers(1, 6), seed=st.integers(0, 2**31 - 1))
def test_jpeg_q100_blockflat_exact_property(gw, gh, seed):
    vals = np.random.default_rng(seed).integers(0, 256, (gh, gw), dtype=np.uint8)
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    assert np.array_equal(J.decode_jpeg(J.encode_jpeg(img, quality=100))[:, :, 0], img)
    rgb = np.stack([img] * 3, axis=2)
    assert np.array_equal(
        J.decode_jpeg(J.encode_jpeg(rgb, quality=100, subsample="420")), rgb
    )


@settings(max_examples=25, deadline=None)
@given(q=st.integers(35, 95), seed=st.integers(0, 2**31 - 1))
def test_jpeg_lossy_bounded_error_property(q, seed):
    rng = np.random.default_rng(seed)
    y = (np.add.outer(np.arange(24) * 5, np.arange(32) * 3) % 256).astype(np.uint8)
    img = np.stack([y, y // 2, 255 - y], axis=2)
    dec = J.decode_jpeg(J.encode_jpeg(img, quality=q))
    mse = np.mean((dec.astype(float) - img.astype(float)) ** 2)
    assert 10 * np.log10(255.0**2 / max(mse, 1e-9)) > 22.0


# ---------------------------------------------------------------------------
# Corruption fuzz: decoders must fail cleanly
# ---------------------------------------------------------------------------

import struct as _struct
import zlib as _zlib

# the quarantine contract (multimodal._decode) catches Exception; "clean"
# means a typed exception promptly — never a hang, crash, or wrong data
_OK_ERRORS = (ValueError, NotImplementedError, KeyError, IndexError,
              OverflowError, MemoryError, ZeroDivisionError,
              _struct.error, _zlib.error)


def _fixtures():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    rgb = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    s = rng.integers(-2000, 2000, 500).astype(np.int64)
    return [
        C.encode_png(img),
        C.encode_bmp(rgb),
        C.encode_pnm(img),
        C.encode_wav(s / 32768.0, 8000, 16),
        C.encode_wav_g711(s / 32768.0, 8000, "mulaw"),
        G.encode_gif(img),
        J.encode_jpeg(rgb, quality=80),
        FL.encode_flac(s, 8000, 16, 128),
        C.encode_aiff(s / 32768.0, 8000, 16),
        C.encode_tiff(rgb, compression=32773),
    ]


@settings(max_examples=120, deadline=None)
@given(data=st.data())
def test_decoders_fail_cleanly_on_mutation(data):
    payloads = _fixtures()
    payload = bytearray(payloads[data.draw(st.integers(0, len(payloads) - 1))])
    mode = data.draw(st.sampled_from(["truncate", "flip", "splice"]))
    rng_seed = data.draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(rng_seed)
    if mode == "truncate":
        payload = payload[: rng.integers(0, len(payload))]
    elif mode == "flip":
        for _ in range(rng.integers(1, 8)):
            payload[rng.integers(0, len(payload))] ^= int(rng.integers(1, 256))
    else:  # splice random bytes into the middle
        at = int(rng.integers(0, len(payload)))
        payload = payload[:at] + bytes(rng.integers(0, 256, 16, dtype=np.uint8)) + payload[at:]
    data_b = bytes(payload)
    try:
        if C.sniff(data_b) is not None:
            out = C.decode_any(data_b)
            assert isinstance(out, np.ndarray)  # survived: fine, but typed
    except _OK_ERRORS:
        pass  # clean refusal is the contract


def test_decode_any_empty_and_tiny():
    for data_b in (b"", b"\x00", b"BM", b"fLaC", b"GIF89a", b"\xff\xd8\xff"):
        try:
            if C.sniff(data_b) is not None:
                C.decode_any(data_b)
        except _OK_ERRORS:
            pass
