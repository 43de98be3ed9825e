"""Tests for the baseline JPEG (datapipe.jpeg), GIF (datapipe.gif), and
BMP (datapipe.codecs) codecs — all pure stdlib + numpy, no Spark session
needed except for the multimodal-operator drives at the end."""

from __future__ import annotations

import numpy as np
import pytest

from rrdtool_1_x_spark.datapipe import codecs as C
from rrdtool_1_x_spark.datapipe import gif as G
from rrdtool_1_x_spark.datapipe import jpeg as J

# ---------------------------------------------------------------------------
# JPEG
# ---------------------------------------------------------------------------


def _block_flat(vals: np.ndarray) -> np.ndarray:
    """Expand an (n, m) byte grid to (8n, 8m) with each 8x8 block flat."""
    return np.repeat(np.repeat(vals, 8, 0), 8, 1)


def test_jpeg_flat_blocks_exact_gray():
    """quality=100 -> all-ones quant tables -> block-flat images have only
    an integer DC coefficient, so decode reproduces input bit-exactly."""
    rng = np.random.default_rng(3)
    img = _block_flat(rng.integers(0, 256, size=(4, 6), dtype=np.uint8))
    dec = J.decode_jpeg(J.encode_jpeg(img, quality=100))
    assert dec.shape == (32, 48, 1)
    assert np.array_equal(dec[:, :, 0], img)


def test_jpeg_flat_blocks_exact_rgb420():
    """R=G=B makes chroma exactly 128 (flat), luma exactly v — so the full
    color path (subsample, upsample, YCbCr round trip) is also exact."""
    rng = np.random.default_rng(4)
    g = _block_flat(rng.integers(0, 256, size=(4, 4), dtype=np.uint8))
    rgb = np.stack([g] * 3, axis=2)
    for sub in ("444", "420"):
        dec = J.decode_jpeg(J.encode_jpeg(rgb, quality=100, subsample=sub))
        assert np.array_equal(dec, rgb), sub


def test_jpeg_quality_tables():
    luma100, chroma100 = J.quant_tables(100)
    assert (luma100 == 1).all() and (chroma100 == 1).all()
    luma50, _ = J.quant_tables(50)
    assert (luma50 == J.BASE_QUANT_LUMA).all()  # scale 100 => identity
    luma10, _ = J.quant_tables(10)
    assert (luma10 >= luma50).all()  # lower quality, coarser quantizers


@pytest.mark.parametrize("sub", ["444", "420"])
def test_jpeg_lossy_psnr(sub):
    """Smooth content at quality 90 must round-trip above 30 dB PSNR —
    catches DCT/quant/Huffman sign or ordering errors that still produce
    a structurally valid stream."""
    y = np.add.outer(np.arange(48) * 3, np.arange(64) * 2) % 256
    img = np.stack([y, 255 - y, y // 2], axis=2).astype(np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(img, quality=90, subsample=sub))
    mse = np.mean((dec.astype(float) - img.astype(float)) ** 2)
    assert 10 * np.log10(255.0**2 / mse) > 30.0


def test_jpeg_restart_markers():
    """DRI/RSTn framing: decode with restarts == decode without."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
    plain = J.decode_jpeg(J.encode_jpeg(img, quality=80, subsample="420"))
    rst = J.decode_jpeg(
        J.encode_jpeg(img, quality=80, subsample="420", restart_interval=2)
    )
    assert np.array_equal(plain, rst)


def test_jpeg_odd_dimensions():
    """Non-multiple-of-8 (and of 16 for 4:2:0) dims: encoder pads with
    edge replication, decoder crops back to the SOF dims."""
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
    for sub in ("444", "420"):
        dec = J.decode_jpeg(J.encode_jpeg(img, quality=95, subsample=sub))
        assert dec.shape == (13, 17, 3)
    gray = rng.integers(0, 256, size=(9, 11), dtype=np.uint8)
    assert J.decode_jpeg(J.encode_jpeg(gray, quality=95)).shape == (9, 11, 1)


def test_jpeg_progressive_rejected():
    """SOF2 must raise NotImplementedError, not mis-decode."""
    data = bytearray(J.encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        J.decode_jpeg(bytes(data))


def test_jpeg_extend_and_category():
    """T.81 EXTEND table spot checks (F.12): category n, low values map
    to the negative range."""
    assert J._extend(0, 1) == -1 and J._extend(1, 1) == 1
    assert J._extend(0b00, 2) == -3 and J._extend(0b11, 2) == 3
    assert J._extend(5, 3) == 5 and J._extend(2, 3) == -5
    for v in (-255, -128, -1, 0, 1, 127, 255, 1023):
        s = J._category(v)
        if v == 0:
            assert s == 0
            continue
        enc = v if v >= 0 else v + (1 << s) - 1
        assert J._extend(enc, s) == v  # encoder mapping inverts EXTEND


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------


def test_gif_gray_roundtrip_exact():
    rng = np.random.default_rng(7)
    f = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    dec = G.decode_gif(G.encode_gif(f))
    assert np.array_equal(dec, np.stack([f] * 3, axis=2))


def test_gif_small_palette():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], np.uint8)
    rng = np.random.default_rng(8)
    idx = rng.integers(0, 4, size=(11, 13), dtype=np.uint8)
    assert np.array_equal(G.decode_gif(G.encode_gif(idx, palette=pal)), pal[idx])


def test_gif_animation_roundtrip_and_probe():
    rng = np.random.default_rng(9)
    frames = [rng.integers(0, 256, size=(8, 8), dtype=np.uint8) for _ in range(5)]
    enc = G.encode_gif(frames, delays=[10, 20, 30, 40, 50])
    dec, delays = G.decode_gif_frames(enc)
    assert delays == [10, 20, 30, 40, 50]
    for i in range(5):
        assert np.array_equal(dec[i], np.stack([frames[i]] * 3, axis=2))
    assert G.probe_gif(enc) == (8, 8, 5, 150)


def test_gif_lzw_stress():
    rng = np.random.default_rng(10)
    for payload in (
        bytes(rng.integers(0, 256, 20000, dtype=np.uint8)),  # dict growth + reset
        b"ab" * 30000,  # long repeats (KwKwK cases)
        bytes(range(256)) * 64,
        b"",
        b"\x00",
    ):
        assert bytes(G.lzw_decode(G.lzw_encode(payload, 8), 8)) == payload
    # small min-code-size path
    quad = bytes([0, 1, 2, 3] * 500)
    assert bytes(G.lzw_decode(G.lzw_encode(quad, 2), 2)) == quad


def test_gif_transparency_composites_previous_frame():
    """Frame 2 marked transparent at index 0 must keep frame 1's pixels
    where transparent."""
    import struct

    base = np.full((4, 4), 200, dtype=np.uint8)
    overlay = np.zeros((4, 4), dtype=np.uint8)
    overlay[1, 1] = 77
    enc = bytearray(G.encode_gif([base, overlay], delays=[5, 5]))
    # rewrite the second GCE (0x21 0xF9) to set the transparency flag on
    # index 0: packed byte gets bit 0, transparent-index byte = 0
    pos = enc.find(b"\x21\xf9", enc.find(b"\x21\xf9") + 2)
    assert pos > 0
    enc[pos + 3] |= 0x01  # packed (after 0x21 0xF9 <len>)
    enc[pos + 6] = 0  # transparent index
    frames, _ = G.decode_gif_frames(bytes(enc))
    assert frames[1][1, 1, 0] == 77  # opaque overlay pixel painted
    assert frames[1][0, 0, 0] == 200  # transparent pixel kept from frame 1


def test_gif_resample_lossless():
    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, size=(8, 8), dtype=np.uint8) for _ in range(6)]
    enc = G.encode_gif(frames, delays=[1, 2, 3, 4, 5, 6])
    out = G.resample_gif(enc, 3)
    dec, delays = G.decode_gif_frames(out)
    assert dec.shape[0] == 2
    assert np.array_equal(dec[0], np.stack([frames[0]] * 3, axis=2))
    assert np.array_equal(dec[1], np.stack([frames[3]] * 3, axis=2))
    assert delays == [1 + 2 + 3, 4 + 5 + 6]  # dropped delays folded forward


def test_gif_interlace_decode():
    """Hand-built interlaced image: set the interlace flag and reorder the
    rows per the 4-pass schedule; decoder must undo it."""
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, size=(10, 4), dtype=np.uint8)
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, 10, step))
    shuffled = img[np.array(order)]
    enc = bytearray(G.encode_gif(shuffled))
    pos = 6 + 7 + 768  # header + LSD + 256-entry GCT → image descriptor
    assert enc[pos] == 0x2C
    enc[pos + 9] |= 0x40  # image-descriptor interlace flag
    dec = G.decode_gif(bytes(enc))
    assert np.array_equal(dec[:, :, 0], img)


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


def test_bmp_roundtrip():
    rng = np.random.default_rng(13)
    for shape in ((16, 16, 3), (7, 5, 3), (3, 9, 3)):  # incl. padded strides
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(C.decode_bmp(C.encode_bmp(img)), img)
    gray = rng.integers(0, 256, size=(6, 6), dtype=np.uint8)
    assert np.array_equal(C.decode_bmp(C.encode_bmp(gray)), np.stack([gray] * 3, 2))


def test_bmp_8bit_palette_and_topdown():
    """Hand-build an 8-bit palette BMP (bottom-up) and a top-down 24-bit."""
    import struct

    pal = bytes()
    for i in range(256):
        pal += bytes([i, 255 - i, i // 2, 0])  # BGRX
    idx = np.array([[0, 1], [2, 255]], dtype=np.uint8)
    stride = 4  # 2 cols padded to 4
    pix = b"".join(bytes(idx[y]) + b"\0\0" for y in (1, 0))  # bottom-up
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, len(pix), 0, 0, 256, 0)
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + 1024 + len(pix), 0, 0, 14 + 40 + 1024)
    dec = C.decode_bmp(hdr + info + pal + pix)
    assert (dec[0, 0] == [idx[0, 0] // 2, 255 - idx[0, 0], idx[0, 0]]).all()
    assert (dec[1, 1] == [255 // 2, 0, 255]).all()

    img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    enc = bytearray(C.encode_bmp(img))
    # flip to top-down: negate height and reverse the (unpadded) rows
    enc[22:26] = struct.pack("<i", -2)
    rows = enc[54:]
    enc[54:] = bytes(rows[len(rows) // 2 :] + rows[: len(rows) // 2])
    assert np.array_equal(C.decode_bmp(bytes(enc)), img)


# ---------------------------------------------------------------------------
# Dispatch + Spark-side operators
# ---------------------------------------------------------------------------


def test_sniff_new_formats():
    assert C.sniff(J.encode_jpeg(np.zeros((8, 8), np.uint8))) == "jpeg"
    assert C.sniff(G.encode_gif(np.zeros((2, 2), np.uint8))) == "gif"
    assert C.sniff(C.encode_bmp(np.zeros((2, 2, 3), np.uint8))) == "bmp"
    assert C.sniff(b"\xff\xd8\xff\xe0") == "jpeg"
    assert C.sniff(b"GIF89a??") == "gif"
    assert C.sniff(b"GIF88a??") is None


def test_decode_any_new_formats():
    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    flat = np.repeat(np.repeat(np.arange(4, dtype=np.uint8).reshape(2, 2) * 60, 8, 0), 8, 1)
    assert np.allclose(
        C.decode_any(J.encode_jpeg(flat, quality=100)), flat.ravel() / 255.0
    )
    assert np.allclose(
        C.decode_any(G.encode_gif(g)), np.repeat(g.ravel(), 3) / 255.0
    )
    assert np.allclose(
        C.decode_any(C.encode_bmp(np.stack([g] * 3, 2))), np.repeat(g.ravel(), 3) / 255.0
    )


def test_multimodal_probe_resize_video(spark):
    """Spark drives for the new formats: probe reads JPEG SOF / GIF screen
    descriptor / BMP header; resize decodes them; sample_video_frames
    strides an animated GIF losslessly."""
    from rrdtool_1_x_spark.datapipe.multimodal import (
        MEDIA_SCHEMA,
        probe_media,
        resize_images,
        sample_video_frames,
    )

    rng = np.random.default_rng(14)
    jimg = rng.integers(0, 256, size=(24, 16, 3), dtype=np.uint8)
    frames = [rng.integers(0, 256, size=(8, 8), dtype=np.uint8) for _ in range(4)]
    rows = [
        (1, "image", bytearray(J.encode_jpeg(jimg, quality=92)),
         ("image/jpeg", 16, 24, None, None)),
        (2, "video", bytearray(G.encode_gif(frames, delays=[10, 10, 10, 10])),
         ("image/gif", 8, 8, None, 400)),
        (3, "image", bytearray(C.encode_bmp(jimg)), ("image/bmp", 16, 24, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    probed = {r.doc_id: r for r in probe_media(media).collect()}
    assert (probed[1].mime, probed[1].width, probed[1].height) == ("image/jpeg", 16, 24)
    assert (probed[2].mime, probed[2].n_samples, probed[2].duration_ms) == (
        "image/gif", 4, 400,
    )
    assert (probed[3].mime, probed[3].width, probed[3].height) == ("image/bmp", 16, 24)

    resized = {r.doc_id: bytes(r.content) for r in resize_images(media, 6, 4).collect()}
    for doc in (1, 3):
        assert C.decode_png(resized[doc]).shape == (6, 4, 3)

    sampled = {r.doc_id: bytes(r.content) for r in sample_video_frames(media, 2).collect()}
    dec, delays = G.decode_gif_frames(sampled[2])
    assert dec.shape[0] == 2 and delays == [20, 20]
    assert np.array_equal(dec[1], np.stack([frames[2]] * 3, axis=2))
    assert sampled[1] == bytes(rows[0][2])  # non-GIF passes through


# ---------------------------------------------------------------------------
# AIFF + TIFF
# ---------------------------------------------------------------------------


def test_aiff_roundtrip_and_extended_rate():
    rng = np.random.default_rng(30)
    s = rng.uniform(-0.9, 0.9, size=(300, 2))
    for rate in (8000, 44100, 96000, 11025):
        enc = C.encode_aiff(s, rate, bits=16)
        assert C.sniff(enc) == "aiff"
        d, r = C.decode_aiff(enc)
        assert r == rate  # survives the 80-bit extended float
        assert np.abs(d - np.clip(s, -1, 1)).max() < 1e-4
    # 8-bit path
    d, _ = C.decode_aiff(C.encode_aiff(s[:, 0], 8000, bits=8))
    assert np.abs(d[:, 0] - s[:, 0]).max() < 1e-2
    # extended-float codec is exact on integers
    for v in (1.0, 8000.0, 44100.0, 2.5, 1e6):
        assert C._read_extended80(C._write_extended80(v)) == v


def test_tiff_roundtrip_uncompressed_and_packbits():
    rng = np.random.default_rng(31)
    for shape in ((16, 16), (9, 7, 3), (5, 11, 4)):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        want = img if img.ndim == 3 else img[:, :, None]
        for comp in (1, 32773):
            enc = C.encode_tiff(img, compression=comp)
            assert C.sniff(enc) == "tiff"
            assert np.array_equal(C.decode_tiff(enc), want)
    # packbits favors runs: repetitive content must compress
    flat = np.full((64, 64), 7, dtype=np.uint8)
    assert len(C.encode_tiff(flat, 32773)) < len(C.encode_tiff(flat, 1)) / 10


def test_packbits_exhaustive():
    rng = np.random.default_rng(32)
    for payload in (b"", b"a", b"ab", b"aaa", b"aaab" * 50,
                    bytes(rng.integers(0, 4, 1000, dtype=np.uint8)),
                    bytes(rng.integers(0, 256, 1000, dtype=np.uint8)),
                    b"x" * 1000):
        assert bytes(C.packbits_decode(C.packbits_encode(payload))) == payload


def test_tiff_big_endian_and_whitezero():
    """Hand-build an MM (big-endian) WhiteIsZero TIFF; decode must honor
    byte order and invert the photometric."""
    import struct

    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    payload = img.tobytes()
    ifd_off = 8 + len(payload)
    entries = [
        (256, 3, 1, 4), (257, 3, 1, 3), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 0),  # WhiteIsZero
        (273, 4, 1, 8), (277, 3, 1, 1), (278, 3, 1, 3),
        (279, 4, 1, len(payload)),
    ]
    ifd = struct.pack(">H", len(entries))
    for tag, typ, count, value in entries:
        ifd += struct.pack(">HHI", tag, typ, count)
        ifd += struct.pack(">I", value) if typ == 4 else struct.pack(">HH", value, 0)
    ifd += struct.pack(">I", 0)
    data = b"MM\x00*" + struct.pack(">I", ifd_off) + payload + ifd
    assert np.array_equal(C.decode_tiff(data)[:, :, 0], 255 - img)


def test_probe_aiff_tiff(spark):
    from rrdtool_1_x_spark.datapipe.multimodal import MEDIA_SCHEMA, probe_media

    s = np.sin(np.arange(400) / 9)
    rows = [
        (1, "audio", bytearray(C.encode_aiff(s, 22050, 16)),
         ("audio/aiff", None, None, 22050, 18)),
        (2, "image", bytearray(C.encode_tiff(np.zeros((6, 9), np.uint8))),
         ("image/tiff", 9, 6, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    p = {r.doc_id: r for r in probe_media(media).collect()}
    assert (p[1].mime, p[1].sample_rate, p[1].n_samples) == ("audio/aiff", 22050, 400)
    assert (p[2].mime, p[2].width, p[2].height) == ("image/tiff", 9, 6)


def _mini_mp4(dur_units=9000, timescale=1000, w=640, h=360):
    """Hand-assembled minimal ISO-BMFF: ftyp + moov(mvhd + trak(tkhd))."""
    import struct

    def box(btype, body):
        return struct.pack(">I", len(body) + 8) + btype + body

    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mvhd = box(b"mvhd", b"\x00" + b"\x00" * 3 + b"\x00" * 8
               + struct.pack(">II", timescale, dur_units) + b"\x00" * 80)
    tkhd_body = bytearray(b"\x00" * 84)
    tkhd_body[76:84] = struct.pack(">II", w << 16, h << 16)
    trak = box(b"trak", box(b"tkhd", bytes(tkhd_body)))
    return ftyp + box(b"moov", mvhd + trak)


def _mini_ogg_opus(granule=96000, pre_skip=312):
    import struct

    ident = b"OpusHead\x01\x02" + struct.pack("<H", pre_skip) + b"\x00" * 9
    page1 = (b"OggS\x00\x02" + struct.pack("<q", 0) + b"\x00" * 12
             + bytes([1, len(ident)]) + ident)
    page2 = (b"OggS\x00\x04" + struct.pack("<q", granule) + b"\x00" * 12
             + bytes([1, 1]) + b"\x00")
    return page1 + page2


def test_mp4_and_ogg_probes(spark):
    from rrdtool_1_x_spark.datapipe.multimodal import MEDIA_SCHEMA, probe_media

    mp4 = _mini_mp4()
    assert C.is_mp4(mp4) and C.sniff(mp4) is None
    assert C.probe_mp4(mp4) == (9000, 1000, 640, 360)

    ogg = _mini_ogg_opus()
    assert C.is_ogg(ogg)
    codec, rate, ch, dur = C.probe_ogg(ogg)
    assert (codec, rate, ch) == ("opus", 48000, 2)
    assert dur == (96000 - 312) * 1000 // 48000

    rows = [
        (1, "video", bytearray(mp4), (None, None, None, None, None)),
        (2, "audio", bytearray(ogg), (None, None, None, None, None)),
    ]
    p = {r.doc_id: r for r in
         probe_media(spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()}
    assert (p[1].mime, p[1].width, p[1].height, p[1].duration_ms) == (
        "video/mp4", 640, 360, 9000,
    )
    assert p[2].mime == "audio/ogg; codecs=opus"
    assert p[2].sample_rate == 48000


def test_webp_probe():
    import struct

    def riff(chunks):
        body = b"WEBP" + b"".join(
            cid + struct.pack("<I", len(b)) + b + (b"\x00" if len(b) & 1 else b"")
            for cid, b in chunks
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    # VP8L: signature + packed 14-bit dims (w-1=99, h-1=49)
    bits = 99 | (49 << 14)
    vp8l = riff([(b"VP8L", bytes([0x2F]) + struct.pack("<I", bits))])
    assert C.probe_webp(vp8l) == (100, 50, "vp8l")
    # VP8 lossy: frame tag + start code + dims
    vp8 = riff([(b"VP8 ", b"\x00\x00\x00\x9d\x01\x2a"
                 + struct.pack("<HH", 320, 240))])
    assert C.probe_webp(vp8) == (320, 240, "vp8")
    # VP8X extended: 24-bit canvas minus one
    vp8x = riff([(b"VP8X", b"\x00\x00\x00\x00"
                  + (639).to_bytes(3, "little") + (479).to_bytes(3, "little"))])
    assert C.probe_webp(vp8x) == (640, 480, "vp8x")
    assert C.is_webp(vp8l) and not C.is_webp(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError):
        C.probe_webp(riff([(b"ALPH", b"\x00")]))


def test_image_ahash_format_invariant(spark):
    """The perceptual hash depends on pixels, not encoding: the same
    image through PNG/BMP/GIF/TIFF yields one identical ahash, and a
    lightly-noised copy stays hamming-close while a different image is
    hamming-far."""
    from rrdtool_1_x_spark.datapipe.multimodal import MEDIA_SCHEMA, image_ahash

    rng = np.random.default_rng(40)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    noisy = np.clip(img.astype(int) + rng.integers(-6, 7, img.shape), 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    rows = [
        (1, "png", bytearray(C.encode_png(img)), (None,) * 5),
        (2, "bmp", bytearray(C.encode_bmp(img)), (None,) * 5),
        (3, "gif", bytearray(G.encode_gif(img)), (None,) * 5),
        (4, "tiff", bytearray(C.encode_tiff(img)), (None,) * 5),
        (5, "noisy", bytearray(C.encode_png(noisy)), (None,) * 5),
        (6, "other", bytearray(C.encode_png(other)), (None,) * 5),
        (7, "text", bytearray(b"not an image"), (None,) * 5),
    ]
    out = {r.doc_id: r.ahash for r in
           image_ahash(spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()}
    assert out[1] == out[2] == out[3] == out[4]
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(out[1], out[5]) <= 12
    assert ham(out[1], out[6]) >= 16
    assert out[7] is None  # non-image: NULL hash, lenient mode


def test_image_phash_robust_to_jpeg_reencode(spark):
    """pHash must survive what breaks byte equality: lossy JPEG q85
    re-encode and a global brightness shift stay hamming-close to the
    original; an unrelated image stays far. (aHash-style mean hashing is
    gated; pHash is the robustness tier above it.)"""
    from rrdtool_1_x_spark.datapipe.multimodal import MEDIA_SCHEMA, image_phash

    rng = np.random.default_rng(50)
    # smooth structured image (random noise has no stable low-freq rank)
    yy, xx = np.mgrid[0:64, 0:64]
    img = (128 + 60 * np.sin(yy / 7.0) * np.cos(xx / 9.0)
           + 40 * np.sin((xx + yy) / 11.0)).clip(0, 255).astype(np.uint8)
    bright = np.clip(img.astype(int) + 25, 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    rows = [
        (1, "orig", bytearray(C.encode_png(img)), (None,) * 5),
        (2, "jpeg85", bytearray(J.encode_jpeg(img, quality=85)), (None,) * 5),
        (3, "bright", bytearray(C.encode_png(bright)), (None,) * 5),
        (4, "other", bytearray(C.encode_png(other)), (None,) * 5),
    ]
    out = {r.doc_id: r.phash for r in
           image_phash(spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(out[1], out[2]) <= 8   # survives lossy re-encode
    assert ham(out[1], out[3]) <= 6   # survives brightness shift
    assert ham(out[1], out[4]) >= 16  # unrelated image is far


def test_audio_fingerprint_volume_invariant(spark):
    """The spectral fingerprint keys on energy deltas: half-volume and
    FLAC-reencoded copies match the original exactly; a different
    recording is hamming-far; non-audio yields NULL."""
    from rrdtool_1_x_spark.datapipe import flac as FL
    from rrdtool_1_x_spark.datapipe.multimodal import (
        MEDIA_SCHEMA,
        audio_fingerprint,
    )

    t = np.arange(8000)
    sig = (np.sin(t / 8.0) * np.exp(-t / 6000) + 0.3 * np.sin(t / 3.0)) * 0.6
    other = np.sin(t / 23.0) * np.cos(t / 5.0) * 0.6
    ints = np.round(sig * 20000).astype(np.int64)
    rows = [
        (1, "wav", bytearray(C.encode_wav(sig, 8000, 16)), (None,) * 5),
        (2, "half", bytearray(C.encode_wav(sig * 0.5, 8000, 16)), (None,) * 5),
        (3, "flac", bytearray(FL.encode_flac(ints, 8000, 16)), (None,) * 5),
        (4, "other", bytearray(C.encode_wav(other, 8000, 16)), (None,) * 5),
        (5, "text", bytearray(b"not audio"), (None,) * 5),
    ]
    out = {r.doc_id: r.afp for r in
           audio_fingerprint(spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert out[1] == out[2]          # volume invariant
    assert ham(out[1], out[3]) <= 2  # lossless re-encode (int quantization)
    assert ham(out[1], out[4]) >= 10
    assert out[5] is None
