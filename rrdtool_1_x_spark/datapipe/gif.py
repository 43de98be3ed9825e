"""GIF87a/89a codec in pure stdlib + numpy (GIF's LZW variant included).

Implements the published GIF89a specification: logical screen descriptor,
global/local color tables, interlacing, the variable-code-width LZW
scheme (LSB-first bit packing, clear/end codes, 12-bit cap), graphic
control extensions (delay, transparency, disposal methods 0-3), and the
NETSCAPE looping extension. Animated GIF is the one multi-frame container
a data pipeline can decode with zero third-party code, so it doubles as
the real "video" fixture format for frame-sampling operators.

Decoded output convention: a single frame is (h, w, 3) uint8 RGB over the
full logical screen (frames composited per disposal semantics);
``decode_gif_frames`` returns every composited frame plus per-frame
delays in centiseconds.

Encoding is lossless for paletted content: ``encode_gif`` takes index
arrays + a palette (default 256-level gray ramp), so gray fixtures
round-trip bit-exactly — the property the oracle gates use.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def is_gif(data: bytes) -> bool:
    return data is not None and len(data) >= 6 and bytes(data[:6]) in GIF_MAGICS


# ---------------------------------------------------------------------------
# LZW (GIF variant)
# ---------------------------------------------------------------------------


def lzw_decode(data: bytes, min_code_size: int) -> bytearray:
    """GIF LZW: variable code width starting at min_code_size+1, LSB-first
    packing, CLEAR resets the dictionary, codes capped at 12 bits."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # dictionary as list of bytes
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    prev = None
    buf = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < code_size:
            if pos >= n:
                return out  # truncated stream: emit what we have
            buf |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = buf & ((1 << code_size) - 1)
        buf >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            # first code after (re)init must be a literal root, never a
            # dummy slot or out-of-range index
            if code >= clear:
                raise ValueError("GIF: corrupt LZW stream")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF: corrupt LZW stream")
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    return out


def lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF LZW encoder mirroring lzw_decode's growth schedule."""
    clear = 1 << min_code_size
    end = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    out = bytearray()
    buf = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for byte in bytes(data):
        c = bytes([byte])
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code < 4096:
            table[wc] = next_code
            # decoder grows width when its table hits 1<<code_size; its
            # table size == next_code here, so grow on the same boundary
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = c
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


def _sub_blocks(payload: bytes) -> bytes:
    """Split a payload into <=255-byte length-prefixed sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while pos < len(data):
        n = data[pos]
        pos += 1
        if n == 0:
            break
        out += data[pos : pos + n]
        pos += n
    return bytes(out), pos


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = np.empty_like(rows)
    out[np.array(order)] = rows
    return out


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_gif_frames(data: bytes) -> tuple[np.ndarray, list[int]]:
    """GIF bytes -> (frames (n, h, w, 3) uint8 RGB, delays in centisec).

    Frames are composited onto the logical screen honoring transparency
    and disposal methods (none/keep/restore-background/restore-previous).
    """
    if not is_gif(data):
        raise ValueError("not a GIF stream")
    data = bytes(data)
    w, h = struct.unpack("<HH", data[6:10])
    flags = data[10]
    bg_index = data[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n

    if gct is not None and bg_index < len(gct):
        background = gct[bg_index].astype(np.uint8)
    else:
        background = np.zeros(3, dtype=np.uint8)
    canvas = np.ones((h, w, 3), dtype=np.uint8) * background

    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent = None
    disposal = 0
    delay = 0

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            body, pos = _read_sub_blocks(data, pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                packed = body[0]
                delay = struct.unpack("<H", body[1:3])[0]
                transparent = body[3] if packed & 1 else None
                disposal = (packed >> 2) & 7
            continue
        if block != 0x2C:  # image descriptor
            raise ValueError(f"GIF: unexpected block 0x{block:02x}")
        il, it, iw, ih = struct.unpack("<HHHH", data[pos : pos + 8])
        iflags = data[pos + 8]
        pos += 9
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 7)
            lct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
            pos += 3 * n
        else:
            lct = gct
        if lct is None:
            raise ValueError("GIF: no color table")
        min_code = data[pos]
        pos += 1
        lzw, pos = _read_sub_blocks(data, pos)
        idx = np.frombuffer(bytes(lzw_decode(lzw, min_code)), dtype=np.uint8)
        if len(idx) < iw * ih:
            raise ValueError("GIF: short image data")
        idx = idx[: iw * ih].reshape(ih, iw)
        if iflags & 0x40:
            idx = _deinterlace(idx)

        saved = canvas[it : it + ih, il : il + iw].copy() if disposal == 3 else None
        rect = lct[np.minimum(idx, len(lct) - 1)]
        if transparent is not None:
            mask = (idx != transparent)[:, :, None]
            region = canvas[it : it + ih, il : il + iw]
            rect = np.where(mask, rect, region)
        canvas[it : it + ih, il : il + iw] = rect
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:  # restore to background
            canvas[it : it + ih, il : il + iw] = background
        elif disposal == 3 and saved is not None:
            canvas[it : it + ih, il : il + iw] = saved
        transparent = None
        disposal = 0
        delay = 0

    if not frames:
        raise ValueError("GIF: no image data")
    return np.stack(frames), delays


def decode_gif(data: bytes) -> np.ndarray:
    """First composited frame as (h, w, 3) uint8 RGB."""
    frames, _ = decode_gif_frames(data)
    return frames[0]


def decode_gif_index_frames(data: bytes) -> tuple[np.ndarray, np.ndarray, list[int]]:
    """Decode to palette-index space: (frames (n, h, w) uint8 indices into
    the global color table, palette (m, 3), delays in centisec).

    Index-level frames are what a lossless frame sampler re-encodes.
    Raises NotImplementedError for local color tables (indices would be
    ambiguous across frames); transparency keeps the previous index.
    """
    if not is_gif(data):
        raise ValueError("not a GIF stream")
    data = bytes(data)
    w, h = struct.unpack("<HH", data[6:10])
    flags = data[10]
    bg_index = data[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    if gct is None:
        raise NotImplementedError("GIF: index decode requires a global color table")
    canvas = np.full((h, w), bg_index, dtype=np.uint8)
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent = None
    disposal = 0
    delay = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            label = data[pos]
            pos += 1
            body, pos = _read_sub_blocks(data, pos)
            if label == 0xF9 and len(body) >= 4:
                packed = body[0]
                delay = struct.unpack("<H", body[1:3])[0]
                transparent = body[3] if packed & 1 else None
                disposal = (packed >> 2) & 7
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{block:02x}")
        il, it, iw, ih = struct.unpack("<HHHH", data[pos : pos + 8])
        iflags = data[pos + 8]
        pos += 9
        if iflags & 0x80:
            raise NotImplementedError("GIF: local color table in index decode")
        min_code = data[pos]
        pos += 1
        lzw, pos = _read_sub_blocks(data, pos)
        idx = np.frombuffer(bytes(lzw_decode(lzw, min_code)), dtype=np.uint8)
        idx = idx[: iw * ih].reshape(ih, iw)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        saved = canvas[it : it + ih, il : il + iw].copy() if disposal == 3 else None
        region = canvas[it : it + ih, il : il + iw]
        if transparent is not None:
            region[...] = np.where(idx != transparent, idx, region)
        else:
            region[...] = idx
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:
            canvas[it : it + ih, il : il + iw] = bg_index
        elif disposal == 3 and saved is not None:
            canvas[it : it + ih, il : il + iw] = saved
        transparent = None
        disposal = 0
        delay = 0
    if not frames:
        raise ValueError("GIF: no image data")
    return np.stack(frames), gct.copy(), delays


def resample_gif(data: bytes, every_n: int) -> bytes:
    """Keep every Nth frame of an animated GIF, losslessly (index-level
    re-encode against the same global palette; delays of dropped frames
    are folded into the kept predecessor)."""
    frames, palette, delays = decode_gif_index_frames(data)
    kept = frames[::every_n]
    kept_delays: list[int] = []
    for i in range(0, len(frames), every_n):
        kept_delays.append(sum(delays[i : i + every_n]))
    return encode_gif(list(kept), palette=palette, delays=kept_delays)


def probe_gif(data: bytes) -> tuple[int, int, int, int]:
    """Header-only walk: (width, height, n_frames, total_delay_cs).
    Skips LZW sub-blocks without decoding them."""
    if not is_gif(data):
        raise ValueError("not a GIF stream")
    data = bytes(data)
    w, h = struct.unpack("<HH", data[6:10])
    flags = data[10]
    pos = 13
    if flags & 0x80:
        pos += 3 * (2 << (flags & 7))
    n_frames = 0
    total_delay = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            label = data[pos]
            pos += 1
            body, pos = _read_sub_blocks(data, pos)
            if label == 0xF9 and len(body) >= 3:
                total_delay += struct.unpack("<H", body[1:3])[0]
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{block:02x}")
        iflags = data[pos + 8]
        pos += 9
        if iflags & 0x80:
            pos += 3 * (2 << (iflags & 7))
        pos += 1  # LZW min code size
        _, pos = _read_sub_blocks(data, pos)
        n_frames += 1
    return w, h, n_frames, total_delay


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def gray_palette() -> np.ndarray:
    g = np.arange(256, dtype=np.uint8)
    return np.stack([g, g, g], axis=1)


def encode_gif(
    frames: np.ndarray | list[np.ndarray],
    palette: np.ndarray | None = None,
    delays: list[int] | int = 10,
    loop: int = 0,
) -> bytes:
    """Index frames + palette -> GIF bytes (one frame: plain GIF89a; more:
    animation with per-frame delays and a NETSCAPE loop extension).

    ``frames``: (h, w) uint8 index array or list/array of them (all same
    shape, full logical screen). ``palette``: (n<=256, 3) uint8 RGB;
    default 256-gray ramp, making gray content a lossless round trip.
    """
    if isinstance(frames, np.ndarray) and frames.ndim == 2:
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape
    if palette is None:
        palette = gray_palette()
    palette = np.asarray(palette, dtype=np.uint8)
    ncol = len(palette)
    # color table size: power of two >= ncol, min 2
    bits = max(1, (ncol - 1).bit_length())
    full = np.zeros((1 << bits, 3), dtype=np.uint8)
    full[:ncol] = palette
    if isinstance(delays, int):
        delays = [delays] * len(frames)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0])  # GCT flag+sizes, bg 0
    out += full.tobytes()
    if len(frames) > 1:
        # NETSCAPE2.0 looping extension
        out += b"\x21\xff\x0bNETSCAPE2.0"
        out += _sub_blocks(b"\x01" + struct.pack("<H", loop))
    min_code = max(2, bits)
    for frame, delay in zip(frames, delays):
        if len(frames) > 1:
            gce = bytes([0]) + struct.pack("<H", delay) + bytes([0])
            out += b"\x21\xf9" + _sub_blocks(gce)
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([0])
        out += bytes([min_code])
        out += _sub_blocks(lzw_encode(frame.tobytes(), min_code))
    out += b"\x3b"
    return bytes(out)
