"""Baseline JPEG codec (ITU-T T.81) in pure stdlib + numpy.

No image library exists in the target container, so baseline sequential
JPEG is implemented from the published spec:

* Decoder: marker segment walk (SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOS/EOI),
  canonical Huffman decode (T.81 F.2.2 mincode/maxcode/valptr), byte
  un-stuffing and restart-marker resync, run-length/zigzag AC expansion,
  dequantization, batched orthonormal 8x8 IDCT (one einsum per component,
  not per block), nearest-neighbor chroma upsampling for any (h,v)
  sampling factors, JFIF YCbCr->RGB.
* Encoder: quality-scaled quantization (IJG 5000/q | 200-2q scaling of
  the Annex K example luma/chroma base tables), 4:4:4 or 4:2:0
  subsampling, batched FDCT, canonical Huffman encode with fixed-length
  code tables **embedded in DHT** (JPEG files carry their tables, so any
  prefix-valid table set yields a spec-conformant stream — we use 4-bit
  DC / 8-bit AC codes rather than the Annex K defaults for simplicity),
  optional restart intervals, byte stuffing.

Exactness property used by the oracle gates: at quality=100 every
quantizer is 1, so an image whose every 8x8 block is constant has only an
integer DC coefficient — the decode reproduces the input bit-exactly,
including through the 4:2:0 color path when R=G=B (chroma is exactly 128,
luma exactly v, both flat). That makes the full marker/Huffman/DCT/color
pipeline hash-gateable against SQL byte math despite JPEG being lossy in
general.

Decoded output convention (shared with datapipe.codecs): (h, w, channels)
uint8, channels 1 (grayscale stream) or 3 (RGB from YCbCr).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: ZIGZAG[k] = row-major index of the k-th coefficient
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1 example quantization tables (the de-facto base every encoder
# scales); public tables from the spec itself.
BASE_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
BASE_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)


def quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling: 1..100 -> (luma, chroma) tables in ROW-MAJOR
    order. quality=100 gives all-ones (lossless for block-flat content)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    luma = np.clip((BASE_QUANT_LUMA * scale + 50) // 100, 1, 255)
    chroma = np.clip((BASE_QUANT_CHROMA * scale + 50) // 100, 1, 255)
    return luma, chroma


_DCT = None


def _dct_matrix() -> np.ndarray:
    """Orthonormal DCT-II basis C with C[u, x] = c(u)/2 * cos((2x+1)u*pi/16);
    FDCT of a block f is C @ f @ C.T, IDCT of F is C.T @ F @ C."""
    global _DCT
    if _DCT is None:
        x = np.arange(8)
        u = np.arange(8)[:, None]
        C = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
        C[0] *= 1.0 / np.sqrt(2.0)
        _DCT = C
    return _DCT


def is_jpeg(data: bytes) -> bool:
    return data is not None and len(data) >= 3 and data[:3] == b"\xff\xd8\xff"


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------


class HuffDecoder:
    """Canonical Huffman decoder per T.81 F.2.2 (mincode/maxcode/valptr)."""

    def __init__(self, counts: list[int], symbols: bytes):
        # counts[i] = number of codes of length i+1 (16 entries)
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.symbols = symbols
        code = 0
        k = 0
        for length in range(1, 17):
            n = counts[length - 1]
            self.valptr[length] = k
            self.mincode[length] = code
            self.maxcode[length] = code + n - 1 if n else -1
            code = (code + n) << 1
            k += n

    def decode(self, br: "_BitReader") -> int:
        window = br.peek16()
        for length in range(1, 17):
            code = window >> (16 - length)
            mx = self.maxcode[length]
            if mx >= 0 and code <= mx:
                br.skip(length)
                return self.symbols[self.valptr[length] + code - self.mincode[length]]
        raise ValueError("JPEG: invalid Huffman code")


def build_canonical(counts: list[int], symbols: bytes) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for the encoder side."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# Encoder tables: every possible symbol gets a fixed-length code (prefix
# trees trivially valid: 12 DC codes of length 4 of 16 slots; 162 AC codes
# of length 8 of 256 slots). The tables ship inside DHT, so the stream is
# fully standard-decodable.
ENC_DC_COUNTS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
ENC_DC_SYMBOLS = bytes(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
ENC_AC_COUNTS = [0, 0, 0, 0, 0, 0, 0, len(_AC_SYMS), 0, 0, 0, 0, 0, 0, 0, 0]
ENC_AC_SYMBOLS = bytes(sorted(_AC_SYMS))


# ---------------------------------------------------------------------------
# Bit I/O over entropy-coded segments
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over an un-stuffed entropy segment. Reads past
    the end return 1-bits (T.81 padding). Multi-bit reads slice whole
    bytes instead of looping per bit."""

    def __init__(self, data: bytes):
        # two padding bytes so a 16-bit peek near the end stays in-bounds
        self.data = bytes(data) + b"\xff\xff\xff"
        self.nbits_real = len(data) * 8
        self.pos = 0  # bit position

    def peek16(self) -> int:
        b0 = self.pos >> 3
        word = int.from_bytes(self.data[b0 : b0 + 3], "big")
        return (word >> (8 - (self.pos & 7))) & 0xFFFF

    def skip(self, n: int) -> None:
        self.pos += n

    def read_bit(self) -> int:
        v = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return v

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        b0, b1 = self.pos >> 3, (end + 7) >> 3
        word = int.from_bytes(self.data[b0:b1], "big")
        self.pos = end
        return (word >> ((b1 << 3) - end)) & ((1 << n) - 1)


def _extend(v: int, n: int) -> int:
    """T.81 EXTEND: map an n-bit magnitude to its signed value."""
    if n == 0:
        return 0
    if v < (1 << (n - 1)):
        return v - (1 << n) + 1
    return v


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.buf &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # T.81 pads with 1-bits


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _segments(data: bytes):
    """Yield (marker, payload, scan_start) walking the marker structure;
    stops at SOS (payload = its header, scan_start = entropy data offset)."""
    pos = 2  # past SOI
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("JPEG: marker sync lost")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            return
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + length]
        if marker == 0xDA:  # SOS: entropy data follows
            yield marker, payload, pos + 2 + length
            return
        yield marker, payload, None
        pos += 2 + length


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w, 1) uint8 gray or (h, w, 3) uint8 RGB.

    Supports SOF0 (baseline sequential), 8-bit precision, any sampling
    factors, restart markers, multiple DQT/DHT segments. Progressive
    (SOF2) and arithmetic coding raise NotImplementedError.
    """
    if not is_jpeg(data):
        raise ValueError("not a JPEG stream")
    qtables: dict[int, np.ndarray] = {}  # id -> 64 values in zigzag order
    dc_tables: dict[int, HuffDecoder] = {}
    ac_tables: dict[int, HuffDecoder] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq), ...])
    restart_interval = 0
    scan = None

    for marker, payload, scan_start in _segments(data):
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            pos = 0
            while pos < len(payload):
                pq, tq = payload[pos] >> 4, payload[pos] & 15
                pos += 1
                if pq == 0:
                    qtables[tq] = np.frombuffer(
                        payload[pos : pos + 64], dtype=np.uint8
                    ).astype(np.int64)
                    pos += 64
                else:  # 16-bit table
                    qtables[tq] = np.frombuffer(
                        payload[pos : pos + 128], dtype=">u2"
                    ).astype(np.int64)
                    pos += 128
        elif marker == 0xC4:  # DHT
            pos = 0
            while pos < len(payload):
                tc, th = payload[pos] >> 4, payload[pos] & 15
                counts = list(payload[pos + 1 : pos + 17])
                nsym = sum(counts)
                syms = payload[pos + 17 : pos + 17 + nsym]
                table = HuffDecoder(counts, syms)
                (dc_tables if tc == 0 else ac_tables)[th] = table
                pos += 17 + nsym
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/SOF1 (both Huffman DCT)
            precision = payload[0]
            if precision != 8:
                raise NotImplementedError(f"JPEG: precision {precision}")
            h, w = struct.unpack(">HH", payload[1:5])
            ncomp = payload[5]
            comps = []
            for i in range(ncomp):
                cid = payload[6 + 3 * i]
                hv = payload[7 + 3 * i]
                tq = payload[8 + 3 * i]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("JPEG: only baseline sequential (SOF0/1)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            sel = []
            for i in range(ns):
                cs = payload[1 + 2 * i]
                t = payload[2 + 2 * i]
                sel.append((cs, t >> 4, t & 15))
            scan = (sel, scan_start)

    if frame is None or scan is None:
        raise ValueError("JPEG: missing SOF/SOS")
    h_img, w_img, comps = frame
    sel, scan_start = scan
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w_img // (8 * hmax))
    mcuy = -(-h_img // (8 * vmax))

    # split entropy data into restart intervals and un-stuff each
    end = len(data)
    # find EOI
    eoi = data.rfind(b"\xff\xd9")
    if eoi >= 0:
        end = eoi
    raw = data[scan_start:end]
    intervals = []
    start = 0
    i = 0
    while i + 1 < len(raw):
        if raw[i] == 0xFF and 0xD0 <= raw[i + 1] <= 0xD7:
            intervals.append(raw[start:i])
            start = i + 2
            i += 2
        else:
            i += 1
    intervals.append(raw[start:])
    intervals = [seg.replace(b"\xff\x00", b"\xff") for seg in intervals]

    by_id = {c[0]: c for c in comps}
    order = [by_id[cs] for cs, _, _ in sel]
    dsel = {cs: (td, ta) for cs, td, ta in sel}

    # per-component coefficient planes in block units
    planes = {
        cid: np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
        for cid, hs, vs, _ in comps
    }
    coeff_blocks: dict[int, list[tuple[int, int, np.ndarray]]] = {
        c[0]: [] for c in comps
    }

    mcu_per_interval = restart_interval if restart_interval else mcux * mcuy
    mcu_idx = 0
    interval_iter = iter(intervals)
    br = _BitReader(next(interval_iter))
    preds = {c[0]: 0 for c in comps}

    zig = ZIGZAG
    for my in range(mcuy):
        for mx in range(mcux):
            if mcu_idx and mcu_idx % mcu_per_interval == 0:
                try:
                    br = _BitReader(next(interval_iter))
                except StopIteration as exc:
                    raise ValueError("JPEG: truncated entropy data") from exc
                preds = {c[0]: 0 for c in comps}
            for cid, hs, vs, tq in order:
                td, ta = dsel[cid]
                dct = dc_tables[td]
                act = ac_tables[ta]
                qt = qtables[tq]
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, dtype=np.int64)
                        t = dct.decode(br)
                        diff = _extend(br.receive(t), t)
                        preds[cid] += diff
                        zz[0] = preds[cid]
                        k = 1
                        while k < 64:
                            rs = act.decode(br)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG: AC index overflow")
                            zz[k] = _extend(br.receive(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[zig] = (zz * qt).astype(np.float64)
                        coeff_blocks[cid].append(
                            (my * vs + by, mx * hs + bx, block.reshape(8, 8))
                        )
            mcu_idx += 1

    # batched IDCT per component
    C = _dct_matrix()
    for cid, hs, vs, tq in comps:
        blocks = coeff_blocks[cid]
        if not blocks:
            continue
        F_all = np.stack([b[2] for b in blocks])  # (n, 8, 8)
        f_all = np.matmul(np.matmul(C.T, F_all), C)  # batched IDCT
        f_all = np.clip(np.round(f_all + 128.0), 0, 255)
        plane = planes[cid]
        for (byy, bxx, _), sp in zip(blocks, f_all):
            plane[byy * 8 : byy * 8 + 8, bxx * 8 : bxx * 8 + 8] = sp

    # upsample and crop
    out_planes = []
    for cid, hs, vs, tq in comps:
        p = planes[cid]
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h_img, :w_img])

    if len(out_planes) == 1:
        return out_planes[0].astype(np.uint8)[:, :, None]
    if len(out_planes) != 3:
        raise NotImplementedError(f"JPEG: {len(out_planes)}-component scan")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_component_block(
    bw: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    dc = int(zz[0])
    diff = dc - pred
    t = _category(diff)
    code, length = dc_codes[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            bw.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]
        bw.write(code, length)
    return dc


def _pad_to(a: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate pad a 2-D plane so both dims are multiples."""
    h, w = a.shape
    ph = (-h) % mh
    pw = (-w) % mw
    if ph or pw:
        a = np.pad(a, ((0, ph), (0, pw)), mode="edge")
    return a


def _fdct_quant(plane: np.ndarray, qtab_rm: np.ndarray) -> np.ndarray:
    """Plane (H, W) float -> zigzag-quantized int blocks (n, 64), raster
    block order."""
    C = _dct_matrix()
    H, W = plane.shape
    by, bx = H // 8, W // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    F_all = np.matmul(np.matmul(C, blocks - 128.0), C.T)  # batched FDCT
    q = np.round(F_all.reshape(-1, 64) / qtab_rm.astype(np.float64))
    zz = q[:, ZIGZAG]
    return zz.astype(np.int64)


def _dht_segment(tc: int, th: int, counts: list[int], symbols: bytes) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(counts) + symbols
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq: int, table_rm: np.ndarray) -> bytes:
    zz = table_rm[ZIGZAG].astype(np.uint8).tobytes()
    body = bytes([tq]) + zz
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w) / (h, w, 1) gray or (h, w, 3) RGB uint8 -> baseline JPEG.

    ``subsample``: "444" (no chroma subsampling) or "420" (2x2). Huffman
    tables are the fixed-length canonical sets above, embedded in DHT.
    ``restart_interval`` > 0 emits DRI + RSTn markers every N MCUs.
    """
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nchan = arr.shape
    if arr.dtype != np.uint8:
        raise ValueError("encode_jpeg: uint8 input required")
    if nchan not in (1, 3):
        raise ValueError("encode_jpeg: 1 or 3 channels")
    if subsample not in ("444", "420"):
        raise ValueError("encode_jpeg: subsample must be '444' or '420'")
    luma_q, chroma_q = quant_tables(quality)

    dc_codes = build_canonical(ENC_DC_COUNTS, ENC_DC_SYMBOLS)
    ac_codes = build_canonical(ENC_AC_COUNTS, ENC_AC_SYMBOLS)

    if nchan == 1:
        planes = [arr[:, :, 0].astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample == "420":
            # average 2x2 chroma neighborhoods (pad to even first)
            cbp = _pad_to(cb, 2, 2)
            crp = _pad_to(cr, 2, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # quantized zigzag blocks per component, plus block-grid dims
    comp_blocks = []
    for p, (hs, vs), qs in zip(planes, samp, qsel):
        th, tw = mcuy * vs * 8, mcux * hs * 8  # MCU-aligned plane dims
        padded = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        )
        qt = luma_q if qs == 0 else chroma_q
        zz = _fdct_quant(padded, qt)
        comp_blocks.append((zz, hs, vs, tw // 8))

    bw = _BitWriter()
    preds = [0] * len(planes)
    chunks: list[bytes] = []
    mcu_idx = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                bw.flush()
                chunks.append(bytes(bw.out))
                chunks.append(bytes([0xFF, 0xD0 + (rst & 7)]))
                rst += 1
                bw = _BitWriter()
                preds = [0] * len(planes)
            for ci, (zz, hs, vs, bw_blocks) in enumerate(comp_blocks):
                for by in range(vs):
                    for bx in range(hs):
                        bidx = (my * vs + by) * bw_blocks + (mx * hs + bx)
                        preds[ci] = _encode_component_block(
                            bw, zz[bidx], preds[ci], dc_codes, ac_codes
                        )
            mcu_idx += 1
    bw.flush()
    chunks.append(bytes(bw.out))
    entropy = b"".join(chunks)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(jfif) + 2) + jfif
    out += _dqt_segment(0, luma_q)
    if nchan == 3:
        out += _dqt_segment(1, chroma_q)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sof = bytearray(struct.pack(">BHHB", 8, h, w, nchan))
    for i, (hs, vs) in enumerate(samp):
        sof += bytes([i + 1, (hs << 4) | vs, qsel[i]])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + bytes(sof)
    out += _dht_segment(0, 0, ENC_DC_COUNTS, ENC_DC_SYMBOLS)
    out += _dht_segment(1, 0, ENC_AC_COUNTS, ENC_AC_SYMBOLS)
    if nchan == 3:
        out += _dht_segment(0, 1, ENC_DC_COUNTS, ENC_DC_SYMBOLS)
        out += _dht_segment(1, 1, ENC_AC_COUNTS, ENC_AC_SYMBOLS)
    sos = bytearray([nchan])
    for i in range(nchan):
        tsel = 0x00 if i == 0 else 0x11  # luma: DC0/AC0, chroma: DC1/AC1
        sos += bytes([i + 1, tsel])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + bytes(sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)
