"""FLAC codec in pure stdlib + numpy (decoder: full subset for native
FLAC; encoder: verbatim/constant/fixed-predictor, enough to build
bit-exact lossless fixtures).

Implemented from the published FLAC format specification (now RFC 9639):

* Stream: ``fLaC`` magic, metadata blocks (STREAMINFO parsed; others
  skipped), frame sequence.
* Frame header: sync + blocking strategy, block-size/sample-rate codes
  (incl. end-of-header 8/16-bit forms), channel assignment (independent,
  left/side, right/side, mid/side), bit-depth codes, UTF-8-style coded
  frame/sample number, CRC-8 (poly 0x07) verified.
* Subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (signed warm-up samples, quantized coefficients, arithmetic shift),
  wasted-bits unary prefix.
* Residual: partitioned Rice coding, 4-bit (method 0) and 5-bit
  (method 1) parameters, escape code for raw-binary partitions.
* Frame footer CRC-16 (poly 0x8005) verified.

The decoder is vectorized where the format allows (Rice unary runs are
located with numpy over the unpacked bit array; fixed-order prediction
uses cumulative sums; LPC remains an order-bounded python loop per
frame). Audio decodes to the shared convention: (frames, channels)
float64 in [-1, 1), plus the sample rate.

The encoder emits spec-conformant streams: per-block choice of CONSTANT
(all-equal), FIXED order 0-2 with partitioned-Rice residuals, or
VERBATIM fallback — losslessness is exact by construction, which is what
the oracle gates rely on.
"""

from __future__ import annotations

import struct

import numpy as np

FLAC_MAGIC = b"fLaC"


def is_flac(data: bytes) -> bool:
    return data is not None and len(data) >= 4 and bytes(data[:4]) == FLAC_MAGIC


# ---------------------------------------------------------------------------
# CRCs (FLAC polynomials)
# ---------------------------------------------------------------------------


def _crc_table(poly: int, width: int) -> np.ndarray:
    table = np.zeros(256, dtype=np.uint32)
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    for i in range(256):
        crc = i << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table[i] = crc & mask
    return table


_CRC8_TAB = _crc_table(0x07, 8)
_CRC16_TAB = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = int(_CRC8_TAB[(crc ^ b) & 0xFF])
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = int(_CRC16_TAB[((crc >> 8) ^ b) & 0xFF]) ^ ((crc << 8) & 0xFFFF)
    return crc


# ---------------------------------------------------------------------------
# Bit I/O (MSB-first)
# ---------------------------------------------------------------------------


class _Bits:
    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.nbits = len(data) * 8
        # positions of all one-bits, for O(log n) unary decoding
        self.ones = np.flatnonzero(
            np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        )
        self.pos = pos_bits

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > self.nbits:
            raise ValueError("FLAC: bitstream exhausted")
        b0, b1 = self.pos >> 3, (end + 7) >> 3
        word = int.from_bytes(self.data[b0:b1], "big")
        self.pos = end
        return (word >> ((b1 << 3) - end)) & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        if v >= 1 << (n - 1):
            v -= 1 << n
        return v

    def read_unary(self) -> int:
        """Count zero bits up to the terminating one bit."""
        idx = int(np.searchsorted(self.ones, self.pos))
        if idx >= len(self.ones):
            raise ValueError("FLAC: unary run past end of stream")
        one = int(self.ones[idx])
        q = one - self.pos
        self.pos = one + 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos // 8


def _read_utf8_number(br: _Bits) -> int:
    """FLAC's UTF-8-style variable-length number (up to 36 bits)."""
    first = br.read(8)
    if first < 0x80:
        return first
    n = 0
    probe = first
    while probe & 0x40:
        n += 1
        probe <<= 1
    if n == 0:
        raise ValueError("FLAC: invalid UTF-8 coded number")
    v = first & (0x3F >> n)
    for _ in range(n):
        cont = br.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("FLAC: invalid UTF-8 continuation")
        v = (v << 6) | (cont & 0x3F)
    return v


def _write_utf8_number(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    out = []
    nbytes = 2
    while v >= (1 << (6 * (nbytes - 1) + (7 - nbytes))):
        nbytes += 1
    lead_bits = 7 - nbytes
    out.append((0xFF << (lead_bits + 1) & 0xFF) | (v >> (6 * (nbytes - 1))))
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((v >> (6 * i)) & 0x3F))
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

_BLOCKSIZE_CODES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384, 15: 32768,
}
_SAMPLE_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050, 7: 24000,
    8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_BITDEPTH_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

def _decode_residual(br: _Bits, block_size: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = br.read(4)
    nparts = 1 << porder
    out = np.empty(block_size - order, dtype=np.int64)
    idx = 0
    for p in range(nparts):
        n = (block_size >> porder) - (order if p == 0 else 0)
        param = br.read(plen)
        if param == escape:
            raw_bits = br.read(5)
            for i in range(n):
                out[idx + i] = br.read_signed(raw_bits) if raw_bits else 0
        else:
            for i in range(n):
                q = br.read_unary()
                r = br.read(param) if param else 0
                zz = (q << param) | r
                out[idx + i] = (zz >> 1) ^ -(zz & 1)  # zigzag → signed
        idx += n
    return out


def _decode_subframe(br: _Bits, block_size: int, bits_per_sample: int) -> np.ndarray:
    if br.read(1) != 0:
        raise ValueError("FLAC: subframe sync bit set")
    sftype = br.read(6)
    wasted = 0
    if br.read(1):  # wasted-bits flag: unary count-1 follows
        wasted = br.read_unary() + 1
    eff_bits = bits_per_sample - wasted
    if sftype == 0:  # CONSTANT
        v = br.read_signed(eff_bits)
        samples = np.full(block_size, v, dtype=np.int64)
    elif sftype == 1:  # VERBATIM
        samples = np.array(
            [br.read_signed(eff_bits) for _ in range(block_size)], dtype=np.int64
        )
    elif 8 <= sftype <= 12:  # FIXED, order 0-4
        order = sftype - 8
        warm = [br.read_signed(eff_bits) for _ in range(order)]
        resid = _decode_residual(br, block_size, order)
        if order == 0:
            samples = resid
        else:
            # the fixed predictor of order k is the k-th finite
            # difference, so decoding is k cumulative sums seeded by the
            # successive differences of the warm-up samples — vectorized,
            # no per-sample loop
            seeds = [warm[0]]
            d = np.array(warm, dtype=np.int64)
            for _ in range(1, order):
                d = np.diff(d)
                seeds.append(int(d[0]))
            cur = resid
            for j in range(order - 1, -1, -1):
                cur = np.cumsum(np.concatenate([[seeds[j]], cur]))
            samples = cur
    elif sftype >= 32:  # LPC, order 1-32
        order = sftype - 31
        warm = [br.read_signed(eff_bits) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC: invalid LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coeffs = [br.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(br, block_size, order)
        samples = np.empty(block_size, dtype=np.int64)
        samples[:order] = warm
        for i in range(order, block_size):
            pred = 0
            for j, c in enumerate(coeffs):
                pred += c * int(samples[i - 1 - j])
            samples[i] = resid[i - order] + (pred >> shift)
    else:
        raise ValueError(f"FLAC: reserved subframe type {sftype}")
    return samples << wasted


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → ((frames, channels) float64 in [-1, 1), sample_rate)."""
    if not is_flac(data):
        raise ValueError("not a FLAC stream")
    data = bytes(data)
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("FLAC: truncated metadata")
        hdr = data[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\0" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            sr_ch_bits = int.from_bytes(body[10:14], "big")
            sample_rate = sr_ch_bits >> 12
            channels = ((sr_ch_bits >> 9) & 0x7) + 1
            bits = ((sr_ch_bits >> 4) & 0x1F) + 1
            total = ((sr_ch_bits & 0xF) << 32) | int.from_bytes(body[14:18], "big")
            info = (sample_rate, channels, bits, total)
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("FLAC: missing STREAMINFO")
    sample_rate, channels, bits, total = info

    chunks = []
    while pos < len(data) - 1:
        frame_start = pos
        br = _Bits(data, pos * 8)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("FLAC: lost frame sync")
        if br.read(1) != 0:
            raise ValueError("FLAC: reserved frame bit")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        bd_code = br.read(3)
        if br.read(1) != 0:
            raise ValueError("FLAC: reserved frame bit")
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("FLAC: reserved block size code")
        elif bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        else:
            block_size = _BLOCKSIZE_CODES[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("FLAC: invalid sample rate code")
        frame_bits = bits if bd_code == 0 else _BITDEPTH_CODES[bd_code]
        hdr_end = (br.pos + 7) // 8
        if crc8(data[frame_start:hdr_end]) != br.read(8):
            raise ValueError("FLAC: frame header CRC mismatch")

        if ch_code < 8:
            nch = ch_code + 1
            subs = [
                _decode_subframe(br, block_size, frame_bits) for _ in range(nch)
            ]
            block = np.stack(subs, axis=1)
        elif ch_code in (8, 9, 10):  # stereo decorrelation: side gets +1 bit
            extra0 = 1 if ch_code == 9 else 0  # right/side: first is side
            extra1 = 1 if ch_code in (8, 10) else 0
            a = _decode_subframe(br, block_size, frame_bits + extra0)
            b = _decode_subframe(br, block_size, frame_bits + extra1)
            if ch_code == 8:  # left/side: L, S=L-R
                left, right = a, a - b
            elif ch_code == 9:  # right/side: S=L-R, R
                left, right = a + b, b
            else:  # mid/side
                mid, side = a, b
                left = mid + ((side + (side & 1)) >> 1)
                right = left - side
            block = np.stack([left, right], axis=1)
            nch = 2
        else:
            raise ValueError("FLAC: reserved channel assignment")
        if nch != channels:
            raise ValueError("FLAC: frame channel count != STREAMINFO")
        br.align()
        fcrc = br.read(16)
        if crc16(data[frame_start : br.byte_pos() - 2]) != fcrc:
            raise ValueError("FLAC: frame CRC-16 mismatch")
        pos = br.byte_pos()
        chunks.append(block)

    samples = np.concatenate(chunks, axis=0) if chunks else np.zeros((0, channels))
    if total:
        samples = samples[:total]
    return samples.astype(np.float64) / float(1 << (bits - 1)), sample_rate


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class _BitW:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write(self, v: int, nbits: int) -> None:
        v &= (1 << nbits) - 1 if nbits else 0
        self.buf = (self.buf << nbits) | v
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.buf >> self.n) & 0xFF)
        self.buf &= (1 << self.n) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


def _encode_residual(
    bw: _BitW, resid: np.ndarray, block_size: int, order: int, max_porder: int = 4
) -> None:
    """Partitioned Rice coding; the partition order is chosen by exact bit
    cost (each partition gets its own optimal 4-bit parameter). The whole
    (parameter x partition x order) search is one shift matrix plus one
    ``np.add.reduceat`` per order — no per-partition python sums."""
    zz = ((resid << 1) ^ (resid >> 63)).astype(np.uint64)  # signed → zigzag
    # shifted[p, i] = zz[i] >> p: the unary cost of sample i at parameter p
    shifted = (zz[None, :] >> np.arange(15, dtype=np.uint64)[:, None]).astype(
        np.int64
    )
    best = None  # (cost, porder, params)
    porder = 0
    while porder <= max_porder:
        nparts = 1 << porder
        seg = block_size >> porder
        if block_size % nparts or seg <= order:
            break
        starts = np.maximum(np.arange(nparts) * seg - order, 0)
        sums = np.add.reduceat(shifted, starts, axis=1)  # (15, nparts)
        lens = np.full(nparts, seg)
        lens[0] = seg - order
        costs = sums + np.arange(1, 16)[:, None] * lens[None, :]
        pidx = np.argmin(costs, axis=0)  # best parameter per partition
        cost = int(costs[pidx, np.arange(nparts)].sum()) + 4 * nparts
        if best is None or cost < best[0]:
            best = (cost, porder, pidx.tolist())
        porder += 1
    _, porder, params = best
    bw.write(0, 2)  # method 0 (4-bit params)
    bw.write(porder, 4)
    idx = 0
    nparts = 1 << porder
    for p in range(nparts):
        n = (block_size >> porder) - (order if p == 0 else 0)
        param = params[p]
        bw.write(param, 4)
        for v in zz[idx : idx + n]:
            v = int(v)
            bw.write_unary(v >> param)
            if param:
                bw.write(v & ((1 << param) - 1), param)
        idx += n


def _lpc_coeffs(ch: np.ndarray, order: int, prec: int = 12):
    """Levinson-Durbin over the block autocorrelation, quantized to
    ``prec``-bit integers with a common shift. Returns (coeffs, shift)
    or None when the signal is degenerate."""
    x = ch.astype(np.float64)
    n = len(x)
    if n <= order:
        return None
    ac = np.array([np.dot(x[: n - k], x[k:]) for k in range(order + 1)])
    if ac[0] == 0:
        return None
    err = ac[0]
    lpc = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1] - np.dot(lpc[:i], ac[i:0:-1][:i])
        k = acc / err
        lpc[: i + 1] = np.append(lpc[:i] - k * lpc[:i][::-1], 0)[: i + 1]
        lpc[i] = k
        err *= 1 - k * k
        if err <= 0:
            return None
    cmax = np.abs(lpc).max()
    if cmax == 0 or not np.isfinite(cmax):
        return None
    shift = min(14, max(1, prec - 1 - int(np.floor(np.log2(cmax))) - 1))
    q = np.clip(np.round(lpc * (1 << shift)), -(1 << (prec - 1)), (1 << (prec - 1)) - 1)
    return q.astype(np.int64), shift


def _lpc_residual(arr: np.ndarray, coeffs: np.ndarray, shift: int) -> np.ndarray:
    order = len(coeffs)
    n = len(arr)
    pred = np.zeros(n - order, dtype=np.int64)
    for j, c in enumerate(coeffs):
        pred += int(c) * arr[order - 1 - j : n - 1 - j]
    return arr[order:] - (pred >> shift)


def _encode_subframe(bw: _BitW, ch: np.ndarray, bits: int, mode: str) -> None:
    if mode == "constant":
        bw.write(0, 1)
        bw.write(0, 6)
        bw.write(0, 1)
        bw.write(int(ch[0]), bits)
        return
    if mode == "verbatim":
        bw.write(0, 1)
        bw.write(1, 6)
        bw.write(0, 1)
        for v in ch:
            bw.write(int(v), bits)
        return
    arr = ch.astype(np.int64)
    if mode == "lpc":
        order = min(8, len(ch) - 1)
        prec = 12
        est = _lpc_coeffs(arr, order, prec) if order >= 1 else None
        if est is not None:
            coeffs, shift = est
            bw.write(0, 1)
            bw.write(32 + order - 1, 6)
            bw.write(0, 1)
            for v in arr[:order]:
                bw.write(int(v), bits)
            bw.write(prec - 1, 4)
            bw.write(shift, 5)
            for c in coeffs:
                bw.write(int(c), prec)
            _encode_residual(bw, _lpc_residual(arr, coeffs, shift), len(arr), order)
            return
        # degenerate block: fall through to fixed
    # fixed order 2 (or lower when the block is shorter)
    order = min(2, len(ch) - 1) if len(ch) > 1 else 0
    bw.write(0, 1)
    bw.write(8 + order, 6)
    bw.write(0, 1)
    for v in ch[:order]:
        bw.write(int(v), bits)
    resid = arr.copy()
    for _ in range(order):
        resid = np.diff(resid)
    _encode_residual(bw, resid, len(arr), order)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 8000,
    bits: int = 16,
    block_size: int = 4096,
    mode: str = "fixed",
    stereo: str | None = None,
) -> bytes:
    """Integer samples (frames,) or (frames, channels) → FLAC bytes.

    ``mode``: "fixed" (order-2 fixed predictor + partitioned Rice,
    CONSTANT when a block is all-equal), "lpc" (order-8 Levinson-Durbin,
    quantized 12-bit coefficients), or "verbatim". ``stereo`` (2-channel
    input only): None = independent, or "left_side" / "right_side" /
    "mid_side" inter-channel decorrelation (side carries one extra bit).
    Lossless by construction for any input representable in ``bits``."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    nframes, channels = arr.shape
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    if arr.min() < lo or arr.max() > hi:
        raise ValueError(f"encode_flac: samples exceed {bits}-bit range")

    out = bytearray(FLAC_MAGIC)
    # STREAMINFO (34 bytes), marked last
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    packed = (sample_rate << 44) | ((channels - 1) << 41) | ((bits - 1) << 36) | nframes
    si += packed.to_bytes(8, "big")
    si += b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + bytes(si)

    if stereo is not None and channels != 2:
        raise ValueError("encode_flac: stereo decorrelation needs 2 channels")
    ch_codes = {None: channels - 1, "left_side": 8, "right_side": 9, "mid_side": 10}
    ch_assign = ch_codes[stereo]

    for fno, start in enumerate(range(0, nframes, block_size)):
        blk = arr[start : start + block_size]
        n = len(blk)
        bw = _BitW()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocksize strategy
        bw.write(7, 4)  # block size: 16-bit at end of header
        bw.write(0, 4)  # sample rate: from STREAMINFO
        bw.write(ch_assign, 4)
        bd_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bits]
        bw.write(bd_code, 3)
        bw.write(0, 1)
        for b in _write_utf8_number(fno):
            bw.write(b, 8)
        bw.write(n - 1, 16)
        hdr = bytes(bw.out)
        if bw.n:
            raise AssertionError("frame header must be byte-aligned here")
        bw.write(crc8(hdr), 8)
        if stereo is None:
            chans = [(blk[:, c], bits) for c in range(channels)]
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            if stereo == "left_side":
                chans = [(left, bits), (side, bits + 1)]
            elif stereo == "right_side":
                chans = [(side, bits + 1), (right, bits)]
            else:  # mid_side
                chans = [((left + right) >> 1, bits), (side, bits + 1)]
        for ch, chbits in chans:
            if mode == "verbatim":
                _encode_subframe(bw, ch, chbits, "verbatim")
            elif (ch == ch[0]).all():
                _encode_subframe(bw, ch, chbits, "constant")
            else:
                _encode_subframe(bw, ch, chbits, mode)
        bw.align()
        body = bytes(bw.out)
        bw.write(crc16(body), 16)
        out += bytes(bw.out)
    return bytes(out)
