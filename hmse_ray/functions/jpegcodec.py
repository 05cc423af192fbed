"""Real baseline JPEG (JFIF) codec in pure numpy — fmt "jfif".

Spec-compliant ITU-T T.81 baseline sequential DCT, 8-bit, 4:4:4 (no
chroma subsampling): SOI / APP0(JFIF) / DQT x2 / SOF0 / DHT x4 / SOS /
entropy-coded MCUs with 0xFF byte stuffing / EOI. Quantization tables
are the Annex K.1 examples scaled by the libjpeg quality curve; Huffman
tables are the Annex K.3 typical tables. The decoder parses the real
marker stream (tables from the FILE, not assumed), Huffman-decodes,
dequantizes, runs the float IDCT and converts YCbCr -> RGB.

This is the genuinely LOSSY payload path of the per-row invariant
(PSNR >= 40 dB, BASELINE.json input_hint): the engine's fmt "jpeg"
column keeps the integer-deterministic quantizer stand-in precisely so
decoded pixels stay bit-reproducible in the DuckDB oracles
(imagecodec.py docstring); fmt "jfif" is the real container for
consumers that want actual JPEG bytes, verified by roundtrip PSNR
rather than a SQL hash (float DCT is not SQL-reproducible by design).

DCT/IDCT are exact float transforms (8x8 basis matrix, tensordot over
all blocks at once); entropy coding is per-block Python over numpy
zigzag/size arrays — fine for fixture/test volumes, and the decode hot
path callers batch through actor pools.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------- constants

# Annex K.1 example quantization tables (zigzag order NOT applied here;
# these are in natural row-major order)
_Q_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)
_Q_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

# zigzag scan order: _ZIGZAG[i] = natural index of the i-th zigzag coeff
def _zigzag_order() -> np.ndarray:
    idx = np.arange(64).reshape(8, 8)
    out = []
    for s in range(15):
        diag = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        if s % 2 == 0:
            diag.reverse()
        out.extend(idx[i, j] for i, j in diag)
    return np.array(out, dtype=np.int64)


_ZIGZAG = _zigzag_order()

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
_DC_L_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_L_VALS = list(range(12))
_DC_C_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_C_VALS = list(range(12))
_AC_L_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_L_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_C_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_C_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# 8x8 DCT-II basis matrix: T[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
def _dct_matrix() -> np.ndarray:
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    T = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    T[0] *= 1 / np.sqrt(2)
    return T


_T = _dct_matrix()


def _quality_scale(q_table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality curve: 50 -> table as-is, 100 -> all ones."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (q_table * s + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


# ---------------------------------------------------------- huffman build


def _build_codes(bits, vals):
    """(bits, huffval) -> {symbol: (code, length)} per T.81 C.2."""
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(bits, vals):
    """(bits, huffval) -> canonical (mincode, maxcode, valptr, vals)
    per T.81 F.2.2.3 — symbol lookup is a per-length compare walk, no
    per-code hashing."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code = 0
    k = 0
    for ln in range(1, 17):
        if bits[ln - 1]:
            valptr[ln] = k
            mincode[ln] = code
            code += bits[ln - 1]
            k += bits[ln - 1]
            maxcode[ln] = code - 1
        code <<= 1
    return mincode, maxcode, valptr, list(vals)


# ---------------------------------------------------------- bit streams


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    """Entropy-coded segment reader: unstuffs 0xFF00 once (vectorized),
    stops at the first real marker, then serves bits from a numpy bit
    array — no per-byte Python in the fill path."""

    def __init__(self, data: bytes):
        arr = np.frombuffer(data, dtype=np.uint8)
        ff = np.nonzero(arr[:-1] == 0xFF)[0]
        markers = ff[arr[ff + 1] != 0x00]
        end = int(markers[0]) if markers.size else len(arr)
        seg = arr[:end]
        keep = np.ones(len(seg), dtype=bool)
        stuffed = np.nonzero((seg[:-1] == 0xFF) & (seg[1:] == 0x00))[0]
        keep[stuffed + 1] = False
        self.bits = np.unpackbits(seg[keep])
        self.i = 0

    def read_bit(self) -> int:
        v = int(self.bits[self.i])
        self.i += 1
        return v

    _POW = (1 << np.arange(16, dtype=np.int64))[::-1]

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        b = self.bits[self.i : self.i + n]
        self.i += n
        return int(b @ self._POW[16 - n :])


def _magnitude(v: int) -> tuple[int, int]:
    """Signed value -> (size, raw bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = int(a).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    """Raw magnitude bits -> signed value (F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# ---------------------------------------------------------- color + blocks


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    p = px.astype(np.float64)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _to_blocks(chan: np.ndarray) -> np.ndarray:
    """(H, W) padded channel -> (n_blocks, 8, 8) in MCU raster order."""
    H, W = chan.shape
    return (
        chan.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _from_blocks(blocks: np.ndarray, H: int, W: int) -> np.ndarray:
    return (
        blocks.reshape(H // 8, W // 8, 8, 8).transpose(0, 2, 1, 3).reshape(H, W)
    )


# ---------------------------------------------------------- encoder


def jfif_encode(pixels: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes (4:4:4)."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("pixels must be (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("unsupported dimensions")
    qy = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)
    # pad to 8 with edge replication
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    ycc = _rgb_to_ycbcr(pixels)
    ycc = np.pad(ycc, ((0, H - h), (0, W - w), (0, 0)), mode="edge")

    comps = []
    for c in range(3):
        blocks = _to_blocks(ycc[..., c]) - 128.0
        coef = np.einsum("ux,nxy,vy->nuv", _T, blocks, _T)
        q = qy if c == 0 else qc
        qd = np.round(coef / q).astype(np.int32)
        comps.append(qd.reshape(-1, 64)[:, _ZIGZAG])  # zigzag order

    dc_l = _build_codes(_DC_L_BITS, _DC_L_VALS)
    dc_c = _build_codes(_DC_C_BITS, _DC_C_VALS)
    ac_l = _build_codes(_AC_L_BITS, _AC_L_VALS)
    ac_c = _build_codes(_AC_C_BITS, _AC_C_VALS)

    bw = _BitWriter()
    pred = [0, 0, 0]
    n_mcu = comps[0].shape[0]
    for m in range(n_mcu):
        for c in range(3):
            zz = comps[c][m]
            dct, act = (dc_l, ac_l) if c == 0 else (dc_c, ac_c)
            diff = int(zz[0]) - pred[c]
            pred[c] = int(zz[0])
            size, bits = _magnitude(diff)
            code, ln = dct[size]
            bw.write(code, ln)
            if size:
                bw.write(bits, size)
            run = 0
            nz = np.nonzero(zz[1:])[0]
            last = nz[-1] + 1 if nz.size else 0
            for i in range(1, last + 1):
                v = int(zz[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = act[0xF0]  # ZRL
                    bw.write(code, ln)
                    run -= 16
                size, bits = _magnitude(v)
                code, ln = act[(run << 4) | size]
                bw.write(code, ln)
                bw.write(bits, size)
                run = 0
            if last < 63:
                code, ln = act[0x00]  # EOB
                bw.write(code, ln)
    bw.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00" \
        + b"\x00\x01\x00\x01\x00\x00"  # APP0
    for tid, q in ((0, qy), (1, qc)):  # DQT
        out += b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([tid])
        out += bytes(int(x) for x in q.reshape(64)[_ZIGZAG])
    # SOF0: 8-bit, 3 components, 1x1 sampling (4:4:4)
    out += b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
    out += h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x03"
    out += bytes([1, 0x11, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    for tc, th, bits, vals in (
        (0, 0, _DC_L_BITS, _DC_L_VALS),
        (1, 0, _AC_L_BITS, _AC_L_VALS),
        (0, 1, _DC_C_BITS, _DC_C_VALS),
        (1, 1, _AC_C_BITS, _AC_C_VALS),
    ):  # DHT
        out += b"\xff\xc4" + (19 + len(vals)).to_bytes(2, "big")
        out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    # SOS
    out += b"\xff\xda" + (12).to_bytes(2, "big") + b"\x03"
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00"
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------- decoder


def jfif_decode(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB. Parses the real
    marker stream: tables come from the file. Supports the encoder's
    shape (baseline, 8-bit, 3 components, 4:4:4, no restart markers)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    h = w = 0
    comp_q: dict[int, int] = {}
    scan_comps: list[tuple[int, int, int]] = []
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        ln = int.from_bytes(data[pos : pos + 2], "big")
        seg = data[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT (possibly multiple tables per segment)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                q = np.zeros(64, dtype=np.int32)
                q[_ZIGZAG] = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8)
                qtabs[tq] = q.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                htabs[(tc, th)] = _build_decoder(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            if nc != 3:
                raise NotImplementedError("only 3-component JPEG")
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise NotImplementedError("only 4:4:4 (1x1 sampling)")
                comp_q[cid] = tq
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential (SOF0)")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_comps.append((cid, tt >> 4, tt & 0xF))
            pos += ln
            break
        pos += ln
    else:
        raise ValueError("no scan found")

    if not (h and w and scan_comps):
        raise ValueError("incomplete JPEG headers")
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    n_mcu = (H // 8) * (W // 8)
    br = _BitReader(data[pos:])

    bit_arr = br.bits

    def read_symbol(tab) -> int:
        mincode, maxcode, valptr, vals = tab
        i = br.i
        code = int(bit_arr[i])
        i += 1
        ln = 1
        while code > maxcode[ln]:
            code = (code << 1) | int(bit_arr[i])
            i += 1
            ln += 1
            if ln > 16:
                raise ValueError("invalid huffman code")
        br.i = i
        return vals[valptr[ln] + code - mincode[ln]]

    coefs = [np.zeros((n_mcu, 64), dtype=np.int32) for _ in scan_comps]
    pred = [0] * len(scan_comps)
    for m in range(n_mcu):
        for ci, (cid, dct_id, act_id) in enumerate(scan_comps):
            dct = htabs[(0, dct_id)]
            act = htabs[(1, act_id)]
            size = read_symbol(dct)
            diff = _extend(br.read_bits(size), size) if size else 0
            pred[ci] += diff
            coefs[ci][m, 0] = pred[ci]
            i = 1
            while i < 64:
                rs = read_symbol(act)
                run, size = rs >> 4, rs & 0xF
                if size == 0:
                    if run == 15:  # ZRL
                        i += 16
                        continue
                    break  # EOB
                i += run
                if i > 63:
                    raise ValueError("AC run overflow")
                coefs[ci][m, i] = _extend(br.read_bits(size), size)
                i += 1

    chans = []
    for ci, (cid, _, _) in enumerate(scan_comps):
        q = qtabs[comp_q[cid]].reshape(64).astype(np.float64)
        # coefs are in zigzag order; scatter back to natural order, then
        # dequantize with the natural-order table
        blocks = np.zeros((n_mcu, 64), dtype=np.float64)
        blocks[:, _ZIGZAG] = coefs[ci]
        blocks = (blocks * q[None, :]).reshape(-1, 8, 8)
        spat = np.einsum("xu,nuv,yv->nxy", _T.T, blocks, _T.T) + 128.0
        chans.append(_from_blocks(spat, H, W)[:h, :w])
    ycc = np.stack(chans, axis=-1)
    return _ycbcr_to_rgb(ycc)
