"""Pure-numpy PNG codec (RFC 2083 / W3C PNG spec, 8-bit RGB truecolor).

Real by construction — the same standard the audio (RIFF/WAVE PCM16,
functions/audiocodec.py) and video (HVID container, functions/videocodec.py)
paths got in round 3: the bytes this module writes are genuine PNG files
(signature, IHDR/IDAT/IEND chunks, CRC-32 per chunk, zlib-wrapped filtered
scanlines) that any standard viewer or library can open, and the decoder
accepts spec-valid truecolor PNGs produced by other encoders.

Scope (deliberate): bit depth 8, color type 2 (RGB), no interlace, no
ancillary chunks on encode (decode skips them). That covers the engine's
`fmt == "png"` payload column end-to-end while staying dependency-free.

Encoder determinism: filter type 0 (None) on every scanline, fixed zlib
level — byte-identical output for identical pixels, which the fixture
golden-label machinery and the resume/determinism tests rely on.

Decoder: full filter coverage (None/Sub/Up/Average/Paeth, spec §6) —
Sub is a vectorized per-channel cumulative sum mod 256, Up a vectorized
previous-row add; Average/Paeth take the per-pixel loop (our encoder never
emits them; they exist for spec-valid foreign PNGs). Chunk CRCs are
verified with zlib.crc32.

Reference analog: README.md:286-291 (L1 lossless codec layer) — the graft
carries it onto the image payload column per BASELINE.json input_hint.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_BPP = 3  # bytes per pixel: 8-bit RGB


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def png_encode(pixels: np.ndarray, level: int = 6) -> bytes:
    """Encode an (h, w, 3) uint8 array as a truecolor PNG byte string."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != _BPP:
        raise ValueError("pixels must be (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    if h < 1 or w < 1:
        raise ValueError("empty image")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # one filter-type byte (0 = None) prepended to each scanline
    scanlines = np.empty((h, w * _BPP + 1), dtype=np.uint8)
    scanlines[:, 0] = 0
    scanlines[:, 1:] = pixels.reshape(h, w * _BPP)
    idat = zlib.compress(scanlines.tobytes(), level)
    return b"".join(
        (PNG_SIGNATURE, _chunk(b"IHDR", ihdr), _chunk(b"IDAT", idat), _chunk(b"IEND", b""))
    )


def _unfilter(arr: np.ndarray, w: int) -> np.ndarray:
    """Reverse PNG scanline filtering. arr is (h, 1 + w*3) uint8 with the
    filter byte in column 0; returns (h, w*3) reconstructed bytes."""
    h = arr.shape[0]
    filters = arr[:, 0]
    if not filters.any():  # all filter-0 (our encoder's output): zero work
        return np.ascontiguousarray(arr[:, 1:])
    lines = arr[:, 1:].astype(np.int64)  # headroom for mod-256 arithmetic
    prev = np.zeros(w * _BPP, dtype=np.int64)
    for y in range(h):
        f = int(filters[y])
        cur = lines[y]
        if f == 0:  # None
            pass
        elif f == 1:  # Sub: recon[x] = raw[x] + recon[x-bpp]
            cur[:] = cur.reshape(w, _BPP).cumsum(axis=0).reshape(-1) & 0xFF
        elif f == 2:  # Up: recon[x] = raw[x] + prior[x]
            cur += prev
            cur &= 0xFF
        elif f == 3:  # Average: + floor((left + up) / 2)
            for x in range(w * _BPP):
                left = cur[x - _BPP] if x >= _BPP else 0
                cur[x] = (cur[x] + (left + prev[x]) // 2) & 0xFF
        elif f == 4:  # Paeth predictor (spec §6.6)
            for x in range(w * _BPP):
                a = cur[x - _BPP] if x >= _BPP else 0
                b = prev[x]
                c = prev[x - _BPP] if x >= _BPP else 0
                p = a + b - c
                pa, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc_:
                    pred = a
                elif pb <= pc_:
                    pred = b
                else:
                    pred = c
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {f}")
        prev = cur
    return lines.astype(np.uint8)


def png_decode(data: bytes) -> np.ndarray:
    """Decode a truecolor (8-bit RGB, non-interlaced) PNG to (h, w, 3) uint8."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    w = h = None
    idat_parts: list[bytes] = []
    while pos + 12 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r}: CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", payload)
            if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    "only 8-bit truecolor non-interlaced PNG is supported "
                    f"(got depth={depth} color={color} interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat_parts.append(payload)
        elif tag == b"IEND":
            break
        # ancillary chunks (tEXt, gAMA, ...) are skipped
        pos += 12 + ln
    else:
        raise ValueError("PNG truncated: no IEND chunk")
    if w is None or not idat_parts:
        raise ValueError("PNG missing IHDR or IDAT")
    raw = zlib.decompress(b"".join(idat_parts))
    stride = 1 + w * _BPP
    if len(raw) != h * stride:
        raise ValueError("PNG scanline payload length mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    return _unfilter(arr, w).reshape(h, w, _BPP)
