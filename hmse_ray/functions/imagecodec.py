"""Deterministic image encode/decode for the `bytes`/`fmt` payload columns.

The input table carries encoded images as opaque binary (input_hint:
``bytes: binary, w: int32, h: int32, fmt: string``). Codecs:

  - fmt "raw"  — w*h*3 RGB bytes, uncompressed.
  - fmt "png"  — REAL PNG (round 4): spec-compliant 8-bit truecolor PNG
    via the pure-numpy codec in hmse_ray.functions.pngcodec (signature,
    IHDR/IDAT/IEND, per-chunk CRC-32, filtered scanlines — decoder covers
    all five spec filter types). Lossless, so every downstream pixel
    value, phash and SQL oracle is unchanged from the earlier zlib
    stand-in; only the container bytes are now genuine PNG.
  - fmt "jpeg" — DELIBERATE deterministic stand-in (6-bit-per-channel
    quantization step 4 + zlib; PSNR ~= 43 dB, exercising the
    PSNR >= 40 dB branch of the per-row invariant). A real JPEG needs
    float DCT whose result is not bit-reproducible in SQL — the
    quantizer's integer determinism is exactly what lets DuckDB
    regenerate decoded pixels and keep decode_resize_features
    hash-verified (queries.py:_decode_resize_sql). If PIL is importable
    at runtime, unknown fmts fall through to it on decode.
  - fmt "jfif" — REAL baseline JPEG (round 4): ITU-T T.81 sequential
    DCT via the pure-numpy codec in hmse_ray.functions.jpegcodec
    (JFIF markers, Annex K tables scaled by the libjpeg quality curve,
    Huffman entropy coding, float DCT/IDCT). Genuinely lossy —
    verified by roundtrip PSNR (>= 40 dB at the default quality even
    on max-entropy noise), NOT by a SQL hash: float DCT is not
    SQL-reproducible, which is why "jpeg" keeps the stand-in.
  - any other fmt raises NotImplementedError (PIL-gated).

The synthetic fixtures in hmse_ray.sources.fixtures encode with these
same codecs, so decode/invariant paths are end-to-end exercised.
"""

from __future__ import annotations

import zlib

import numpy as np

from hmse_ray.functions.pngcodec import png_decode, png_encode

try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

_QUANT_STEP = 4  # "jpeg" stand-in: quantize each channel to multiples of 4

# default jfif quality: 98 keeps roundtrip PSNR >= 40 dB even on
# max-entropy noise payloads (the fixture's murmur pixels); real photos
# clear 40 dB from quality ~90
JFIF_QUALITY = 98

OWN_FORMATS = ("raw", "png", "jpeg", "jfif")


def encode(pixels: np.ndarray, fmt: str, level: int = 6) -> bytes:
    """Encode an (h, w, 3) uint8 pixel array with the engine codec."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("pixels must be (h, w, 3) uint8")
    raw = pixels.tobytes()
    if fmt == "raw":
        return raw
    if fmt == "png":
        return png_encode(pixels, level)
    if fmt == "jpeg":
        q = (pixels // _QUANT_STEP).astype(np.uint8)
        return zlib.compress(q.tobytes(), level)
    if fmt == "jfif":
        from hmse_ray.functions.jpegcodec import jfif_encode

        return jfif_encode(pixels, JFIF_QUALITY)
    raise NotImplementedError(
        f"fmt {fmt!r}: real image encoding requires PIL (absent in this container)"
    )


def decode(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Decode to an (h, w, 3) uint8 pixel array."""
    n = h * w * 3
    if fmt == "raw":
        return np.frombuffer(data, dtype=np.uint8, count=n).reshape(h, w, 3)
    if fmt == "png":
        px = png_decode(data)
        if px.shape != (h, w, 3):
            raise ValueError(f"PNG header {px.shape[:2]} != expected {(h, w)}")
        return px
    if fmt == "jpeg":
        q = np.frombuffer(zlib.decompress(data), dtype=np.uint8, count=n).reshape(h, w, 3)
        # dequantize to bin centers: 4*q + 1 (max err 2, PSNR ~= 42-48 dB)
        return (q.astype(np.uint16) * _QUANT_STEP + _QUANT_STEP // 2 - 1).clip(0, 255).astype(
            np.uint8
        )
    if fmt == "jfif":
        from hmse_ray.functions.jpegcodec import jfif_decode

        px = jfif_decode(data)
        if px.shape != (h, w, 3):
            raise ValueError(f"JFIF header {px.shape[:2]} != expected {(h, w)}")
        return px
    if _HAVE_PIL:  # pragma: no cover
        import io

        import PIL.Image

        px = np.asarray(PIL.Image.open(io.BytesIO(data)).convert("RGB"))
        # same metadata check the png/jfif paths enforce: a mismatched
        # decode otherwise IndexErrors (or silently mis-samples) in the
        # resize grid built from (h, w)
        if px.shape != (h, w, 3):
            raise ValueError(
                f"{fmt} decode {px.shape[:2]} != metadata {(h, w)}")
        return px
    raise NotImplementedError(
        f"fmt {fmt!r}: real image decoding requires PIL (absent in this container)"
    )


def is_lossless(fmt: str) -> bool:
    return fmt in ("raw", "png")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 pixel arrays."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
