"""Pure-numpy RIFF/WAVE PCM codec (real audio path, no dependencies).

VERDICT r02 item 6: the audio stage was a soundfile-gated stub — the one
capability with zero real execution. A RIFF PCM16 WAV is pure structured
bytes, so decode/encode need only numpy + struct: this module implements
the container for real (chunk-walking parser, mono/stereo, PCM16), and
the multimodal AudioDecode stage runs it per batch.

Reference analog: S1 block streaming / L1 codec layering
(/root/reference/README.md:1519-1524 — payloads enter the pipeline as
opaque byte blocks; the codec is the first stateless map).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono/stereo samples -> RIFF/WAVE PCM16 bytes.

    samples: (n,) mono or (n, ch) interleavable int16 array.
    """
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        n_ch = 1
    elif s.ndim == 2:
        n_ch = s.shape[1]
    else:
        raise ValueError("samples must be 1-D (mono) or 2-D (frames, channels)")
    data = s.tobytes()
    byte_rate = sample_rate * n_ch * 2
    block_align = n_ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, byte_rate, block_align, 16
    )  # PCM16
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(blob: bytes) -> tuple[np.ndarray, int, int]:
    """RIFF/WAVE PCM16 bytes -> (samples int16 (n,) or (n, ch), rate, n_channels).

    Chunk-walking parser: tolerates extra chunks (LIST/fact/...) in any
    order before/after fmt+data, per the RIFF spec.
    """
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, 8 + struct.unpack("<I", blob[4:8])[0]
    end = min(end, len(blob))
    fmt_chunk = data = None
    while pos + 8 <= end:
        cid = blob[pos : pos + 4]
        size = struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
        if pos + 8 + size > len(blob):
            raise ValueError(
                f"chunk {cid!r} declares {size} bytes but only "
                f"{len(blob) - pos - 8} remain — truncated/corrupt stream")
        payload = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_chunk = payload
        elif cid == b"data":
            data = payload
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_chunk is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = struct.unpack("<HHIIHH", fmt_chunk[:16])
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (fmt={audio_fmt}, bits={bits})")
    if n_ch < 1:
        raise ValueError(f"corrupt fmt chunk: n_channels={n_ch}")
    if rate < 1:
        raise ValueError(f"corrupt fmt chunk: sample_rate={rate}")
    s = np.frombuffer(data[: (len(data) // (2 * n_ch)) * 2 * n_ch], dtype="<i2")
    if n_ch > 1:
        s = s.reshape(-1, n_ch)
    return s, rate, n_ch


def feature_table(ids, n, sum_sq, peak, rates, chans):
    """Final per-clip feature arithmetic — the ONE implementation shared
    by the fused stage, the two-stage reduction and the scalar helper
    (three hand-synced copies previously risked silent SQL-parity
    drift). duration_ms counts FRAMES (interleaved sample count /
    channels) — the old interleaved-count duration reported n_ch x the
    real duration for multi-channel clips (fixtures are mono, so the
    SQL oracle is unchanged). rms stays over interleaved samples
    (all-channel power), sum_sq integer-exact for the oracle."""
    import pyarrow as pa

    n = np.asarray(n, dtype=np.int64)
    sum_sq = np.asarray(sum_sq, dtype=np.int64)
    peak = np.asarray(peak, dtype=np.int64)
    rate_f = np.asarray(rates, dtype=np.float64)
    frames = n // np.maximum(np.asarray(chans, dtype=np.int64), 1)
    return pa.table({
        "clip_id": ids,
        "n_samples": pa.array(n, pa.int64()),
        "sample_rate": pa.array(np.asarray(rates, dtype=np.int64), pa.int64()),
        "duration_ms": pa.array(frames.astype(np.float64) * 1000.0 / rate_f,
                                pa.float64()),
        "rms": pa.array(np.sqrt(sum_sq / np.maximum(n, 1)), pa.float64()),
        "peak": pa.array(peak, pa.int64()),
    })


def audio_features(samples: np.ndarray, rate: int, n_channels: int = 1) -> dict:
    """Scalar per-clip features (one row through feature_table)."""
    s = np.asarray(samples, dtype=np.int64).ravel()
    t = feature_table(
        ["x"], [s.size], [int(np.dot(s, s))],
        [int(np.abs(s).max()) if s.size else 0], [int(rate)], [n_channels])
    row = {c: t[c][0].as_py() for c in t.column_names}
    row.pop("clip_id")
    return row
