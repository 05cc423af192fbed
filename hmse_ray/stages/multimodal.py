"""Multimodal payload stages: decode / resize / feature / frame-sample.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata (fmt, w, h, ...). Each operation is an actor-pool map_batches
stage: handles/codecs initialize once per actor in __init__, work
happens per Arrow batch in __call__, batch sizes kept small because
rows are wide (task brief; ray guide "memory-aware").

This container has no image/audio/video libraries, so:
  * image decode is REAL for the engine codec (raw/png/jpeg stand-ins,
    hmse_ray.functions.imagecodec) and PIL-gated for real formats;
  * audio decode is REAL for RIFF/WAVE PCM16 (pure-numpy chunk parser,
    functions/audiocodec.py) and soundfile-gated for other formats;
  * video frame sampling is REAL for the engine's HVID frame-concat
    container (functions/videocodec.py, header seek + per-frame reads)
    and av-gated for real codecs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

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
    """Audio decode stage — REAL for RIFF/WAVE PCM16 (pure-numpy parser,
    functions/audiocodec.py); soundfile-gated for other formats.

    Input: (clip_id: string, bytes: binary, fmt: string)
    Output: (clip_id, samples: list<int16>, sample_rate: int32,
             n_channels: int32) — decoded PCM, mixed down column-major.

    features_only=True (VERDICT r3 item 7) folds the per-clip feature
    reduction into the actor instead of emitting the payload-heavy
    ``samples`` column: output becomes (clip_id, n_samples, sample_rate,
    duration_ms, rms, peak) — identical values to running the two-stage
    decode -> features pipeline (pinned by test), with the decoded
    waveform never crossing the object store. This is the shape a
    features-only consumer wants at 100-TB scale.
    """

    def __init__(self, features_only: bool = False):
        from hmse_ray.functions import audiocodec

        self.features_only = features_only
        self._codec = audiocodec
        try:  # pragma: no cover - not installed in this container
            import soundfile  # noqa: F401

            self._sf = soundfile
        except ImportError:
            self._sf = None

    def _decode(self, blob: bytes, fmt: str):
        if fmt == "wav":
            return self._codec.decode_wav(blob)
        if self._sf is None:  # pragma: no cover
            raise NotImplementedError(
                f"decoding '{fmt}' requires the optional 'soundfile' "
                "dependency (absent in this container); the WAV path is real"
            )
        # dtype='int16' keeps the output contract identical to the WAV
        # path (int16 PCM); soundfile's default float64 in [-1, 1] would
        # truncate to 0/±1 under the astype(int16) in __call__ (ADVICE r3)
        data, rate = self._sf.read(  # pragma: no cover
            __import__("io").BytesIO(blob), dtype="int16"
        )
        return data, rate, (data.shape[1] if data.ndim > 1 else 1)  # pragma: no cover

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["clip_id"]
        out_samples, rates, chans, offsets = [], [], [], [0]
        for blob, fmt in zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist()):
            s, rate, n_ch = self._decode(blob, fmt)
            s = np.asarray(s).reshape(-1)  # interleaved when multi-channel
            out_samples.append(s.astype(np.int16, copy=False))
            rates.append(rate)
            chans.append(n_ch)
            offsets.append(offsets[-1] + s.size)
        if self.features_only:
            return _clip_features(ids, out_samples, rates, chans)
        if offsets[-1] > np.iinfo(np.int32).max:
            raise ValueError(
                f"batch decodes to {offsets[-1]} samples, exceeding int32 "
                "list offsets — lower the stage batch_size for long clips")
        flat = (
            np.concatenate(out_samples) if out_samples else np.empty(0, np.int16)
        )
        return pa.table(
            {
                "clip_id": ids,
                "samples": pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()), pa.array(flat, pa.int16())
                ),
                "sample_rate": pa.array(rates, pa.int32()),
                "n_channels": pa.array(chans, pa.int32()),
            }
        )


def _clip_features(ids, out_samples: list[np.ndarray], rates: list[int],
                   chans: list[int]) -> pa.Table:
    """Per-clip features from decoded int16 PCM — value-identical to the
    two-stage decode -> features pipeline (both route their final
    arithmetic through audiocodec.feature_table, so the fused path
    keeps the SQL oracle and channel semantics by construction)."""
    from hmse_ray.functions import audiocodec

    n = [s.size for s in out_samples]
    sum_sq = [int((s.astype(np.int64) ** 2).sum()) for s in out_samples]
    peak = [int(np.abs(s.astype(np.int64)).max()) if s.size else 0
            for s in out_samples]
    return audiocodec.feature_table(ids, n, sum_sq, peak, rates, chans)


class VideoFrameSample:
    """Video frame-sampling stage — REAL for the engine's HVID
    frame-concat container (functions/videocodec.py, header seek +
    per-frame reads). Non-HVID formats raise NotImplementedError
    unconditionally (no real-codec decode path is wired up yet).

    Input: (video_id: string, bytes: binary, fmt: string)
    Output: one row PER SAMPLED FRAME (video_id, frame_idx: int32,
    n_frames: int32, w: int32, h: int32, pixels: binary gray8) —
    1-in-N fan-out like the chunk explode.
    """

    def __init__(self, every_n: int = 4):
        from hmse_ray.functions import videocodec

        self.every_n = every_n
        self._codec = videocodec

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids, idxs, totals, ws, hs, pixels = [], [], [], [], [], []
        for vid, blob, fmt in zip(
            batch["video_id"].to_pylist(),
            batch["bytes"].to_pylist(),
            batch["fmt"].to_pylist(),
        ):
            if fmt != "hvid":
                # unconditional until an av decode path exists: with av
                # importable, skipping the row would be SILENT data loss
                # behind a docstring that promises real decode (ADVICE r3)
                raise NotImplementedError(
                    f"decoding '{fmt}' requires a real-codec path (the "
                    "optional 'av' dependency is not wired up yet); the "
                    "HVID path is real"
                )
            w, h, n = self._codec.probe(blob)
            for fi in range(0, n, self.every_n):
                vids.append(vid)
                idxs.append(fi)
                totals.append(n)
                ws.append(w)
                hs.append(h)
                pixels.append(self._codec.decode_frame(blob, fi).tobytes())
        return pa.table(
            {
                "video_id": pa.array(vids, pa.string()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "n_frames": pa.array(totals, pa.int32()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "pixels": pa.array(pixels, pa.binary()),
            }
        )


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


def audio_decode_stage(clips_ds, concurrency=None, batch_size: int = 64,
                       features_only: bool = False):
    """clips -> decoded PCM sample rows (actor pool; small batches —
    rows carry whole waveforms).

    features_only=True is the 100-TB shape for feature consumers: the
    per-clip reduction happens inside the actor's __call__ and the
    payload-heavy ``samples`` column never crosses the object store
    (VERDICT r3 item 7). The default two-stage shape remains for
    consumers that need the decoded waveform itself."""
    return clips_ds.map_batches(
        AudioDecode,
        fn_constructor_kwargs={"features_only": features_only},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or (1, 8),
    )


def video_frame_stage(videos_ds, every_n: int = 4, concurrency=None,
                      batch_size: int = 32):
    """videos -> one row per sampled frame (actor pool; 1-in-N fan-out)."""
    return videos_ds.map_batches(
        VideoFrameSample,
        fn_constructor_kwargs={"every_n": every_n},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or (1, 8),
    )
