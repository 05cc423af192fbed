"""Perceptual signatures for the image payload: phash + seeded SimHash.

The reference's L4 computes one signature per record and LSH-buckets it
(README.md:291, 1929-1945); the graft extends this to the image payload
(BASELINE.json north_star: "phash-seeded SimHash for pixels"). Two
signatures:

  * phash64  — classic 8x8 average-hash (aHash) over the luma plane:
    bit i set iff cell_i mean luma > global mean. Matches the input
    table's precomputed ``phash`` column.
  * simhash64 — SimHash over a 16x16 luma grid: a seeded +-1 projection
    matrix (64 x 256, derived from Config.simhash_seed via murmur3, so it
    is a pure function of config — "phash-seeded" projection family)
    projects the mean-centered grid; sign bits form the 64-bit signature.
    Near-identical pixels => small Hamming distance.

Both are vectorized over a batch of decoded images and deterministic.
The projection matrix is built once per actor (stages.signatures).
"""

from __future__ import annotations

import numpy as np

from hmse_ray.config import Config, DEFAULT_CONFIG
from hmse_ray.functions import murmur3

_LUMA = np.array([0.299, 0.587, 0.114])


def luma_grid(pixels: np.ndarray, grid: int) -> np.ndarray:
    """Mean luma on a (grid x grid) downsample -> (grid*grid,) float64."""
    h, w, _ = pixels.shape
    y = pixels.astype(np.float64) @ _LUMA  # (h, w)
    if h % grid == 0 and w % grid == 0:
        # fast path: exact block means via reshape
        return (
            y.reshape(grid, h // grid, grid, w // grid).mean(axis=(1, 3)).ravel()
        )
    # general path: integral-image box means over an even partition
    ys = np.linspace(0, h, grid + 1).astype(int)
    xs = np.linspace(0, w, grid + 1).astype(int)
    ii = np.zeros((h + 1, w + 1))
    np.cumsum(np.cumsum(y, axis=0), axis=1, out=ii[1:, 1:])
    s = ii[ys][:, xs]  # (grid+1, grid+1) corner sums
    box = s[1:, 1:] - s[:-1, 1:] - s[1:, :-1] + s[:-1, :-1]
    area = np.outer(np.diff(ys), np.diff(xs)).clip(min=1)
    return (box / area).ravel()


def phash64(pixels: np.ndarray) -> int:
    """8x8 average-hash of the luma plane -> signed int64 (parquet-friendly)."""
    g = luma_grid(pixels, 8)
    bits = g > g.mean()
    v = np.uint64(0)
    for i, b in enumerate(bits):
        if b:
            v |= np.uint64(1) << np.uint64(i)
    return int(np.int64(v))


def projection_matrix(cfg: Config = DEFAULT_CONFIG) -> np.ndarray:
    """Deterministic (bits x grid^2) +-1 projection from murmur3(seed)."""
    nfeat = cfg.simhash_grid * cfg.simhash_grid
    idx = np.arange(cfg.simhash_bits * nfeat, dtype=np.uint32)
    h = murmur3.murmur3_u32(idx, cfg.simhash_seed)
    signs = np.where((h & np.uint32(1)).astype(bool), 1.0, -1.0)
    return signs.reshape(cfg.simhash_bits, nfeat)


def simhash64(pixels: np.ndarray, proj: np.ndarray, cfg: Config = DEFAULT_CONFIG) -> int:
    """Seeded SimHash of one decoded image -> signed int64."""
    feat = luma_grid(pixels, cfg.simhash_grid)
    feat = feat - feat.mean()
    dots = proj @ feat  # (bits,)
    v = np.uint64(0)
    for i in range(cfg.simhash_bits):
        if dots[i] > 0:
            v |= np.uint64(1) << np.uint64(i)
    return int(np.int64(v))


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise Hamming distance between int64 signature arrays."""
    x = (a.astype(np.int64).view(np.uint64)) ^ (b.astype(np.int64).view(np.uint64))
    # vectorized popcount via byte-table lookup
    table = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
    bts = x.view(np.uint8).reshape(-1, 8)
    return table[bts].sum(axis=1).astype(np.int64)


def simhash_band_cols(sims: np.ndarray, cfg: Config = DEFAULT_CONFIG) -> np.ndarray:
    """Split 64-bit simhashes into (rows, bands) uint16 band keys for LSH."""
    u = sims.astype(np.int64).view(np.uint64)
    bands = cfg.simhash_bands
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)
    out = np.empty((u.size, bands), dtype=np.uint64)
    for b in range(bands):
        out[:, b] = (u >> np.uint64(b * width)) & mask
    return out
