"""Vectorized MurmurHash3_x86_32 (public domain algorithm, Austin Appleby).

The reference computes MinHash with MurmurHash3_x86_32 over 4-byte
shingles under deterministic seeds 1..128 (README.md:2571-2598;
VALIDATION_METHODS.md:122). For a 4-byte key the algorithm is a single
block mix + finalization, and the block mix is seed-independent — so we
pre-mix each shingle once and then combine with all 128 seeds in a
vectorized pass.

All arithmetic is uint32 with silent wraparound (numpy semantics).
"""

from __future__ import annotations

import numpy as np

_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)
_F1 = np.uint32(0x85EBCA6B)
_F2 = np.uint32(0xC2B2AE35)
_M5 = np.uint32(5)
_N = np.uint32(0xE6546B64)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint32(r)
    return (x << r) | (x >> np.uint32(32 - r))


def premix_u32(keys: np.ndarray) -> np.ndarray:
    """Seed-independent block mix of 4-byte little-endian keys (uint32)."""
    k = keys.astype(np.uint32, copy=True)
    k *= _C1
    k = _rotl(k, 15)
    k *= _C2
    return k


def finalize(h: np.ndarray, length: int) -> np.ndarray:
    """MurmurHash3 fmix32 with length xor."""
    h = h ^ np.uint32(length)
    h ^= h >> np.uint32(16)
    h *= _F1
    h ^= h >> np.uint32(13)
    h *= _F2
    h ^= h >> np.uint32(16)
    return h


def hash_premixed(k: np.ndarray, seeds: np.ndarray, out: np.ndarray | None = None,
                  tmp: np.ndarray | None = None) -> np.ndarray:
    """murmur3_x86_32 of premixed 4-byte keys under many seeds.

    k: (N,) premixed keys; seeds: (S,) uint32. Returns (S, N) uint32.
    ``out``/``tmp`` are optional (S, N) scratch buffers — the whole body
    runs in place on them (hot path of the MinHash signer).
    """
    S, N = seeds.size, k.size
    if out is None or out.shape[0] < S or out.shape[1] < N:
        out = np.empty((S, N), dtype=np.uint32)
        tmp = np.empty((S, N), dtype=np.uint32)
    h = out[:S, :N]
    t = tmp[:S, :N]
    np.bitwise_xor(seeds.astype(np.uint32)[:, None], k[None, :], out=h)
    # rotl(h, 13)
    np.right_shift(h, np.uint32(19), out=t)
    np.left_shift(h, np.uint32(13), out=h)
    np.bitwise_or(h, t, out=h)
    np.multiply(h, _M5, out=h)
    np.add(h, _N, out=h)
    # finalize(h, 4)
    np.bitwise_xor(h, np.uint32(4), out=h)
    np.right_shift(h, np.uint32(16), out=t)
    np.bitwise_xor(h, t, out=h)
    np.multiply(h, _F1, out=h)
    np.right_shift(h, np.uint32(13), out=t)
    np.bitwise_xor(h, t, out=h)
    np.multiply(h, _F2, out=h)
    np.right_shift(h, np.uint32(16), out=t)
    np.bitwise_xor(h, t, out=h)
    return h


def murmur3_u32(keys: np.ndarray, seed: int) -> np.ndarray:
    """murmur3_x86_32 of 4-byte LE keys (uint32 array) under one seed."""
    k = premix_u32(np.asarray(keys))
    h = np.uint32(seed) ^ k
    h = _rotl(h, 13)
    h = h * _M5 + _N
    return finalize(h, 4)


_M32 = 0xFFFFFFFF


def murmur3_bytes(data: bytes, seed: int = 0) -> int:
    """Scalar murmur3_x86_32 over arbitrary bytes (pure-int, no numpy warnings)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    n = len(data)
    nblocks = n // 4
    h = seed & _M32
    for i in range(nblocks):
        k = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k = (k * c1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * c2) & _M32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _M32
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[nblocks * 4 :]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * c1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * c2) & _M32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h
