"""MinHash signatures over 4-byte shingles (reference L4 signature stage).

Semantics (README.md:1349-1373, 2571-2598): the shingle set of a chunk is
every sliding 4-byte window; the signature is, for each of n=128
MurmurHash3_x86_32 hash functions (seeds 1..128), the minimum hash over
the shingle set. Jaccard similarity between two chunks is estimated as
the fraction of agreeing signature components.

Vectorization: shingles are built with shifted uint32 views (no Python
loop over bytes), premixed once, then hashed against all seeds in
seed-blocks to bound memory; per-document minima via np.min on the
(seed_block, n_shingles) matrix.
"""

from __future__ import annotations

import numpy as np

from hmse_ray.config import Config, DEFAULT_CONFIG
from hmse_ray.functions import murmur3

_EMPTY_SENTINEL = np.uint32(0xFFFFFFFF)
_SHINGLE_TILE = 256  # shingles per hash tile (keeps scratch in L2 cache)


def seeds_for(cfg: Config) -> np.ndarray:
    return np.arange(
        cfg.minhash_seed_base, cfg.minhash_seed_base + cfg.num_hashes, dtype=np.uint32
    )


def shingles_u32(data: bytes, shingle_size: int = 4) -> np.ndarray:
    """Unique sliding 4-byte windows as little-endian uint32 (the shingle SET).

    Sub-4-byte inputs are padded with the PAD LENGTH as the byte value
    (b'a' -> b'a\\x03\\x03\\x03'): plain NUL padding made distinct tiny
    inputs shingle-identical (b'' == b'\\x00' == b'\\x00'*4, b'a' ==
    b'a\\x00\\x00\\x00'), which MinHash then reported as Jaccard 1.0 —
    false near-dup pairs. Length-aware padding keeps every sub-4-byte
    input distinct from every other and from its NUL-extended 4-byte
    cousins. (Driver corpora never hit this — testdata minimum is 48
    chars, and the SQL oracles document the <4-byte divergence.)"""
    if shingle_size != 4:
        raise NotImplementedError("reference config uses 4-byte shingles")
    a = np.frombuffer(data, dtype=np.uint8)
    if a.size < 4:
        pad = 4 - a.size
        a = np.frombuffer(data + bytes([pad]) * pad, dtype=np.uint8)
    w = (
        a[:-3].astype(np.uint32)
        | (a[1:-2].astype(np.uint32) << np.uint32(8))
        | (a[2:-1].astype(np.uint32) << np.uint32(16))
        | (a[3:].astype(np.uint32) << np.uint32(24))
    )
    return np.unique(w)


def signature(data: bytes, cfg: Config = DEFAULT_CONFIG) -> np.ndarray:
    """128-component MinHash signature of one byte string (uint32)."""
    return signatures([data], cfg)[0]


def signatures(docs: list[bytes], cfg: Config = DEFAULT_CONFIG) -> np.ndarray:
    """MinHash signatures for a batch of byte strings -> (len(docs), n) uint32.

    Per document: shingles are premixed once (seed-independent murmur3
    block mix), then all 128 seed hashes run as fused in-place ops on a
    cache-resident (n_seeds, n_shingles) tile with preallocated scratch.
    """
    seeds = seeds_for(cfg)
    n = cfg.num_hashes
    out = np.full((len(docs), n), _EMPTY_SENTINEL, dtype=np.uint32)
    # (n_seeds, _SHINGLE_TILE) scratch tiles sized to stay cache-resident
    # (128*256*4B*2 = 256 KB) — measured fastest shape on this host.
    buf = np.empty((n, _SHINGLE_TILE), dtype=np.uint32)
    tmp = np.empty((n, _SHINGLE_TILE), dtype=np.uint32)
    for i, d in enumerate(docs):
        sh = shingles_u32(d, cfg.shingle_size)
        if sh.size == 0:
            continue
        k = murmur3.premix_u32(sh)
        row = out[i]
        for c0 in range(0, k.size, _SHINGLE_TILE):
            h = murmur3.hash_premixed(k[c0 : c0 + _SHINGLE_TILE], seeds, out=buf, tmp=tmp)
            np.minimum(row, h.min(axis=1), out=row)
    return out


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Fraction of agreeing components ~= Jaccard (README.md:1359-1373)."""
    return float(np.mean(sig_a == sig_b))


def band_hashes(sigs: np.ndarray, cfg: Config = DEFAULT_CONFIG) -> np.ndarray:
    """LSH band hashes: (rows, b) uint64 — one hash per r-row band.

    Each band's r=32 uint32 components are hashed to a single uint64 with
    a seeded multiply-xor fold (deterministic, vectorized). Band identity
    is carried separately as band_id, so hashes need only be unique
    within a band.
    """
    rows, n = sigs.shape
    b, r = cfg.num_bands, cfg.rows_per_band
    assert b * r == n
    v = sigs.reshape(rows, b, r).astype(np.uint64)
    h = np.full((rows, b), np.uint64(cfg.band_hash_seed), dtype=np.uint64)
    mul = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant (splitmix64)
    for j in range(r):
        h = (h ^ v[:, :, j]) * mul
        h ^= h >> np.uint64(29)
    return h
