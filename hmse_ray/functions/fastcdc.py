"""L2 content-defined chunking (FastCDC-style gear rolling hash).

Reference semantics (README.md:289, 1207-1208, 1228-1254, 2444-2507):
a rolling hash scans the byte stream and cuts a chunk boundary when the
hash matches a mask condition, subject to min 1024 / avg 4096 / max
16384 byte bounds with an expected-size acceptance band of 3.5-4.5 KB
(README.md:2510-2514). Boundaries are a pure function of content, so
inserting bytes shifts only the local boundary (shift-resistance,
README.md:1254).

Implementation: the public FastCDC gear construction (Xia et al.,
USENIX ATC'16): ``h_p = (h_{p-1} << 1) + gear[b_p]`` over a 256-entry
random table (deterministic here: SHA-256(seed || i)), with FastCDC's
*normalized chunking* — a stricter mask before the average point and a
looser mask after it, which concentrates chunk sizes around chunk_avg.

The hot path is vectorized: the rolling hash at EVERY position is
computed with a log2(window)=5-pass doubling recurrence
(H^(k+1)_p = (H^(k)_{p-2^k} << 2^k) + H^(k)_p) over the whole buffer,
candidate cut positions are extracted with nonzero(), and only the
(sparse) candidate lists are walked in Python to enforce min/avg/max.
"""

from __future__ import annotations

import hashlib

import numpy as np

from hmse_ray.config import Config, DEFAULT_CONFIG

_WINDOW_LOG = 5  # 2^5 = 32-byte effective gear window (bits of a uint32)

_gear_cache: dict[int, np.ndarray] = {}


def gear_table(seed: int) -> np.ndarray:
    """Deterministic 256-entry uint32 gear table from SHA-256(seed || i)."""
    tab = _gear_cache.get(seed)
    if tab is None:
        vals = [
            int.from_bytes(
                hashlib.sha256(seed.to_bytes(8, "little") + bytes([i])).digest()[:4],
                "little",
            )
            for i in range(256)
        ]
        tab = np.array(vals, dtype=np.uint32)
        tab.setflags(write=False)
        _gear_cache[seed] = tab
    return tab


def _masks(cfg: Config) -> tuple[int, int]:
    """FastCDC normalization level 2: strict mask below avg, loose above."""
    bits = int(cfg.rabin_mask).bit_length()  # 4095 -> 12 bits (avg 4096)
    # Offsets tuned empirically on random data so the realized mean chunk
    # size lands on chunk_avg within the reference 3.5-4.5 KB acceptance
    # band (README.md:2510-2514): mean ~= 4016, std ~= 1196.
    mask_s = (1 << (bits + 1)) - 1  # harder to match before chunk_avg
    mask_l = (1 << (bits - 3)) - 1  # easier to match after chunk_avg
    return mask_s, mask_l


def rolling_hash(data: bytes, cfg: Config = DEFAULT_CONFIG) -> np.ndarray:
    """Gear rolling hash at every position (uint32), 5-pass doubling."""
    arr = np.frombuffer(data, dtype=np.uint8)
    h = gear_table(cfg.gear_seed)[arr]  # copy, writable, uint32 wraps mod 2^32
    for k in range(_WINDOW_LOG):
        m = 1 << k
        if m >= h.size:
            break
        shifted = h[:-m] << np.uint32(m)  # materialized before the add (safe overlap)
        h[m:] += shifted
    return h


def chunk_boundaries(data: bytes, cfg: Config = DEFAULT_CONFIG) -> list[tuple[int, int]]:
    """Cut ``data`` into content-defined chunks; returns [(offset, length)].

    Normalized-chunking rule per chunk starting at ``start``:
      - positions [start+min-1, start+avg-1): cut at first strict-mask match
      - positions [start+avg-1, start+max-1): cut at first loose-mask match
      - else force a cut at start+max (or end of data).
    """
    n = len(data)
    if n == 0:
        return []
    if n <= cfg.chunk_min:
        return [(0, n)]
    h = rolling_hash(data, cfg)
    mask_s, mask_l = _masks(cfg)
    cand_s = np.nonzero((h & np.uint32(mask_s)) == 0)[0]
    cand_l = np.nonzero((h & np.uint32(mask_l)) == 0)[0]
    out: list[tuple[int, int]] = []
    start = 0
    while start < n:
        lo = start + cfg.chunk_min - 1
        mid = start + cfg.chunk_avg - 1
        hi = start + cfg.chunk_max - 1
        end = None
        i = int(np.searchsorted(cand_s, lo, side="left"))
        if i < cand_s.size and cand_s[i] < mid:
            end = int(cand_s[i]) + 1
        else:
            j = int(np.searchsorted(cand_l, mid, side="left"))
            if j < cand_l.size and cand_l[j] <= hi:
                end = int(cand_l[j]) + 1
        if end is None or end > n:
            end = min(hi + 1, n)
        out.append((start, end - start))
        start = end
    return out


def chunk_bytes(data: bytes, cfg: Config = DEFAULT_CONFIG) -> list[bytes]:
    """Chunk ``data`` and return the chunk byte strings."""
    return [data[o : o + l] for o, l in chunk_boundaries(data, cfg)]
