"""Vectorized Bloom filter over sha256 hex keys (bloom semi-join filter).

Motivation (incremental ingest at 100 TB): ``pipelines/incremental.py``
co-partitions the persisted canonical index with a delta shard. The
index side is ALL history (10^12-scale rows); the delta is one shard.
A plain co-partition shuffles the whole index every ingest. The classic
fix is a bloom semi-join (Bloom 1970; used by every distributed SQL
engine's "runtime filter"): build a Bloom filter from the SMALL side
(the delta's shas), broadcast it once via ``ray.put``, and filter the
index stream down to possible members BEFORE the shuffle — the shuffle
then carries ~|delta| x (1 + fpp) index rows instead of |index|. False
positives only add harmless unmatched rows to a partition; false
negatives cannot occur, so the result is bit-identical to the
unfiltered path (pinned in tests/test_incremental.py::TestBloomSemijoin).

Implementation notes:
- Keys are sha256 hex strings (``hex_words``: first 16 hex chars parsed
  to two uint32 words with a pure-numpy nibble LUT, no per-row Python;
  sha output is uniform, so the words ARE the two base hashes) or int64
  values (``int_words``: murmur3 fmix64 avalanche, so structured keys
  like LSH band buckets still probe uniformly).
- k probe positions come from Kirsch-Mitzenmacher double hashing
  (g_i = h1 + i*h2 mod m, h2 forced odd so it generates Z_m for m a
  power of two) — "Less Hashing, Same Performance", Kirsch &
  Mitzenmacher 2006.
- Bits are packed into a uint64 array; set uses np.bitwise_or.at
  (unbuffered scatter), probe is a vectorized gather + AND across the k
  probes.
- Distributed build: per-batch partial bitmaps OR-reduce. At this
  repo's scales the driver ORs the per-block bitmaps; at 10^12 scale
  the same OR is associative, so it tree-reduces (documented, not
  needed here: the delta side is small by definition).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_NIB = np.full(256, 0, np.uint8)
for _i, _c in enumerate(b"0123456789abcdef"):
    _NIB[_c] = _i
for _i, _c in enumerate(b"ABCDEF"):
    _NIB[_c] = 10 + _i


def hex_words(shas) -> tuple[np.ndarray, np.ndarray]:
    """First 16 hex chars of each key -> two uint64-held uint32 words.

    Vectorized: ascii bytes -> nibble LUT -> positional recombination.
    Matches int(s[:8], 16) / int(s[8:16], 16) (pinned in tests).
    """
    a = np.asarray(shas, dtype="S16")
    if a.size == 0:
        z = np.zeros(0, np.uint64)
        return z, z
    nib = _NIB[a.view(np.uint8).reshape(-1, 16)].astype(np.uint64)
    p = np.uint64(1) << (np.uint64(4) * np.arange(7, -1, -1, dtype=np.uint64))
    w0 = (nib[:, :8] * p).sum(axis=1)
    w1 = (nib[:, 8:] * p).sum(axis=1)
    return w0, w1


def int_words(keys) -> tuple[np.ndarray, np.ndarray]:
    """int64 keys -> two uint64-held uint32 words via the murmur3
    fmix64 finalizer (Appleby, public domain) — avalanches structured
    keys (e.g. LSH bucket ids ``band_hash * MIX + band``) so the two
    words are independent base hashes like the sha path's."""
    v = np.asarray(keys, dtype=np.int64).view(np.uint64).copy()
    if v.size == 0:
        z = np.zeros(0, np.uint64)
        return z, z
    v ^= v >> np.uint64(33)
    v *= np.uint64(0xFF51AFD7ED558CCD)
    v ^= v >> np.uint64(33)
    v *= np.uint64(0xC4CEB9FE1A85EC53)
    v ^= v >> np.uint64(33)
    return v & np.uint64(0xFFFFFFFF), v >> np.uint64(32)


class Bloom:
    """Fixed-size Bloom filter; ``m_bits`` must be a power of two."""

    def __init__(self, m_bits: int = 1 << 20, k: int = 7,
                 bits: np.ndarray | None = None):
        assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of two"
        assert m_bits >= 64, "m_bits below one 64-bit word allocates an " \
            "empty bits array and every probe IndexErrors"
        self.m_bits = m_bits
        self.k = k
        self.bits = (
            bits if bits is not None else np.zeros(m_bits // 64, np.uint64)
        )

    def _positions_from_words(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """(k, n) Kirsch-Mitzenmacher probe positions from base words."""
        h2 = h2 | np.uint64(1)  # odd -> generates all of Z_m (m = 2^b)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return (h1[None, :] + i * h2[None, :]) & np.uint64(self.m_bits - 1)

    def _positions(self, shas) -> np.ndarray:
        """(k, n) probe positions for each sha-hex key."""
        return self._positions_from_words(*hex_words(shas))

    def _set(self, pos: np.ndarray) -> "Bloom":
        pos = pos.ravel()
        np.bitwise_or.at(
            self.bits, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )
        return self

    def _probe(self, pos: np.ndarray) -> np.ndarray:
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = pos & np.uint64(63)
        hit = (self.bits[word] >> bit) & np.uint64(1)
        return hit.all(axis=0)

    def add_many(self, shas) -> "Bloom":
        return self._set(self._positions(shas))

    def contains_many(self, shas) -> np.ndarray:
        """Boolean mask; no false negatives by construction."""
        return self._probe(self._positions(shas))

    def add_many_i64(self, keys) -> "Bloom":
        """int64-key variant (LSH bucket ids): same filter, int_words."""
        return self._set(self._positions_from_words(*int_words(keys)))

    def contains_many_i64(self, keys) -> np.ndarray:
        return self._probe(self._positions_from_words(*int_words(keys)))

    def union(self, other: "Bloom") -> "Bloom":
        assert self.m_bits == other.m_bits and self.k == other.k
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self


def build_from_dataset(ds, col: str = "sha256", m_bits: int = 1 << 20,
                       k: int = 7, int_keys: bool = False) -> Bloom:
    """Build a Bloom over ``ds[col]`` (the SMALL side of a semi-join).

    ``int_keys=True`` treats the column as int64 (LSH bucket ids);
    default is sha256 hex strings. Per-block partial bitmaps (m_bits/8
    bytes each) OR-reduce on the driver — bounded by blocks x bitmap
    size, associative for a tree reduce at larger block counts.
    """

    def partial(t: pa.Table) -> pa.Table:
        b = Bloom(m_bits, k)
        if int_keys:
            b.add_many_i64(t[col].to_numpy())
        else:
            b.add_many(t[col].to_pandas().to_numpy())
        return pa.table({"bitmap": pa.array([b.bits.tobytes()], pa.binary())})

    out = Bloom(m_bits, k)
    for row in ds.map_batches(
        partial, batch_format="pyarrow"
    ).iter_rows():
        out.bits |= np.frombuffer(row["bitmap"], np.uint64)
    return out
