"""Suffix-array substring matching (north-rule capability; M7 kin).

The reference's only substring-matching machinery is bsdiff's
suffix-array longest-match search inside the L4 delta encoder
(README.md:1402 — qsufsort over the base chunk, binary-search longest
match per target offset). This module provides that capability as a
standalone, dependency-free kernel used in two places:

* ``substring_dup_pairs`` (pipelines/queries.py): near-identical
  caption/document detection — texts wholly contained in another text —
  where each candidate sup document builds ONE suffix array probed by
  all its candidate subs (``find``);
* the L4 delta encoder (functions/delta.py): a bsdiff-shaped
  copy/insert encoder (``longest_match`` per target position) used as a
  second chance when the fast rolling-hash encoder misses the 20%%
  delta bound.

Construction is Manber–Myers prefix doubling (public algorithm,
"Suffix arrays: a new method for on-line string searches", SODA'90)
vectorized with numpy lexsort — O(n log n) passes, no Python loop over
positions. Search compares python ``bytes`` slices (C memcmp), O(|q|
log n) per probe.
"""

from __future__ import annotations

import numpy as np

_EMPTY_SA = np.empty(0, dtype=np.int64)


def build(data: bytes) -> np.ndarray:
    """Suffix array of ``data``: int64 start offsets of all suffixes in
    lexicographic order (Manber–Myers prefix doubling over numpy)."""
    n = len(data)
    if n == 0:
        return _EMPTY_SA
    rank = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    if n == 1:
        return np.zeros(1, dtype=np.int64)
    k = 1
    # no initial argsort: the first loop iteration's lexsort computes
    # the k=1 order from scratch (an up-front sort was pure dead work
    # on this per-near-dup-pair hot path)
    order = _EMPTY_SA
    while k < n:
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        r1, r2 = rank[order], second[order]
        newly = np.empty(n, dtype=bool)
        newly[0] = True
        newly[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        rank = np.empty(n, dtype=np.int64)
        rank[order] = np.cumsum(newly) - 1
        if rank[order[-1]] == n - 1:  # all ranks distinct: done
            break
        k *= 2
    return order.astype(np.int64)


def find(data: bytes, sa: np.ndarray, needle: bytes) -> int:
    """Offset of one occurrence of ``needle`` in ``data`` (the
    lexicographically first suffix match), or -1. O(|needle| log n)."""
    if not needle:
        return 0
    lo, hi = 0, len(sa)
    m = len(needle)
    while lo < hi:  # first suffix >= needle
        mid = (lo + hi) // 2
        p = int(sa[mid])
        if data[p : p + m] < needle:
            lo = mid + 1
        else:
            hi = mid
    if lo < len(sa):
        p = int(sa[lo])
        if data[p : p + m] == needle:
            return p
    return -1


def _match_len(data: bytes, p: int, target: bytes, i: int) -> int:
    """Length of the common prefix of data[p:] and target[i:]
    (vectorized mismatch scan)."""
    limit = min(len(data) - p, len(target) - i)
    if limit <= 0:
        return 0
    a = np.frombuffer(data, dtype=np.uint8, count=limit, offset=p)
    b = np.frombuffer(target, dtype=np.uint8, count=limit, offset=i)
    ne = a != b
    return int(np.argmax(ne)) if ne.any() else limit


def longest_match(data: bytes, sa: np.ndarray, target: bytes, i: int,
                  probe: int = 24) -> tuple[int, int]:
    """(pos, length) of the longest prefix of ``target[i:]`` occurring
    anywhere in ``data`` — bsdiff's per-offset search. Binary-search to
    the insertion point with a bounded probe prefix (memcmp), then take
    the better common-prefix length of the two neighbours."""
    n = len(sa)
    if n == 0 or i >= len(target):
        return 0, 0
    q = target[i : i + probe]
    lo, hi = 0, n
    m = len(q)
    while lo < hi:
        mid = (lo + hi) // 2
        p = int(sa[mid])
        if data[p : p + m] < q:
            lo = mid + 1
        else:
            hi = mid
    best_pos = best_len = 0
    for j in (lo - 1, lo):
        if 0 <= j < n:
            p = int(sa[j])
            ln = _match_len(data, p, target, i)
            if ln > best_len:
                best_pos, best_len = p, ln
    # a probe-length tie means the true longest match may sit deeper in
    # the equal-prefix run; walk it while the probe still fully matches.
    # The walk is capped so degenerate self-similar data (single-byte
    # runs) stays O(cap * match) per position — a capped walk can only
    # yield a shorter-than-optimal (still valid) copy op.
    if best_len >= probe:
        for j in range(lo + 1, min(lo + 1 + 64, n)):
            p = int(sa[j])
            if data[p : p + m] != q:
                break
            ln = _match_len(data, p, target, i)
            if ln > best_len:
                best_pos, best_len = p, ln
    return best_pos, best_len
