"""L4 delta encoding: near-duplicate records stored as diffs vs a base.

Reference semantics (README.md:1402-1427, 2160-2189): a chunk whose LSH
candidate passes similarity verification is stored as a binary delta
against its base chunk, but only if the delta is <= 20% of the original
size (README.md:2175); otherwise it is stored full. Exact duplicates are
stored as pointer records (README.md:1210, 1311-1313). Stored-chunk
trichotomy: FULL / POINTER / DELTA (README.md:1634-1669).

Two fast encoders, smallest wins (1-byte format tag), plus a
suffix-array second chance:

* OPS (tag 0x02) — greedy substring matching against the base, the same
  copy/insert role bsdiff's suffix-array search plays in the reference
  (bsdiff/xdelta3 are not installed here): an 8-byte rolling-window
  hash index over every base offset (built vectorized), greedy longest
  match per target position with forward byte extension, COPY/INSERT
  ops varint-serialized and DEFLATE-compressed. The scan loop advances
  by the match length, so iterations ~ O(unmatched bytes + ops) for
  near-duplicate inputs.
* ZDICT (tag 0x01) — zlib with the base as preset dictionary (LZ77
  longest-match against a 32 KB window of the base); wins for tiny
  inputs where op framing overhead dominates.
* OPS via SUFFIX ARRAY (same tag 0x02 / same op format) — bsdiff's
  actual search structure (README.md:1402: qsufsort longest-match):
  a Manber–Myers suffix array over the base, exact longest match per
  target position (functions/suffixarray.py). TRUE longest matches
  beat the hash encoder's 8-candidate/8-byte-seed approximation, at
  O(n log n) build cost per pair — so it runs only as a SECOND CHANCE
  when both fast encoders miss the 20% delta bound (a would-be FULL
  row is the only case where the extra work can change the outcome).

Deterministic, and apply() inverts all paths exactly.
"""

from __future__ import annotations

import zlib

import numpy as np

from hmse_ray.config import Config, DEFAULT_CONFIG

KIND_FULL = "full"
KIND_POINTER = "pointer"
KIND_DELTA = "delta"

_TAG_ZDICT = b"\x01"
_TAG_OPS = b"\x02"

_W = 8  # match-seed window bytes
_MIN_COPY = 12  # shortest copy worth an op
_MAX_CANDS = 8  # candidate base positions probed per seed hash


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not (b & 0x80):
            return n, i
        shift += 7


def _window_hashes(a: np.ndarray) -> np.ndarray:
    """uint64 hash of every _W-byte window (vectorized shifted view)."""
    n = a.size - _W + 1
    h = np.zeros(n, dtype=np.uint64)
    for off in range(_W):
        h = h * np.uint64(0x100000001B3) + a[off : off + n].astype(np.uint64)
    return h


def _encode_ops(base: bytes, target: bytes) -> bytes | None:
    """Greedy copy/insert diff; None when inputs are too small to index."""
    if len(base) < _W or len(target) < _W:
        return None
    ab = np.frombuffer(base, dtype=np.uint8)
    at = np.frombuffer(target, dtype=np.uint8)
    bh = _window_hashes(ab)
    order = np.argsort(bh, kind="stable")
    bh_sorted = bh[order]
    th = _window_hashes(at)
    # candidate range per target position, precomputed vectorized
    left = np.searchsorted(bh_sorted, th, side="left")
    right = np.searchsorted(bh_sorted, th, side="right")
    nt, nb = len(target), len(base)
    ops = bytearray()
    ins_start = 0  # start of the pending insert run
    i = 0
    t_end = nt - _W + 1
    from hmse_ray.functions.suffixarray import _match_len

    while i < t_end:
        lo, hi = left[i], min(right[i], left[i] + _MAX_CANDS)
        best_len = 0
        best_pos = 0
        tail = nt - i  # no candidate can match past the target's end
        for k in range(lo, hi):
            p = int(order[k])
            # verify + extend forward (vectorized mismatch scan — the
            # old per-byte while loop cost ~10 ms per 16 KB pair)
            m = _match_len(base, p, target, i)
            if m > best_len:
                best_len, best_pos = m, p
                if m >= tail:  # matched to the end: nothing can beat it
                    break
        if best_len >= _MIN_COPY:
            if ins_start < i:  # flush pending insert
                seg = target[ins_start:i]
                ops += b"\x00" + _varint(len(seg)) + seg
            ops += b"\x01" + _varint(best_pos) + _varint(best_len)
            i += best_len
            ins_start = i
        else:
            i += 1
    if ins_start < nt:
        seg = target[ins_start:]
        ops += b"\x00" + _varint(len(seg)) + seg
    return zlib.compress(bytes(ops), 9)


def _apply_ops(base: bytes, blob: bytes) -> bytes:
    ops = zlib.decompress(blob)
    out = bytearray()
    i = 0
    while i < len(ops):
        tag = ops[i]
        i += 1
        if tag == 0:  # insert
            ln, i = _read_varint(ops, i)
            out += ops[i : i + ln]
            i += ln
        else:  # copy
            pos, i = _read_varint(ops, i)
            ln, i = _read_varint(ops, i)
            out += base[pos : pos + ln]
    return bytes(out)


def _encode_ops_sa(base: bytes, target: bytes) -> bytes | None:
    """Suffix-array greedy copy/insert diff (exact longest matches —
    bsdiff's search, README.md:1402). Same serialized op format as
    _encode_ops, so _apply_ops inverts it."""
    if len(base) < _MIN_COPY or len(target) < 1:
        return None
    from hmse_ray.functions import suffixarray

    sa = suffixarray.build(base)
    nt = len(target)
    ops = bytearray()
    ins_start = 0
    i = 0
    while i < nt:
        pos, ln = suffixarray.longest_match(base, sa, target, i)
        if ln >= _MIN_COPY:
            if ins_start < i:
                seg = target[ins_start:i]
                ops += b"\x00" + _varint(len(seg)) + seg
            ops += b"\x01" + _varint(pos) + _varint(ln)
            i += ln
            ins_start = i
        else:
            i += max(1, ln // 2)  # skip ahead past short partial matches
    if ins_start < nt:
        seg = target[ins_start:]
        ops += b"\x00" + _varint(len(seg)) + seg
    return zlib.compress(bytes(ops), 9)


def _encode_zdict(base: bytes, target: bytes, cfg: Config) -> bytes:
    c = zlib.compressobj(cfg.deflate_level, zlib.DEFLATED, 15, 9, zlib.Z_DEFAULT_STRATEGY, base)
    return c.compress(target) + c.flush()


def delta_encode(base: bytes, target: bytes, cfg: Config = DEFAULT_CONFIG) -> bytes | None:
    """Binary delta of target vs base (smallest encoder wins), or None
    if it misses the 20% bound. When both fast encoders miss the bound,
    the suffix-array encoder (exact longest matches) gets one attempt
    before the row falls back to FULL storage."""
    z = _TAG_ZDICT + _encode_zdict(base, target, cfg)
    o = _encode_ops(base, target)
    d = z if o is None or len(z) <= len(o) + 1 else _TAG_OPS + o
    bound = cfg.delta_threshold * max(1, len(target))
    if len(d) <= bound:
        return d
    s = _encode_ops_sa(base, target)
    if s is not None and len(s) + 1 <= bound:
        return _TAG_OPS + s
    return None


def delta_apply(base: bytes, delta: bytes) -> bytes:
    """Reconstruct target from (base, delta) — read-path M8.

    Format (since round 3 / ADVICE r2): byte 0 is a tag — 0x01 zdict
    stream follows, 0x02 copy/insert op stream follows. Blobs written
    by the round-1 UNTAGGED zdict encoder start with the zlib header
    0x78 and are decompressed WHOLE as a legacy fallback, so stores
    persisted before the tag was introduced remain readable; any other
    leading byte is a corrupt delta and raises."""
    tag, blob = delta[:1], delta[1:]
    if tag == _TAG_OPS:
        return _apply_ops(base, blob)
    if tag == _TAG_ZDICT:
        d = zlib.decompressobj(15, base)
        return d.decompress(blob) + d.flush()
    if tag == b"\x78":  # legacy untagged zdict stream (zlib header)
        d = zlib.decompressobj(15, base)
        return d.decompress(delta) + d.flush()
    raise ValueError(f"unknown delta format tag {delta[:1]!r}")


def choose_store_kind(
    target: bytes,
    is_exact_dup: bool,
    base: bytes | None,
    cfg: Config = DEFAULT_CONFIG,
) -> tuple[str, bytes | None]:
    """The trichotomy decision: (store_kind, delta_bytes_or_None)."""
    if is_exact_dup:
        return KIND_POINTER, None
    if base is not None:
        d = delta_encode(base, target, cfg)
        if d is not None:
            return KIND_DELTA, d
    return KIND_FULL, None
