"""L4 delta encoding: near-duplicate records stored as diffs vs a base.

Reference semantics (README.md:1402-1427, 2160-2189): a chunk whose LSH
candidate passes similarity verification is stored as a binary delta
against its base chunk, but only if the delta is <= 20% of the original
size (README.md:2175); otherwise it is stored full. Exact duplicates are
stored as pointer records (README.md:1210, 1311-1313). Stored-chunk
trichotomy: FULL / POINTER / DELTA (README.md:1634-1669).

Encoder: zlib with the base as preset dictionary (``zdict``) — the
standard library's substring-matching machinery (LZ77 longest-match
against the base, the same role bsdiff's suffix-array search plays in
the reference; bsdiff/xdelta3 are not installed in this container).
Deterministic, and apply() inverts it exactly.
"""

from __future__ import annotations

import zlib

from hmse_ray.config import Config, DEFAULT_CONFIG

KIND_FULL = "full"
KIND_POINTER = "pointer"
KIND_DELTA = "delta"


def delta_encode(base: bytes, target: bytes, cfg: Config = DEFAULT_CONFIG) -> bytes | None:
    """Binary delta of target vs base, or None if it misses the 20% bound."""
    c = zlib.compressobj(cfg.deflate_level, zlib.DEFLATED, 15, 9, zlib.Z_DEFAULT_STRATEGY, base)
    d = c.compress(target) + c.flush()
    if len(d) <= cfg.delta_threshold * max(1, len(target)):
        return d
    return None


def delta_apply(base: bytes, delta: bytes) -> bytes:
    """Reconstruct target from (base, delta) — read-path M8."""
    d = zlib.decompressobj(15, base)
    return d.decompress(delta) + d.flush()


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
