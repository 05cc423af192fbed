"""L1 DEFLATE compression + incompressible passthrough (M1/M2/M10).

Reference semantics: DEFLATE level 9 over the stream (README.md:288,
1164-1167, 2349-2412) with an incompressible-data passthrough — random /
already-compressed content is stored as-is at ratio 1:1
(README.md:2138-2145).

Semantic difference vs the reference, and its Ray-native analog
(SURVEY.md section 7.4): the reference shares one 1 MB sliding window
across the WHOLE stream, which is inherently sequential. The default
here compresses per record — embarrassingly parallel, dedup-recall
unaffected (chunk identity is computed on decoded content, not the
compressed stream). The SHARED-DICTIONARY path (round 4, T3) recovers
the cross-record redundancy the sequential window exploits without the
sequential dependency: train one <= 1 MB preset dictionary per
partition key (source) from a deterministic record sample, broadcast
it once (ray.put), and compress every record against it
(zlib zdict = LZ77 matches into the dictionary, the same mechanism as
the reference's window, minus ordering sensitivity).
"""

from __future__ import annotations

import zlib

from hmse_ray.config import Config, DEFAULT_CONFIG

# store_kind values for the compression envelope (distinct from the
# full/pointer/delta chunk trichotomy in delta.py)
COMPRESSED = 1
STORED = 0  # incompressible passthrough
COMPRESSED_DICT = 2  # compressed against a shared preset dictionary

DICT_MAX_BYTES = 1 << 20  # the reference's 1 MB shared window (T3)


def compress_record(data: bytes, cfg: Config = DEFAULT_CONFIG) -> tuple[bytes, int]:
    """Compress one record; passthrough when compression does not help.

    Returns (payload, envelope) where envelope is COMPRESSED or STORED.
    """
    comp = zlib.compress(data, cfg.deflate_level)
    if len(comp) >= len(data):
        return data, STORED
    return comp, COMPRESSED


def decompress_record(payload: bytes, envelope: int,
                      zdict: bytes | None = None) -> bytes:
    if envelope == STORED:
        return payload
    if envelope == COMPRESSED_DICT:
        if zdict is None:
            raise ValueError("COMPRESSED_DICT payload needs its dictionary")
        d = zlib.decompressobj(zdict=zdict)
        return d.decompress(payload) + d.flush()
    return zlib.decompress(payload)


def train_dictionary(samples: list[bytes],
                     max_bytes: int = DICT_MAX_BYTES) -> bytes:
    """Shared preset dictionary from sample records: concatenation,
    most-recent-last truncated to ``max_bytes`` (zlib scores matches
    anywhere in the preset window, so concatenation of representative
    records is the standard zdict construction). Deterministic in the
    sample order the caller fixes."""
    buf = b"".join(samples)
    return buf[-max_bytes:]


def compress_record_dict(data: bytes, zdict: bytes,
                         cfg: Config = DEFAULT_CONFIG) -> tuple[bytes, int]:
    """Compress one record against a shared dictionary; falls back to
    the better of plain/stored when the dictionary does not help."""
    c = zlib.compressobj(cfg.deflate_level, zlib.DEFLATED, 15, 9,
                         zlib.Z_DEFAULT_STRATEGY, zdict)
    with_dict = c.compress(data) + c.flush()
    plain, env = compress_record(data, cfg)
    if len(with_dict) < len(plain):
        return with_dict, COMPRESSED_DICT
    return plain, env
