"""L1 DEFLATE compression + incompressible passthrough (M1/M2/M10).

Reference semantics: DEFLATE level 9 over the stream (README.md:288,
1164-1167, 2349-2412) with an incompressible-data passthrough — random /
already-compressed content is stored as-is at ratio 1:1
(README.md:2138-2145).

Deliberate semantic difference (SURVEY.md section 7.4): the reference
shares one 1 MB sliding window across the WHOLE stream, which is
inherently sequential; we compress per record, which is embarrassingly
parallel and leaves the dedup-recall north metric unaffected (chunk
identity is computed on defined content, not on the compressed stream).
"""

from __future__ import annotations

import zlib

from hmse_ray.config import Config, DEFAULT_CONFIG

# store_kind values for the compression envelope (distinct from the
# full/pointer/delta chunk trichotomy in delta.py)
COMPRESSED = 1
STORED = 0  # incompressible passthrough


def compress_record(data: bytes, cfg: Config = DEFAULT_CONFIG) -> tuple[bytes, int]:
    """Compress one record; passthrough when compression does not help.

    Returns (payload, envelope) where envelope is COMPRESSED or STORED.
    """
    comp = zlib.compress(data, cfg.deflate_level)
    if len(comp) >= len(data):
        return data, STORED
    return comp, COMPRESSED


def decompress_record(payload: bytes, envelope: int) -> bytes:
    if envelope == STORED:
        return payload
    return zlib.decompress(payload)
