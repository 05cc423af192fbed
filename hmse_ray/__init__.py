"""hmse_ray — a Ray-Data-native near-duplicate detection + clustering engine.

A from-scratch reimplementation of the capabilities of the HMSE reference
specification (/root/reference: README.md, VALIDATION_METHODS.md) as an
idiomatic Ray Data streaming pipeline over Arrow batches:

  L1 compress -> L2 FastCDC chunking -> L3 SHA-256 exact dedup ->
  L4 MinHash/SimHash LSH near-dup clustering + delta encoding

over tables of image + caption pairs
(image_id, bytes, w, h, fmt, caption, phash).

Library code never calls ray.init()/ray.shutdown(); sessions are owned by
the driver, bench.py, and the pytest fixture.
"""

from hmse_ray.config import Config, DEFAULT_CONFIG

__all__ = ["Config", "DEFAULT_CONFIG"]
__version__ = "0.1.0"
