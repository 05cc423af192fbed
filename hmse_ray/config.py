"""Engine configuration with the reference defaults.

Every tunable named by the reference spec is captured here so each operator
is a pure function of (content, config) — the determinism requirement of
VALIDATION_METHODS.md:125-128 ("rerunning with same seeds must produce
identical chunk boundaries, compression ratios, and index sizes").

Reference defaults (citations into /root/reference):
  - FastCDC chunking: min 1024 / avg 4096 / max 16384 bytes, boundary mask
    4095 (README.md:289, 1207-1208, 2444-2507)
  - Shingle width 4 bytes (README.md:1349-1357, 2584-2586)
  - MinHash: n=128 hash functions, deterministic seeds 1..128,
    MurmurHash3_x86_32 (README.md:2571-2598; VALIDATION_METHODS.md:122)
  - LSH banding: b=4 bands x r=32 rows (README.md:1929-1945)
  - Delta threshold: store delta only if <= 20% of original
    (README.md:2175)
  - DEFLATE level 9 (README.md:288, 1164-1167)
  - Sampling seed 42 (VALIDATION_METHODS.md:119-120)
  - PSNR >= 40 dB per-row invariant for lossy image formats
    (BASELINE.json input_hint)
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass(frozen=True)
class Config:
    # --- L2 FastCDC chunking ---
    chunk_min: int = 1024
    chunk_avg: int = 4096
    chunk_max: int = 16384
    rabin_mask: int = 4095  # cut when rolling_hash & mask == 0 -> avg 4096
    gear_seed: int = 1  # seed for the deterministic gear table

    # --- L4 MinHash / shingling ---
    shingle_size: int = 4
    num_hashes: int = 128
    minhash_seed_base: int = 1  # seeds are minhash_seed_base .. base+n-1 (1..128)

    # --- LSH banding ---
    num_bands: int = 4
    rows_per_band: int = 32  # num_bands * rows_per_band == num_hashes
    band_hash_seed: int = 0x9747B28C
    # Hot-bucket skew handling (SURVEY.md section 4.1): buckets larger than
    # this are salted into ceil(size/max_bucket_size) sub-buckets, each
    # compared against the bucket's representative set.
    max_bucket_size: int = 256

    # --- Similarity thresholds ---
    jaccard_threshold: float = 0.80  # candidate pair accepted if est >= this
    simhash_hamming_threshold: int = 6  # image near-dup if hamming(sim) <= this
    delta_threshold: float = 0.20  # delta stored only if <= 20% of original

    # --- L1 compression ---
    deflate_level: int = 9

    # --- SimHash (image payload) ---
    simhash_bits: int = 64
    simhash_grid: int = 16  # luma downsample grid (16x16 = 256 features)
    simhash_seed: int = 0x5EED51A7
    simhash_bands: int = 4  # LSH bands over the 64-bit simhash (16 bits each)

    # --- Suffix-array substring matching (north-rule capability) ---
    # When True, cluster_assignments additionally links caption pairs
    # where one caption is wholly contained in the other (winnowed
    # candidates -> per-sup suffix array, pipelines/queries.py:
    # substring_dup_docs). Off by default: containment is a DIFFERENT
    # duplicate relation than the golden fixture's jaccard/hamming
    # clusters, so the flagship recall/precision gates pin the default
    # graph shape; enable for corpora where truncated near-identical
    # captions should merge (crawl snippets, alt-text prefixes).
    substring_captions: bool = False

    # --- Invariants ---
    psnr_min_db: float = 40.0

    # --- Determinism / sampling ---
    sample_seed: int = 42

    # --- Partitioning / checkpointing ---
    num_partitions: int = 8  # hash(image_id) % P resumable partitions

    # --- Layer ablation flags (VALIDATION_METHODS.md:458-464) ---
    enable_l1: bool = True  # compression accounting
    enable_l2: bool = True  # content-defined chunking
    enable_l3: bool = True  # exact dedup
    enable_l4: bool = True  # near-dup LSH + delta

    def with_overrides(self, **kw) -> "Config":
        return replace(self, **kw)

    def __post_init__(self):
        if self.num_bands * self.rows_per_band != self.num_hashes:
            raise ValueError(
                f"num_bands*rows_per_band ({self.num_bands}*{self.rows_per_band}) "
                f"must equal num_hashes ({self.num_hashes})"
            )
        if not (self.chunk_min <= self.chunk_avg <= self.chunk_max):
            raise ValueError("chunk sizes must satisfy min <= avg <= max")


DEFAULT_CONFIG = Config()

# Named ablation configs mirroring VALIDATION_METHODS.md:458-464.
ABLATION_CONFIGS = {
    "full": DEFAULT_CONFIG,
    "l1_only": DEFAULT_CONFIG.with_overrides(enable_l2=False, enable_l3=False, enable_l4=False),
    "l1_l2_l3": DEFAULT_CONFIG.with_overrides(enable_l4=False),
    "l4_only": DEFAULT_CONFIG.with_overrides(enable_l1=False, enable_l3=False),
    "no_l1": DEFAULT_CONFIG.with_overrides(enable_l1=False),
}
