"""T1/T2 signature signers — stateful actor-pool stages.

Reference analog: L4 computes one MinHash signature per record with a
fixed table of 128 hash functions (README.md:2571-2598); the graft adds
a pixel-domain SimHash (BASELINE.json north_star). Both signers hold
their permutation/projection tables as ACTOR STATE, built once per actor
in __init__ and reused across batches (north_rule: "actor pools holding
permutation tables").

Usage:  ds.map_batches(MinHashSigner(cfg_kwargs...), concurrency=N, ...)
        — pass the CLASS (or ray.data's callable-class form) so Ray
        builds an actor pool; construction args go via fn_constructor_kwargs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hmse_ray.config import Config, DEFAULT_CONFIG
from hmse_ray.functions import imagecodec, minhash, simhash


class MinHashSigner:
    """Caption MinHash: text -> 128-component signature + 4 band hashes.

    Emits narrow rows: input id columns + minhash (fixed-size list) and
    band_h0..band_h3 (uint64 as int64) — the bulky signature stays
    columnar; band hashes are split into plain columns so the LSH
    band-explode stage needs no list manipulation.
    """

    def __init__(self, cfg: Config = DEFAULT_CONFIG, text_col: str = "caption",
                 keep_cols: tuple[str, ...] = ("image_id",)):
        self.cfg = cfg
        self.text_col = text_col
        self.keep_cols = keep_cols
        # permutation table state (seeds) built once per actor
        self.seeds = minhash.seeds_for(cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = [
            t.encode() if isinstance(t, str) else (t or b"")
            for t in batch[self.text_col].to_pylist()
        ]
        sigs = minhash.signatures(docs, self.cfg)  # (rows, 128) uint32
        bands = minhash.band_hashes(sigs, self.cfg)  # (rows, b) uint64
        cols = {c: batch[c] for c in self.keep_cols}
        cols["minhash"] = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.ravel(), pa.uint32()), self.cfg.num_hashes
        )
        for b in range(self.cfg.num_bands):
            cols[f"band_h{b}"] = pa.array(bands[:, b].view(np.int64), pa.int64())
        return pa.table(cols)


class SimHashSigner:
    """Image SimHash: decode pixels -> seeded projection -> 64-bit simhash.

    Holds the (64 x grid^2) projection matrix as actor state. Decoding
    uses the engine codec (imagecodec — PIL-gated stub for real formats).
    Also recomputes phash for rows missing it.
    """

    def __init__(self, cfg: Config = DEFAULT_CONFIG,
                 keep_cols: tuple[str, ...] = ("image_id",)):
        self.cfg = cfg
        self.keep_cols = keep_cols
        self.proj = simhash.projection_matrix(cfg)  # built once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        sims = np.empty(len(blobs), dtype=np.int64)
        for i, (b, w, h, f) in enumerate(zip(blobs, ws, hs, fmts)):
            px = imagecodec.decode(b, w, h, f)
            sims[i] = simhash.simhash64(px, self.proj, self.cfg)
        cols = {c: batch[c] for c in self.keep_cols}
        cols["simhash"] = pa.array(sims, pa.int64())
        if "phash" in batch.column_names:
            cols["phash"] = batch["phash"]
        return pa.table(cols)


def _default_pool() -> tuple[int, int]:
    from hmse_ray.util import cluster_cpus

    cpus = cluster_cpus()
    # The two signer chains run SEQUENTIALLY in the flagship (the tiny
    # pair table is materialized between them), so each pool may take
    # the whole cluster. min=cpus/2 skips the slow autoscaler ramp
    # (measured 28.4s -> 22.6s on a 200k-row sign at 16 CPUs) while
    # leaving half the CPUs for the read tasks; a FULL-size fixed pool
    # instead starves the upstream read (measured effectively hung).
    return (max(1, cpus // 2), max(2, cpus))


def minhash_stage(ds, cfg: Config = DEFAULT_CONFIG, *, text_col="caption",
                  keep_cols=("image_id",), concurrency=None, batch_size: int = 512):
    """Attach MinHash signatures via an actor pool (narrow projection first).

    concurrency defaults to an autoscaling pool sized to the cluster
    (1..all CPUs) — the signer chains run sequentially in the flagship,
    so each pool gets the whole cluster while it is active.
    """
    concurrency = concurrency or _default_pool()
    ds = ds.select_columns(list(dict.fromkeys(keep_cols + (text_col,))))
    return ds.map_batches(
        MinHashSigner,
        fn_constructor_kwargs={"cfg": cfg, "text_col": text_col, "keep_cols": keep_cols},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def simhash_stage(ds, cfg: Config = DEFAULT_CONFIG, *, keep_cols=("image_id",),
                  concurrency=None, batch_size: int = 256):
    """Attach image SimHash via an actor pool (bytes stay in this stage)."""
    concurrency = concurrency or _default_pool()
    need = list(dict.fromkeys(keep_cols + ("bytes", "w", "h", "fmt", "phash")))
    ds = ds.select_columns([c for c in need if c in ds.schema().names])
    return ds.map_batches(
        SimHashSigner,
        fn_constructor_kwargs={"cfg": cfg, "keep_cols": keep_cols},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
