"""L2+L3 map side: FastCDC chunk explode + SHA-256 per chunk (M3+M4 fused).

Reference trace (README.md:1531-1539): the Rabin scan cuts
content-defined boundaries, then each chunk is SHA-256 hashed. We fuse
both into ONE map_batches stage so chunk bytes never cross a stage
boundary unnecessarily (SURVEY.md section 7.4 "wide binary rows").

Input batch:  image table columns (image_id, caption [, ...])
Output batch: chunk rows (image_id, chunk_idx, sha256, chunk_len
              [, chunk_bytes if keep_bytes]) — 1 input row explodes to
              N output rows (Ray map_batches supports variable fan-out).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from hmse_ray.config import Config, DEFAULT_CONFIG
from hmse_ray.functions import fastcdc


def make_chunker(cfg: Config = DEFAULT_CONFIG, keep_bytes: bool = False,
                 text_col: str = "caption", id_col: str = "image_id"):
    """Build the map_batches body (stateless task — chunking is a pure
    function of content; no actor state needed)."""

    def chunk_batch(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        take_idx: list[int] = []  # input-row index per output chunk row
        out_idx: list[int] = []
        out_sha: list[str] = []
        out_len: list[int] = []
        out_bytes: list[bytes] = []
        for ri, text in enumerate(texts):
            data = text.encode() if isinstance(text, str) else (text or b"")
            bounds = fastcdc.chunk_boundaries(data, cfg)
            if not bounds:
                # empty/NULL text: one zero-length chunk, so the row
                # stays visible to the dedup index and the per-doc
                # chunk counts match the SQL oracles (which count every
                # document row); silently emitting nothing made empty
                # docs vanish from the pipeline entirely
                bounds = [(0, 0)]
            for ci, (off, ln) in enumerate(bounds):
                cb = data[off : off + ln]
                take_idx.append(ri)
                out_idx.append(ci)
                out_sha.append(hashlib.sha256(cb).hexdigest())
                out_len.append(ln)
                if keep_bytes:
                    out_bytes.append(cb)
        # id column keeps the input column's name AND type (doc_id int64
        # or image_id string alike)
        ids = batch[id_col].take(pa.array(take_idx, pa.int64()))
        cols = {
            id_col: ids,
            "chunk_idx": pa.array(out_idx, pa.int32()),
            "sha256": pa.array(out_sha, pa.string()),
            "chunk_len": pa.array(out_len, pa.int32()),
        }
        if keep_bytes:
            cols["chunk_bytes"] = pa.array(out_bytes, pa.binary())
        return pa.table(cols)

    return chunk_batch


def chunk_stage(ds, cfg: Config = DEFAULT_CONFIG, keep_bytes: bool = False,
                text_col: str = "caption", id_col: str = "image_id",
                batch_size: int = 1024):
    """documents/images Dataset -> chunks Dataset (narrow: no payload
    columns survive unless keep_bytes)."""
    return ds.map_batches(
        make_chunker(cfg, keep_bytes, text_col, id_col),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
