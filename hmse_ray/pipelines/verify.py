"""Read-path reconstruction + per-row invariant (M2/M8/M9, J4).

Reference trace (README.md:1617-1693): query -> chunk map -> per record
one of three paths: Full (read + inflate), Pointer (redirect), Delta
(read base + apply + inflate) -> verify checksum -> reassemble. The
lossless criterion is SHA-256(D(C(x))) == SHA-256(x)
(VALIDATION_METHODS.md:257, 408-410).

Graft per-row invariant (BASELINE.json input_hint): byte-exact caption
equality for every row, decoded-pixel equality for lossless image
formats, PSNR >= 40 dB for lossy formats.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hmse_ray.config import Config, DEFAULT_CONFIG
from hmse_ray.functions import compress, delta, imagecodec


def _reconstruct_batch(batch: pa.Table, cfg: Config) -> pa.Table:
    kinds = batch["store_kind"].to_pylist()
    payloads = batch["caption_payload"].to_pylist()
    envs = batch["caption_env"].to_pylist()
    cpayloads = batch["canon_payload"].to_pylist()
    cenvs = batch["canon_env"].to_pylist()
    out = []
    for kind, pl, env, cpl, cenv in zip(kinds, payloads, envs, cpayloads, cenvs):
        base = compress.decompress_record(cpl, cenv)
        if kind == delta.KIND_POINTER:
            out.append(base)
        elif kind == delta.KIND_DELTA:
            out.append(delta.delta_apply(base, pl))
        else:
            out.append(compress.decompress_record(pl, env))
    return pa.table(
        {
            "image_id": batch["image_id"],
            "caption_restored": pa.array([b.decode() for b in out], pa.string()),
            "image_payload": batch["image_payload"],
            "canon_image": batch["canon_image"],
            "fmt": batch["fmt"],
            "w": batch["w"],
            "h": batch["h"],
        }
    )


def reconstruct(store_ds, cfg: Config = DEFAULT_CONFIG, num_partitions: int | None = None):
    """store table -> (image_id, caption_restored, restored image bytes).

    J4 analog: each member row joins its cluster-canonical payload
    (pointer redirect / delta base fetch), then a stateless apply map.
    """
    import pyarrow.compute as pc

    from hmse_ray.util import join_partitions

    num_partitions = num_partitions or join_partitions()
    canon = store_ds.map_batches(
        lambda t: t.filter(pc.equal(t["image_id"], t["cluster_id"])),
        batch_format="pyarrow",
    ).select_columns(
        ["cluster_id", "caption_payload", "caption_env", "image_payload"]
    ).rename_columns(
        {
            "caption_payload": "canon_payload",
            "caption_env": "canon_env",
            "image_payload": "canon_image",
        }
    )
    j = store_ds.join(
        canon, join_type="inner", num_partitions=num_partitions, on=("cluster_id",)
    )
    return j.map_batches(lambda t: _reconstruct_batch(t, cfg), batch_format="pyarrow")


def verify_invariant(restored_ds, images_ds, cfg: Config = DEFAULT_CONFIG,
                     num_partitions: int | None = None):
    """M9: join restored rows with originals; per-row invariant checks.

    Returns a one-row Dataset: n_rows, caption_pass, pixel_pass,
    min_psnr (inf -> 1e9 sentinel for finite aggregation).
    """
    from hmse_ray.util import join_partitions

    num_partitions = num_partitions or join_partitions()
    orig = images_ds.select_columns(["image_id", "caption", "bytes"]).rename_columns(
        {"caption": "caption_orig", "bytes": "bytes_orig"}
    )
    j = restored_ds.join(
        orig, join_type="inner", num_partitions=num_partitions, on=("image_id",)
    )

    def check(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cap_ok = pix_ok = 0
        min_psnr = float("inf")
        for i in range(n):
            cap_ok += batch["caption_restored"][i].as_py() == batch["caption_orig"][i].as_py()
            fmt = batch["fmt"][i].as_py()
            w, h = batch["w"][i].as_py(), batch["h"][i].as_py()
            stored = batch["image_payload"][i].as_py()
            if stored is None:  # pointer -> canonical image bytes
                stored = batch["canon_image"][i].as_py()
            orig_px = imagecodec.decode(batch["bytes_orig"][i].as_py(), w, h, fmt)
            got_px = imagecodec.decode(stored, w, h, fmt)
            if imagecodec.is_lossless(fmt):
                ok = bool((orig_px == got_px).all())
                p = float("inf") if ok else imagecodec.psnr(orig_px, got_px)
            else:
                p = imagecodec.psnr(orig_px, got_px)
                ok = p >= cfg.psnr_min_db
            pix_ok += ok
            min_psnr = min(min_psnr, p)
        return pa.table(
            {
                "n_rows": pa.array([n], pa.int64()),
                "caption_pass": pa.array([cap_ok], pa.int64()),
                "pixel_pass": pa.array([pix_ok], pa.int64()),
                "min_psnr": pa.array(
                    [min(min_psnr, 1e9)], pa.float64()
                ),
            }
        )

    from ray.data.aggregate import Min, Sum

    parts = j.map_batches(check, batch_format="pyarrow")
    return parts.aggregate(
        Sum("n_rows", alias_name="n_rows"),
        Sum("caption_pass", alias_name="caption_pass"),
        Sum("pixel_pass", alias_name="pixel_pass"),
        Min("min_psnr", alias_name="min_psnr"),
    )


def roundtrip(images_ds, clusters_ds, cfg: Config = DEFAULT_CONFIG,
              num_partitions: int | None = None):
    """Full encode -> store -> reconstruct -> verify loop; returns the
    aggregate invariant dict."""
    from hmse_ray.stages import store as store_stage

    st = store_stage.store_table(images_ds, clusters_ds, cfg, num_partitions)
    rec = reconstruct(st, cfg, num_partitions)
    return verify_invariant(rec, images_ds, cfg, num_partitions)
