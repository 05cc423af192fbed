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
    # FULL rows never touch the canonical payload, and members of one
    # cluster share it — decompress each distinct canonical once per
    # batch instead of once per member row (cache is bounded by the
    # partition's distinct canonicals, each a caption-sized bytes)
    base_cache: dict[bytes, bytes] = {}
    for kind, pl, env, cpl, cenv in zip(kinds, payloads, envs, cpayloads, cenvs):
        if kind != delta.KIND_POINTER and kind != delta.KIND_DELTA:
            out.append(compress.decompress_record(pl, env))
            continue
        base = base_cache.get(cpl)
        if base is None:
            base = base_cache[cpl] = compress.decompress_record(cpl, cenv)
        out.append(base if kind == delta.KIND_POINTER
                   else delta.delta_apply(base, pl))
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


def _attach_canon_payloads(t: pa.Table) -> pa.Table:
    """Within a cluster_id partition: gather each row's cluster-canonical
    payload columns (pointer redirect / delta base fetch, J4)."""
    import pyarrow.compute as pc

    from hmse_ray.stages.aggregates import gather_lookup

    canon = t.filter(pc.equal(t["image_id"], t["cluster_id"]))
    return gather_lookup(
        t, "cluster_id",
        canon.select(["cluster_id", "caption_payload", "caption_env", "image_payload"]),
        "cluster_id",
        {
            "caption_payload": "canon_payload",
            "caption_env": "canon_env",
            "image_payload": "canon_image",
        },
    )


def reconstruct(store_ds, cfg: Config = DEFAULT_CONFIG,
                num_partitions: int | None = None,
                est_bytes: int | None = None):
    """store table -> (image_id, caption_restored, restored image bytes).

    One tasks-only hash-partition shuffle on cluster_id (canonical rows
    co-locate with members), then a stateless apply map per partition.
    Dataset.join is deliberately avoided here — see aggregates.py
    copartition_two for the measured hang it caused.
    """
    from hmse_ray.stages.aggregates import hash_partitioned_groupby_arrow

    return hash_partitioned_groupby_arrow(
        store_ds, "cluster_id",
        lambda t: _reconstruct_batch(_attach_canon_payloads(t), cfg),
        num_partitions=num_partitions, est_bytes=est_bytes,
    )


def _check_batch(batch: pa.Table, cfg: Config,
                 n_missing: int = 0) -> pa.Table:
    """Per-row invariant over merged (restored x original) rows -> one
    stats row: n_rows, caption_pass, pixel_pass, min_psnr (inf -> 1e9
    sentinel for finite aggregation), n_missing.

    ``n_missing`` counts rows DROPPED by the inner merge (an original
    with no restored row, or vice versa): without it a verifier whose
    join loses records still reports caption_pass == n_rows — 100%% pass
    over a shrunken universe. Callers must gate on n_missing == 0 too.

    The caption half is a vectorized arrow equality (VERDICT r3 item 6);
    the remaining per-row loop is only decode + PSNR (inherently
    per-row), with the cell columns unboxed ONCE per batch instead of
    an .as_py() per cell."""
    import pyarrow.compute as pc

    n = batch.num_rows
    cap_ok = 0
    if n:
        eq = pc.equal(batch["caption_restored"], batch["caption_orig"])
        cap_ok = int(pc.sum(pc.cast(eq, pa.int64())).as_py() or 0)
    fmts = batch["fmt"].to_pylist()
    ws = batch["w"].to_pylist()
    hs = batch["h"].to_pylist()
    # pointer rows carry no own payload -> canonical image bytes
    stored_col = pc.coalesce(batch["image_payload"], batch["canon_image"]).to_pylist()
    orig_col = batch["bytes_orig"].to_pylist()
    pix_ok = 0
    min_psnr = float("inf")
    for fmt, w, h, stored, orig in zip(fmts, ws, hs, stored_col, orig_col):
        if stored == orig:
            # byte-equal implies pixel-equal under a deterministic
            # decoder (psnr inf, never lowers min) — skip the two
            # decodes that otherwise dominate the verify stage; the
            # decode path below still runs for every differing payload
            pix_ok += 1
            continue
        orig_px = imagecodec.decode(orig, w, h, fmt)
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
            "min_psnr": pa.array([min(min_psnr, 1e9)], pa.float64()),
            "n_missing": pa.array([int(n_missing)], pa.int64()),
        }
    )


def _aggregate_stats(parts_ds):
    from ray.data.aggregate import Min, Sum

    return parts_ds.aggregate(
        Sum("n_rows", alias_name="n_rows"),
        Sum("caption_pass", alias_name="caption_pass"),
        Sum("pixel_pass", alias_name="pixel_pass"),
        Min("min_psnr", alias_name="min_psnr"),
        Sum("n_missing", alias_name="n_missing"),
    )


RESTORED_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("caption_restored", pa.string()),
        ("image_payload", pa.binary()),
        ("canon_image", pa.binary()),
        ("fmt", pa.string()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("caption_orig", pa.string()),
        ("bytes_orig", pa.binary()),
    ]
)


def verify_invariant(restored_ds, images_ds, cfg: Config = DEFAULT_CONFIG,
                     num_partitions: int | None = None):
    """M9: merge restored rows with originals (tasks-only co-partition
    shuffle on image_id, not Dataset.join); per-row invariant checks."""
    from hmse_ray.stages.aggregates import copartition_two, gather_lookup

    orig = images_ds.select_columns(["image_id", "caption", "bytes"]).rename_columns(
        {"caption": "caption_orig", "bytes": "bytes_orig"}
    )

    def merge(left: pa.Table, right: pa.Table) -> pa.Table:
        merged = gather_lookup(
            left.drop_columns(["caption_orig", "bytes_orig"]), "image_id",
            right, "image_id",
            {"caption_orig": "caption_orig", "bytes_orig": "bytes_orig"},
        )
        # ids are unique per side, so the inner merge keeps |L n R| rows;
        # anything else is a lost record the verifier must surface
        miss = left.num_rows + right.num_rows - 2 * merged.num_rows
        return _check_batch(merged, cfg, n_missing=miss)

    parts = copartition_two(
        restored_ds, orig, "image_id", RESTORED_SCHEMA, merge,
        num_partitions=num_partitions,
    )
    return _aggregate_stats(parts)


def roundtrip(images_ds, clusters_ds, cfg: Config = DEFAULT_CONFIG,
              num_partitions: int | None = None,
              est_bytes: int | None = None):
    """Full encode -> store -> reconstruct -> verify loop; returns the
    aggregate invariant dict.

    Fused plan: shuffle 1 attaches cluster_id (co-partition on
    image_id); shuffle 2 hash-partitions by cluster_id; each partition
    then encodes, reconstructs and checks locally in one pass — the
    original caption/bytes ride along, so no third shuffle. The previous
    four-chained-Dataset.join version deadlock-crawled (~190 workers,
    530 s for 618 rows); this runs the same semantics with two
    tasks-only shuffles.
    """
    from hmse_ray.stages import store as store_stage
    from hmse_ray.stages.aggregates import (
        gather_lookup,
        hash_partitioned_groupby_arrow,
    )

    members = store_stage.attach_clusters(
        images_ds, clusters_ds, num_partitions, est_bytes=est_bytes)

    def per_cluster_partition(t: pa.Table) -> pa.Table:
        st = store_stage.encode_partition(t, cfg)
        rec = _reconstruct_batch(_attach_canon_payloads(st), cfg)
        merged = gather_lookup(
            rec, "image_id",
            t.select(["image_id", "caption", "bytes"]), "image_id",
            {"caption": "caption_orig", "bytes": "bytes_orig"},
        )
        miss = rec.num_rows + t.num_rows - 2 * merged.num_rows
        return _check_batch(merged, cfg, n_missing=miss)

    parts = hash_partitioned_groupby_arrow(
        members, "cluster_id", per_cluster_partition,
        num_partitions=num_partitions, est_bytes=est_bytes,
    )
    return _aggregate_stats(parts)
