"""Store-kind trichotomy + delta encoding (M7, J3, A6).

Reference semantics: every stored record is exactly one of FULL /
POINTER / DELTA (README.md:1634-1669). Exact duplicates become pointer
records to the canonical copy (README.md:1210, 1311-1313); verified
near-duplicates are stored as binary deltas against the cluster base if
the delta is <= 20% of the original (README.md:2175), else full. The
caption payload additionally passes through L1 compression with
incompressible passthrough (README.md:288, 2138-2145).

Ray-Data-first: the "base-chunk fetch" (J3, README.md:1560-1562) is a
hash join of member rows with their cluster-canonical payload —
SHUFFLE 3 of SURVEY.md section 4.2 — followed by a stateless
delta-encode map_batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from hmse_ray.config import Config, DEFAULT_CONFIG
from hmse_ray.functions import compress, delta

STORE_COLUMNS = [
    "image_id", "cluster_id", "store_kind",
    "caption_payload", "caption_env", "image_payload", "fmt", "w", "h",
]


def _encode_group(batch: pa.Table, cfg: Config) -> pa.Table:
    """Decide store kind per row given joined canonical payloads."""
    ids = batch["image_id"].to_pylist()
    cids = batch["cluster_id"].to_pylist()
    caps = batch["caption"].to_pylist()
    blobs = batch["bytes"].to_pylist()
    ccaps = batch["canon_caption"].to_pylist()
    cblobs = batch["canon_bytes"].to_pylist()
    kinds, cpl, cenv, ipl = [], [], [], []
    for iid, cid, cap, blob, ccap, cblob in zip(ids, cids, caps, blobs, ccaps, cblobs):
        # null captions are tolerated upstream (signatures.py signs
        # them as b""); the store must not crash on them either
        cap = cap or ""
        ccap = ccap or ""
        cap_b = cap.encode()
        if iid == cid:
            kind = delta.KIND_FULL
            payload, env = compress.compress_record(cap_b, cfg)
            img = blob
        elif cap == ccap and blob == cblob:
            kind, payload, env, img = delta.KIND_POINTER, None, compress.STORED, None
        else:
            d = delta.delta_encode(ccap.encode(), cap_b, cfg)
            if d is not None:
                kind, payload, env = delta.KIND_DELTA, d, compress.COMPRESSED
            else:
                kind = delta.KIND_FULL
                payload, env = compress.compress_record(cap_b, cfg)
            img = blob if blob != cblob else None  # image pointer when pixels match
        kinds.append(kind)
        cpl.append(payload)
        cenv.append(env)
        ipl.append(img)
    return pa.table(
        {
            "image_id": batch["image_id"],
            "cluster_id": batch["cluster_id"],
            "store_kind": pa.array(kinds, pa.string()),
            "caption_payload": pa.array(cpl, pa.binary()),
            "caption_env": pa.array(cenv, pa.int8()),
            "image_payload": pa.array(ipl, pa.binary()),
            "fmt": batch["fmt"],
            "w": batch["w"],
            "h": batch["h"],
        }
    )


MEMBER_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("cluster_id", pa.string()),
        ("caption", pa.string()),
        ("bytes", pa.binary()),
        ("fmt", pa.string()),
        ("w", pa.int32()),
        ("h", pa.int32()),
    ]
)


def attach_clusters(images_ds, clusters_ds, num_partitions: int | None = None,
                    est_bytes: int | None = None):
    """images x clusters on image_id -> member rows (MEMBER_SCHEMA).

    Tasks-only shuffle equi-join (copartition_two) — NOT Dataset.join:
    chained join actor pools hung the verify path (see aggregates.py).
    """
    from hmse_ray.stages.aggregates import copartition_two, gather_lookup

    def merge(left: pa.Table, right: pa.Table) -> pa.Table:
        return gather_lookup(
            left.drop_columns(["cluster_id"]), "image_id",
            right, "image_id", {"cluster_id": "cluster_id"},
        ).select(MEMBER_SCHEMA.names)

    return copartition_two(
        images_ds, clusters_ds, "image_id", MEMBER_SCHEMA, merge,
        num_partitions=num_partitions, est_bytes=est_bytes,
    )


def encode_partition(t: pa.Table, cfg: Config) -> pa.Table:
    """Per-cluster_id-partition store encoding: canonical rows live in
    the same partition as their members, so the base-payload lookup (J3)
    is a local vectorized gather, then the stateless encode map."""
    from hmse_ray.stages.aggregates import gather_lookup

    canon = t.filter(pc.equal(t["image_id"], t["cluster_id"]))
    merged = gather_lookup(
        t, "cluster_id",
        canon.select(["cluster_id", "caption", "bytes"]), "cluster_id",
        {"caption": "canon_caption", "bytes": "canon_bytes"},
    )
    return _encode_group(merged, cfg)


def store_table(images_ds, clusters_ds, cfg: Config = DEFAULT_CONFIG,
                num_partitions: int | None = None,
                est_bytes: int | None = None):
    """images + cluster assignments -> stored-record table.

    Two tasks-only shuffles: co-partition on image_id to attach
    cluster_id, then hash-partition by cluster_id so every cluster is
    wholly local; encode per partition.

    ``est_bytes`` (input payload volume, e.g. sum of the input parquet
    file sizes): these are the WIDEST rows in the system — caption plus
    image bytes — so CPU-count partitioning alone under-partitions big
    inputs (aggregates._resolve_partitions); pass it whenever known.
    """
    from hmse_ray.stages.aggregates import hash_partitioned_groupby_arrow

    members = attach_clusters(images_ds, clusters_ds, num_partitions,
                              est_bytes=est_bytes)
    return hash_partitioned_groupby_arrow(
        members, "cluster_id",
        lambda t: encode_partition(t, cfg),
        num_partitions=num_partitions, est_bytes=est_bytes,
    )


def store_kind_stats(store_ds):
    """A6: per-kind record counts + stored caption bytes."""
    from ray.data.aggregate import Count, Sum

    def size_cols(t: pa.Table) -> pa.Table:
        ln = pc.binary_length(t["caption_payload"])
        ln = pc.coalesce(ln, pa.scalar(0, pa.int32()))
        return pa.table(
            {
                "store_kind": t["store_kind"],
                "stored_bytes": pc.cast(ln, pa.int64()),
            }
        )

    return (
        store_ds.map_batches(size_cols, batch_format="pyarrow")
        .groupby("store_kind")
        .aggregate(Count(alias_name="n"), Sum("stored_bytes", alias_name="stored_bytes"))
    )
