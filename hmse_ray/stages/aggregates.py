"""High-cardinality grouped aggregation (guide: "Aggregation at scale").

Ray's built-in ``groupby(key).aggregate(...)`` pays a per-distinct-group
Python cost in its reduce (~0.25 ms/group measured here) — fine for
thousands of groups, quadratic pain for millions. For high-cardinality
keys this module hash-PARTITIONS rows by key and runs one vectorized
kernel per partition: per-group cost becomes vectorized C, the shuffle
key has only ``num_partitions`` distinct values, and results are exact
(each key lands wholly in one partition).

Partition count: floor of 2x cluster CPUs, raised by data volume when
the caller passes ``est_bytes`` (one partition per
``TARGET_PARTITION_BYTES`` = 128 MiB) so a partition always fits one
task's heap at 10^12-row scale — CPU-count alone under-partitions big
inputs (VERDICT r01 finding 6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

TARGET_PARTITION_BYTES = 128 << 20  # ~one task heap's worth of rows


def _resolve_partitions(num_partitions: int | None,
                        est_bytes: int | None = None) -> int:
    if num_partitions is not None:
        return num_partitions
    from hmse_ray.util import cluster_cpus

    floor = max(8, 2 * cluster_cpus())
    if est_bytes:
        return max(floor, int(est_bytes // TARGET_PARTITION_BYTES))
    return floor


def _part_of(col, num_partitions: int) -> np.ndarray:
    """Partition index per row for an int or string key column."""
    mul = np.uint64(0x9E3779B97F4A7C15)
    if pa.types.is_integer(col.type):
        v = col.to_numpy().astype(np.int64).view(np.uint64)
        return ((v * mul) >> np.uint64(33)) % np.uint64(num_partitions)
    # string / binary keys: siphash via pandas (C loop, deterministic)
    h = pd.util.hash_array(col.to_numpy(zero_copy_only=False)).astype(np.uint64)
    return h % np.uint64(num_partitions)


def hash_partitioned_groupby(ds, key_cols: list[str], apply_fn,
                             num_partitions: int | None = None,
                             est_bytes: int | None = None):
    """Exact grouped aggregate for high-cardinality keys (pandas form).

    apply_fn: pandas.DataFrame -> pandas.DataFrame, applied once per
    hash partition (NOT per group); it must do its own groupby(key_cols)
    internally (vectorized).
    """
    num_partitions = _resolve_partitions(num_partitions, est_bytes)

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        h = np.zeros(len(df), dtype=np.uint64)
        for c in key_cols:
            col = df[c]
            if col.dtype.kind in "iu":
                v = col.to_numpy().astype(np.uint64)
            else:
                v = pd.util.hash_array(col.to_numpy()).astype(np.uint64)
            h = h * np.uint64(0x9E3779B97F4A7C15) + v
        # final avalanche (fmix64 core): raw int keys would otherwise
        # partition as value % P, collapsing congruent/strided key sets
        # (all multiples of P, strided window ids) onto one partition —
        # one reducer then holds the whole dataset. The arrow variant
        # already mixes in _part_of.
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        df = df.copy()
        df["_part"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return df

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        return apply_fn(df.drop(columns=["_part"]))

    return (
        ds.map_batches(add_part, batch_format="pandas")
        .groupby("_part")
        .map_groups(per_partition, batch_format="pandas")
    )


def hash_partitioned_groupby_arrow(ds, key_col: str, apply_fn,
                                   num_partitions: int | None = None,
                                   est_bytes: int | None = None):
    """Arrow-native variant for a single int64 OR string key column.

    Avoids pandas conversions entirely — important when rows carry
    list columns (signatures): the pandas path boxes every cell into a
    numpy object array.

    apply_fn: pyarrow.Table -> pyarrow.Table, once per hash partition.
    """
    num_partitions = _resolve_partitions(num_partitions, est_bytes)

    def add_part(t: pa.Table) -> pa.Table:
        part = _part_of(t[key_col].combine_chunks() if isinstance(
            t[key_col], pa.ChunkedArray) else t[key_col], num_partitions)
        return t.append_column("_part", pa.array(part.view(np.int64), pa.int64()))

    def per_partition(t: pa.Table) -> pa.Table:
        return apply_fn(t.drop_columns(["_part"]))

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(per_partition, batch_format="pyarrow")
    )


def copartition_two(left_ds, right_ds, key: str, schema: pa.Schema, apply_fn,
                    num_partitions: int | None = None,
                    est_bytes: int | None = None):
    """Hash-co-partition two datasets on ``key`` and apply a vectorized
    merge once per partition: ``apply_fn(left_t, right_t) -> pa.Table``.

    This is the tasks-only replacement for ``Dataset.join`` in pipeline
    interiors: Ray's hash join spawns per-partition aggregator ACTORS,
    and several joins chained lazily in one streaming plan oversubscribe
    the cluster (measured here: a 618-row store->reconstruct->verify
    chain with four joins ballooned to ~190 worker processes and hung
    ~530 s). One groupby shuffle, no actors, same co-location guarantee:
    every key lands wholly in one partition, on both sides.

    ``schema`` lists the union of both sides' columns (disjoint apart
    from ``key``); each side is padded to it with typed nulls so the
    unioned blocks share one schema.
    """
    names = [f.name for f in schema]

    def pad(side: int):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = []
            for f in schema:
                if f.name in t.column_names:
                    c = t[f.name]
                    if isinstance(c, pa.ChunkedArray):
                        c = c.combine_chunks()
                    if c.type != f.type:
                        c = c.cast(f.type)
                else:
                    c = pa.nulls(n, f.type)
                cols.append(c)
            cols.append(pa.array(np.full(n, side, np.int8)))
            return pa.table(cols, names=names + ["_side"])
        return fn

    unioned = left_ds.map_batches(pad(0), batch_format="pyarrow").union(
        right_ds.map_batches(pad(1), batch_format="pyarrow")
    )

    def per_partition(t: pa.Table) -> pa.Table:
        side = t["_side"].to_numpy(zero_copy_only=False)
        t = t.drop_columns(["_side"])
        return apply_fn(t.take(np.flatnonzero(side == 0)),
                        t.take(np.flatnonzero(side == 1)))

    return hash_partitioned_groupby_arrow(
        unioned, key, per_partition,
        num_partitions=num_partitions, est_bytes=est_bytes,
    )


def gather_lookup(members: pa.Table, member_key: str,
                  lookup: pa.Table, lookup_key: str,
                  take_cols: dict[str, str]) -> pa.Table:
    """Vectorized within-partition equi-lookup (inner): append
    ``take_cols`` (src->dst names) from the matching ``lookup`` row to
    each ``members`` row; members with no match are dropped. The key
    index is a pandas C hash probe; payload columns are gathered with
    arrow ``take`` (no boxing of binary cells).

    ``lookup[lookup_key]`` must be UNIQUE (one payload row per key —
    true for every caller: cluster canonicals, cluster assignments,
    original rows). pandas raises loudly on duplicates rather than
    silently picking one."""
    if members.num_rows == 0 or lookup.num_rows == 0:
        empty = members.take(np.array([], np.int64))
        for src, dst in take_cols.items():
            empty = empty.append_column(dst, pa.nulls(0, lookup.schema.field(src).type))
        return empty
    idx = pd.Index(lookup[lookup_key].to_pandas())
    pos = idx.get_indexer(pd.Index(members[member_key].to_pandas()))
    keep = np.flatnonzero(pos >= 0)
    out = members.take(keep)
    sel = pos[keep]
    for src, dst in take_cols.items():
        c = lookup[src]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        out = out.append_column(dst, c.take(sel))
    return out


def pack_pair_key(a, b):
    """Collision-free string key for an (already-oriented) id pair:
    ``len(a) "|" a "|" b``. A bare ``a+"|"+b`` key is ambiguous when
    ids themselves contain "|" — ('a|c','b') and ('a','c|b') both pack
    to 'a|c|b', which lets a group aggregate fabricate a pair out of
    mixed minima. The decimal length prefix (digits can't contain the
    separator) makes the encoding uniquely decodable for ANY ids."""
    la = pc.cast(pc.utf8_length(a), pa.string())
    return pc.binary_join_element_wise(la, a, b, "|")


def distinct_pairs(ds, id_a: str = "id_a", id_b: str = "id_b",
                   val_col: str | None = None,
                   num_partitions: int | None = None,
                   est_bytes: int | None = None):
    """Distinct (id_a, id_b[, max(val)]) edges — arrow C++ hash aggregate
    per hash partition; no per-group Python anywhere (scales to billions
    of pairs, unlike groupby(pairkey).aggregate which pays ~0.25 ms per
    distinct pair)."""

    def pack(t: pa.Table) -> pa.Table:
        k = pack_pair_key(t[id_a], t[id_b])
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        return t.append_column("pairkey", k)

    aggs = [(id_a, "min"), (id_b, "min")]
    names = {f"{id_a}_min": id_a, f"{id_b}_min": id_b}
    if val_col is not None:
        aggs.append((val_col, "max"))
        names[f"{val_col}_max"] = val_col

    def part(t: pa.Table) -> pa.Table:
        g = t.group_by("pairkey").aggregate(aggs)
        g = g.rename_columns([names.get(c, c) for c in g.column_names])
        return g.drop_columns(["pairkey"])

    packed = ds.map_batches(pack, batch_format="pyarrow")
    return hash_partitioned_groupby_arrow(
        packed, "pairkey", part, num_partitions=num_partitions, est_bytes=est_bytes
    )
