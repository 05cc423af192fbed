"""High-cardinality grouped aggregation (guide: "Aggregation at scale").

Ray's built-in ``groupby(key).aggregate(...)`` pays a per-distinct-group
Python cost in its reduce (~0.25 ms/group measured here) — fine for
thousands of groups, quadratic pain for millions. For high-cardinality
keys this module hash-PARTITIONS rows by key into ~2xCPU partitions and
runs one vectorized pandas groupby per partition: per-group cost becomes
vectorized C, the shuffle key has only ``num_partitions`` distinct
values, and results are exact (each key lands wholly in one partition).

This is also the scalable shape for 10^12-row aggregates: partition
count follows the cluster, per-partition work is a single vectorized
kernel, and partials stream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _resolve_partitions(num_partitions: int | None) -> int:
    if num_partitions is not None:
        return num_partitions
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(8, 2 * cpus)


def hash_partitioned_groupby(ds, key_cols: list[str], apply_fn,
                             num_partitions: int | None = None):
    """Exact grouped aggregate for high-cardinality keys (pandas form).

    apply_fn: pandas.DataFrame -> pandas.DataFrame, applied once per
    hash partition (NOT per group); it must do its own groupby(key_cols)
    internally (vectorized).
    """
    num_partitions = _resolve_partitions(num_partitions)

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        h = np.zeros(len(df), dtype=np.uint64)
        for c in key_cols:
            col = df[c]
            if col.dtype.kind in "iu":
                v = col.to_numpy().astype(np.uint64)
            else:
                v = pd.util.hash_array(col.to_numpy()).astype(np.uint64)
            h = h * np.uint64(0x9E3779B97F4A7C15) + v
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
                                   num_partitions: int | None = None):
    """Arrow-native variant for a single int64 key column.

    Avoids pandas conversions entirely — important when rows carry
    fixed-size-list columns (signatures): the pandas path boxes every
    cell into a numpy object array.

    apply_fn: pyarrow.Table -> pyarrow.Table, once per hash partition.
    """
    num_partitions = _resolve_partitions(num_partitions)
    mul = np.uint64(0x9E3779B97F4A7C15)

    def add_part(t: pa.Table) -> pa.Table:
        v = t[key_col].to_numpy().astype(np.int64).view(np.uint64)
        part = ((v * mul) >> np.uint64(33)) % np.uint64(num_partitions)
        return t.append_column("_part", pa.array(part.view(np.int64), pa.int64()))

    def per_partition(t: pa.Table) -> pa.Table:
        return apply_fn(t.drop_columns(["_part"]))

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(per_partition, batch_format="pyarrow")
    )
