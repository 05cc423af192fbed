"""L3 exact dedup: hash-partition + per-group first (J1/A-J/A4).

Reference semantics (README.md:1209-1210, 1288-1293, 1542-1551): probe
the SHA-256 index; hit -> pointer record to the canonical copy, miss ->
store + insert, refcount++. The reference serializes on one global
mutable index; Ray-Data-first this becomes a ``groupby('sha256')``
shuffle — no shared mutable state, no cache-coherence problem
(SURVEY.md T4: the PSRAM index cache is eliminated by design).

Canonical row = lexicographic min (image_id, chunk_idx) in the group
(deterministic "first writer wins"); refcount = group size.

Implementation detail: Ray's ``groupby().map_groups`` sorts each block
by key and applies the UDF per group — for millions of tiny groups the
per-group Python overhead dominates, so we instead use
``map_groups``-free vectorized reduction: sort-based dedup INSIDE
map_batches after the shuffle... in practice Ray Data >= 2.40 implements
groupby by hash-partition + sort within blocks; we use
``groupby(...).map_groups`` only where per-group logic is non-trivial
and a vectorized two-stage aggregate otherwise:

  stage 1 (map side): per-batch partial dedup — first (id, idx) + count
           per sha within the batch (combiner; shrinks the shuffle)
  stage 2 (shuffle): groupby sha over partials, vectorized per-block
           merge via sort + reduceat in map_batches on repartitioned
           hash groups.

Ray's built-in ``ds.groupby(key).aggregate`` handles stage 2's
correctness (Count/Min are built-in aggregates and run partial+final
internally); we express the canonical pick as min over a packed
"id#chunk_idx" sort key inside a hash-partitioned vectorized pandas
groupby (stages/aggregates.py) — NO per-group Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from hmse_ray.config import Config, DEFAULT_CONFIG

# chunk_idx is lpad'd to this width in the packed canonical key; wider
# indices would sort lexicographically wrong (\'1000000\' < \'999999\'),
# so packing guards the bound loudly instead
_REF_IDX_WIDTH = 6


def _pack_ref(batch: pa.Table, id_col: str = "image_id") -> pa.Table:
    """Add chunk_ref = '<id>#chunk_idx' (deterministic canonical key).

    Ordering contract: the canonical pick is min over THESE PACKED
    STRINGS — for ids containing characters below '#' (0x23, e.g. '!'
    or space) that deviates from (id, chunk_idx) TUPLE order, but stays
    deterministic and matches the SQL oracle byte-for-byte (the oracle
    packs identically, queries.py cdc_chunk_index). Corpus ids are
    alphanumeric, where packed order == tuple order."""
    if batch.num_rows:
        mx = pc.max(batch["chunk_idx"]).as_py()
        if mx is not None and mx >= 10 ** _REF_IDX_WIDTH:
            raise ValueError(
                f"chunk_idx {mx} exceeds the packed-key width "
                f"(10^{_REF_IDX_WIDTH}); widen _REF_IDX_WIDTH (and the "
                "SQL oracle's lpad) before ingesting docs with that "
                "many chunks")
    ref = pc.binary_join_element_wise(
        pc.cast(batch[id_col], pa.string()),
        pc.utf8_lpad(pc.cast(batch["chunk_idx"], pa.string()),
                     _REF_IDX_WIDTH, "0"),
        "#",
    )
    return batch.append_column("chunk_ref", ref)


def dedup_chunks(chunks_ds, cfg: Config = DEFAULT_CONFIG, id_col: str = "image_id"):
    """chunks Dataset -> canonical chunk index Dataset.

    Output columns: sha256, canonical_ref ('image_id#chunk_idx' of the
    winning copy), refcount (int64), chunk_len.

    This is THE exact-dedup shuffle (shuffle 1 of SURVEY.md section 4.2).
    sha256 is a near-unique key (one distinct group per unique chunk),
    so the aggregate runs as a hash-partitioned vectorized pandas
    groupby (stages/aggregates.py) — no per-group Python anywhere.
    """
    import pandas as pd

    from hmse_ray.stages.aggregates import hash_partitioned_groupby

    packed = chunks_ds.map_batches(
        lambda t: _pack_ref(t, id_col), batch_format="pyarrow"
    ).select_columns(["sha256", "chunk_ref", "chunk_len"])

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby("sha256", sort=False)
            .agg(
                canonical_ref=("chunk_ref", "min"),
                refcount=("chunk_ref", "size"),
                chunk_len=("chunk_len", "min"),
            )
            .reset_index()
        )
        g["refcount"] = g["refcount"].astype("int64")
        return g

    return hash_partitioned_groupby(packed, ["sha256"], agg)


def dedup_stats(index_ds):
    """Aggregate A2/A6 storage accounting over the canonical index.

    Returns a one-row Dataset: n_unique, n_total, unique_ratio,
    logical_bytes, physical_bytes, dedup_ratio.
    """

    def stats(batch: pa.Table) -> pa.Table:
        ref = batch["refcount"].to_numpy()
        ln = batch["chunk_len"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "n_unique": pa.array([len(ref)], pa.int64()),
                "n_total": pa.array([int(ref.sum())], pa.int64()),
                "logical_bytes": pa.array([int((ref * ln).sum())], pa.int64()),
                "physical_bytes": pa.array([int(ln.sum())], pa.int64()),
            }
        )

    def merge(batch: pa.Table) -> pa.Table:
        t = {c: pc.sum(batch[c]).as_py() or 0 for c in batch.column_names}
        n_u, n_t = t["n_unique"], t["n_total"]
        lb, pb = t["logical_bytes"], t["physical_bytes"]
        return pa.table(
            {
                "n_unique": pa.array([n_u], pa.int64()),
                "n_total": pa.array([n_t], pa.int64()),
                "unique_ratio": pa.array([n_u / max(1, n_t)], pa.float64()),
                "logical_bytes": pa.array([lb], pa.int64()),
                "physical_bytes": pa.array([pb], pa.int64()),
                "dedup_ratio": pa.array([lb / max(1, pb)], pa.float64()),
            }
        )

    partials = index_ds.map_batches(stats, batch_format="pyarrow")
    # tiny: one row per block — safe to collapse through a single batch
    return partials.repartition(1).map_batches(merge, batch_format="pyarrow", batch_size=None)
