"""Incremental ingest: dedup a DELTA shard against a persisted base index.

The reference's runtime is an ONLINE index: every new record probes the
SHA-256 index — hit -> pointer record to the canonical copy, miss ->
store + insert (README.md:1209-1210, 1288-1293). This engine is batch;
the Ray-native incremental analog keeps those semantics WITHOUT a
shared mutable index:

- the base run persists its canonical index as partitioned parquet —
  narrow rows, sha256 (hex string) + canonical_id only;
- ingesting a delta shard is ONE co-partition shuffle of (sha, id)
  pairs: base-index rows and delta shas hash to the same partition
  (stages/aggregates.copartition_two — tasks-only, no Dataset.join),
  where a vectorized lookup assigns every delta doc to the existing
  canonical (hit) or elects a new canonical among the delta's own rows
  (miss — min doc_id, the same first-writer-wins rule the base used);
- the newly-elected canonicals form the index DELTA: appending them to
  the index directory makes the next ingest incremental again, so
  repeated ingests fold into the same state the reference's online
  inserts would reach.

At 100 TB the only state that moves is the index (≈ 72 B/unique record)
and the delta's (sha, id) pairs; payload bytes never enter the shuffle,
and both sides use the same hash partitioning.

``ingest_delta_semijoin`` goes one step further for the common shape
where the index (all history) dwarfs the delta (one shard): a Bloom
filter of the DELTA's shas (functions/bloom.py) pre-filters the index
stream before the shuffle, so the shuffle carries ~|delta| x (1 + fpp)
index rows instead of |index|. Output is bit-identical (no false
negatives).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from hmse_ray.stages.aggregates import copartition_two


def sha_rows(docs_ds, id_col: str = "doc_id", text_col: str = "text"):
    """(id, text) Dataset -> narrow (doc_id, sha256) Dataset."""

    def sha(batch: pa.Table) -> pa.Table:
        hs = [hashlib.sha256(t.encode()).hexdigest()
              for t in batch[text_col].to_pylist()]
        return pa.table({
            "sha256": pa.array(hs, pa.string()),
            "doc_id": batch[id_col],
        })

    return docs_ds.map_batches(sha, batch_format="pyarrow")


def build_index(docs_ds, id_col: str = "doc_id", text_col: str = "text"):
    """Base-run canonical index: (sha256, canonical_id = min doc_id)."""
    from ray.data.aggregate import Min

    return (
        sha_rows(docs_ds, id_col, text_col)
        .groupby("sha256")
        .aggregate(Min("doc_id", alias_name="canonical_id"))
    )


def persist_index(index_ds, path: str) -> str:
    """Write the index as partitioned parquet + _SUCCESS marker (the
    same atomic-commit convention state/checkpoint.py uses: a reader
    trusts the directory only once the marker exists)."""
    tmp = path + ".tmp"
    index_ds.write_parquet(tmp)
    os.rename(tmp, path)
    with open(os.path.join(path, "_SUCCESS"), "w", encoding="utf-8") as f:
        f.write("")
    return path


def load_index(path: str):
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        raise FileNotFoundError(f"index at {path} has no _SUCCESS marker")
    return rd.read_parquet(path)


_SCHEMA = pa.schema([
    ("sha256", pa.string()),
    ("canonical_id", pa.int64()),
    ("doc_id", pa.int64()),
])


def ingest_delta(index_ds, delta_ds, id_col: str = "doc_id",
                 text_col: str = "text", num_partitions: int | None = None):
    """Assign every delta doc against the base index.

    Returns a Dataset (doc_id, sha256, canonical_id, is_new):
    - hit  (sha in base):  canonical_id = base canonical, is_new = 0
    - miss (sha unseen):   canonical_id = min delta doc_id sharing the
                           sha, is_new = 1 (that row is the new
                           canonical; the is_new=1 ∧ doc_id ==
                           canonical_id subset IS the index delta).
    """
    delta = sha_rows(delta_ds, id_col, text_col)
    return _assign(index_ds, delta, num_partitions)


def _merge(left: pa.Table, right: pa.Table) -> pa.Table:
    # left: base index rows (sha256, canonical_id); right: delta
    # (sha256, doc_id) — same hash partition, vectorized lookup
    if right.num_rows == 0:
        return pa.table({
            "doc_id": pa.array([], pa.int64()),
            "sha256": pa.array([], pa.string()),
            "canonical_id": pa.array([], pa.int64()),
            "is_new": pa.array([], pa.int64()),
        })
    d = pd.DataFrame({
        "sha256": right["sha256"].to_pandas(),
        "doc_id": right["doc_id"].to_numpy(zero_copy_only=False),
    })
    base = pd.Series(
        left["canonical_id"].to_numpy(zero_copy_only=False),
        index=left["sha256"].to_pandas(),
    )
    hit = d["sha256"].map(base)
    dmin = d.groupby("sha256")["doc_id"].transform("min")
    canonical = hit.fillna(dmin).astype(np.int64)
    is_new = hit.isna().astype(np.int64)
    return pa.table({
        "doc_id": pa.array(d["doc_id"].to_numpy(), pa.int64()),
        "sha256": pa.array(d["sha256"], pa.string()),
        "canonical_id": pa.array(canonical.to_numpy(), pa.int64()),
        "is_new": pa.array(is_new.to_numpy(), pa.int64()),
    })


def _assign(index_ds, delta_sha_ds, num_partitions):
    # the index side carries (sha256, canonical_id); the delta side
    # (sha256, doc_id) — disjoint apart from the key, as copartition_two
    # requires
    return copartition_two(
        index_ds, delta_sha_ds, "sha256", _SCHEMA, _merge,
        num_partitions=num_partitions,
    )


def ingest_delta_semijoin(index_ds, delta_ds, id_col: str = "doc_id",
                          text_col: str = "text",
                          num_partitions: int | None = None,
                          m_bits: int = 1 << 20, k: int = 7):
    """``ingest_delta`` with a bloom semi-join filter on the INDEX side.

    The 100-TB shape: the index is all history, the delta is one shard.
    A Bloom filter of the delta's shas (functions/bloom.py) is built
    first (the delta is the small side), broadcast once via ``ray.put``,
    and the index stream is filtered to possible members BEFORE the
    co-partition shuffle — so the shuffle carries ~|delta| x (1 + fpp)
    index rows instead of |index|. Bloom false positives add unmatched
    index rows to a partition (harmless); false negatives cannot occur,
    so the output is bit-identical to ``ingest_delta`` (pinned in
    tests/test_ingest.py::TestBloomSemijoin).
    """
    import ray

    from hmse_ray.functions.bloom import Bloom, build_from_dataset

    delta = sha_rows(delta_ds, id_col, text_col)
    bloom = build_from_dataset(delta, "sha256", m_bits=m_bits, k=k)
    bref = ray.put((bloom.bits, bloom.m_bits, bloom.k))

    def probe(t: pa.Table) -> pa.Table:
        bits, mb, kk = ray.get(bref)
        b = Bloom(mb, kk, bits=bits)
        keep = b.contains_many(t["sha256"].to_pandas().to_numpy())
        return t.take(np.flatnonzero(keep))

    filtered = index_ds.map_batches(probe, batch_format="pyarrow")
    return _assign(filtered, delta, num_partitions)


def index_delta(assigned_ds):
    """The rows to append to the index directory after an ingest:
    newly-elected canonicals only."""

    def pick(t: pa.Table) -> pa.Table:
        keep = (np.asarray(t["is_new"].to_numpy()) == 1) & (
            t["doc_id"].to_numpy() == t["canonical_id"].to_numpy())
        return t.select(["sha256", "canonical_id"]).take(np.flatnonzero(keep))

    return assigned_ds.map_batches(pick, batch_format="pyarrow")
