"""L4 LSH banding: bucket materialization, candidate pairs, salting (J2/T5).

Reference semantics (README.md:1553-1576, 1929-1945): each record's
n=128 signature is split into b=4 bands of r=32 rows; records colliding
in any band bucket are candidate near-duplicates; candidates are
verified by the signature-agreement Jaccard estimate, then delta-encoded.
The reference holds band tables as a shared in-memory index; Ray-Data-
first the bucket IS the shuffle group: ``groupby(band_id, band_hash)``
(SURVEY.md T5 — no materialized band tables anywhere).

Skew (README.md:1929-1932 acknowledges ~165 chunks/bucket average and
unhandled hot buckets): rows are SALTED before the shuffle —
``salt = murmur3(image_id) % num_salts`` — splitting every bucket into
bounded sub-buckets. Star edges are emitted per sub-bucket (linear, not
quadratic, in bucket size), and a second, much smaller pass connects the
sub-bucket representatives of each original bucket. With num_salts=1
(test scale) the second pass is skipped. At 10^12-row scale, size
num_salts so hot-bucket sub-groups fit a task's heap.

Two candidate-generation paths are provided:

* ``candidate_pairs`` — star edges (bucket representative vs member)
  with vectorized Jaccard verification, computed as hash-partitioned
  arrow-native per-partition kernels (stages/aggregates.py — zero
  per-bucket Python); feeds the delta-encoding join and A3 hit rate.
* ``membership_rows`` — narrow (image_id, bucket) rows for the
  unverified star-edge clustering path in stages.clustering (cheapest
  linking when band collision alone is trustworthy).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from hmse_ray.config import Config, DEFAULT_CONFIG
from hmse_ray.functions import murmur3, simhash

# distinct multipliers mix band_id into the 64-bit bucket key space;
# collisions across bands are ~2^-64 and only cost a false candidate
_BAND_MIX = np.uint64(0xA24BAED4963EE407)
_SIMHASH_MIX = np.uint64(0x9FB21C651E98DF25)


def dedup_pair_edges(edges_ds, val_col: str | None = "jaccard_est"):
    """Deduplicate (id_a, id_b[, val]) edges emitted by several bands.

    Groups on ONE packed string key instead of the two-column key —
    Ray's sort-based aggregate materializes Python tuples for
    multi-column keys (measured ~70x slower than single-key grouping).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min

    def pack(t: pa.Table) -> pa.Table:
        return t.append_column(
            "pairkey", pc.binary_join_element_wise(t["id_a"], t["id_b"], "|")
        )

    aggs = [Min("id_a", alias_name="id_a"), Min("id_b", alias_name="id_b")]
    if val_col is not None:
        aggs.append(Max(val_col, alias_name=val_col))
    out = edges_ds.map_batches(pack, batch_format="pyarrow").groupby("pairkey").aggregate(*aggs)
    return out.drop_columns(["pairkey"])


_EMPTY_EDGES = pa.table(
    {
        "id_a": pa.array([], pa.string()),
        "id_b": pa.array([], pa.string()),
        "jaccard_est": pa.array([], pa.float64()),
    }
)


def _bucket_partition_table(t: pa.Table):
    """Sort one hash partition by (bucket, image_id); return per-row
    index of each row's bucket representative (the bucket minimum)."""
    t = t.sort_by([("bucket", "ascending"), ("image_id", "ascending")])
    buckets = t["bucket"].to_numpy()
    n = len(buckets)
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = buckets[1:] != buckets[:-1]
    starts = np.nonzero(new)[0]
    rep_idx = starts[np.cumsum(new) - 1]
    return t, rep_idx


def _star_edges_partition(t: pa.Table, cfg: Config) -> pa.Table:
    """All verified MinHash star edges of one hash partition —
    arrow-native (the signature matrix is a zero-copy reshape of the
    fixed-size-list buffer; no per-bucket Python, no object boxing)."""
    if t.num_rows == 0:
        return _EMPTY_EDGES
    t, rep_idx = _bucket_partition_table(t)
    n = t.num_rows
    M = np.asarray(t["minhash"].combine_chunks().flatten()).reshape(n, -1)
    est = (M == M[rep_idx]).mean(axis=1)
    keep = (np.arange(n) != rep_idx) & (est >= cfg.jaccard_threshold)
    ids = t["image_id"].combine_chunks()
    keep_i = np.nonzero(keep)[0]
    return pa.table(
        {
            "id_a": ids.take(pa.array(rep_idx[keep_i], pa.int64())),
            "id_b": ids.take(pa.array(keep_i, pa.int64())),
            "jaccard_est": pa.array(est[keep_i], pa.float64()),
        }
    )


def _simhash_star_partition(t: pa.Table, cfg: Config) -> pa.Table:
    """All Hamming-verified SimHash star edges of one hash partition."""
    if t.num_rows == 0:
        return _EMPTY_EDGES
    t, rep_idx = _bucket_partition_table(t)
    n = t.num_rows
    sims = t["simhash"].to_numpy()
    ham = simhash.hamming64(sims, sims[rep_idx])
    keep = (np.arange(n) != rep_idx) & (ham <= cfg.simhash_hamming_threshold)
    ids = t["image_id"].combine_chunks()
    keep_i = np.nonzero(keep)[0]
    return pa.table(
        {
            "id_a": ids.take(pa.array(rep_idx[keep_i], pa.int64())),
            "id_b": ids.take(pa.array(keep_i, pa.int64())),
            "jaccard_est": pa.array(1.0 - ham[keep_i] / 64.0, pa.float64()),
        }
    )


def _salt_of(ids: pa.Array, num_salts: int) -> np.ndarray:
    if num_salts <= 1:
        return np.zeros(len(ids), dtype=np.uint64)
    return np.array(
        [murmur3.murmur3_bytes(s.encode(), 0xBEEF) % num_salts for s in ids.to_pylist()],
        dtype=np.uint64,
    )


def band_explode(sig_batch: pa.Table, cfg: Config, num_salts: int = 1,
                 carry_sig: bool = True) -> pa.Table:
    """One signed row -> b rows (image_id, bucket, [minhash]).

    bucket = band_hash * MIX + band_id + salt-mixed — a single int64 key
    so downstream shuffles never group on composite string keys.
    """
    n = sig_batch.num_rows
    b = cfg.num_bands
    ids = sig_batch["image_id"]
    salts = _salt_of(ids, num_salts)
    buckets = np.empty((b, n), dtype=np.uint64)
    for band in range(b):
        bh = sig_batch[f"band_h{band}"].to_numpy().view(np.uint64)
        buckets[band] = (bh * _BAND_MIX + np.uint64(band)) * np.uint64(num_salts) + salts
    cols = {
        "image_id": pa.concat_arrays([ids.combine_chunks()] * b)
        if isinstance(ids, pa.ChunkedArray)
        else pa.concat_arrays([ids] * b),
        "bucket": pa.array(buckets.ravel().view(np.int64), pa.int64()),
    }
    if carry_sig and "minhash" in sig_batch.column_names:
        mh = sig_batch["minhash"].combine_chunks()
        cols["minhash"] = pa.concat_arrays([mh] * b)
    return pa.table(cols)


def simhash_band_explode(sim_batch: pa.Table, cfg: Config, num_salts: int = 1) -> pa.Table:
    """SimHash rows -> (image_id, bucket) rows: 4 x 16-bit bands.

    By pigeonhole, images with Hamming distance <= num_bands-1 always
    share an intact band; planted near-dups (ham <= 3) are guaranteed
    candidates.
    """
    ids = sim_batch["image_id"]
    salts = _salt_of(ids, num_salts)
    bands = simhash.simhash_band_cols(
        sim_batch["simhash"].to_numpy(), cfg
    )  # (n, bands) uint64
    nb = bands.shape[1]
    buckets = np.empty((nb, len(salts)), dtype=np.uint64)
    for band in range(nb):
        buckets[band] = (
            (bands[:, band] * _SIMHASH_MIX + np.uint64(band + 1000)) * np.uint64(num_salts)
            + salts
        )
    ids_cc = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
    return pa.table(
        {
            "image_id": pa.concat_arrays([ids_cc] * nb),
            "bucket": pa.array(buckets.ravel().view(np.int64), pa.int64()),
        }
    )


def membership_rows(minhash_ds, simhash_ds, cfg: Config = DEFAULT_CONFIG):
    """Narrow (image_id, bucket) membership for bipartite clustering.

    NO salting here, by design: the bipartite min-label path uses only
    combiner-based Min aggregates, which pre-aggregate hot buckets
    map-side before the shuffle — salting would instead SPLIT clusters.
    Salting exists for the map_groups candidate-pair path, where a whole
    bucket lands in one task.
    """
    m = minhash_ds.map_batches(
        lambda t: band_explode(t, cfg, 1, carry_sig=False),
        batch_format="pyarrow",
    )
    if simhash_ds is not None:
        s = simhash_ds.map_batches(
            lambda t: simhash_band_explode(t, cfg, 1),
            batch_format="pyarrow",
        )
        m = m.union(s)
    return m




def simhash_candidate_pairs(simhash_ds, cfg: Config = DEFAULT_CONFIG, num_salts: int = 1):
    """Verified image near-dup pairs: (id_a, id_b, jaccard_est=1-ham/64)."""
    from hmse_ray.stages.aggregates import hash_partitioned_groupby_arrow

    bands = simhash_ds.map_batches(
        lambda t: _simhash_bands_with_payload(t, cfg, num_salts), batch_format="pyarrow"
    )
    edges = hash_partitioned_groupby_arrow(
        bands, "bucket", lambda t: _simhash_star_partition(t, cfg)
    )
    return dedup_pair_edges(edges)


def _simhash_bands_with_payload(sim_batch: pa.Table, cfg: Config, num_salts: int) -> pa.Table:
    t = simhash_band_explode(sim_batch, cfg, num_salts)
    sims = sim_batch["simhash"].combine_chunks() if isinstance(
        sim_batch["simhash"], pa.ChunkedArray
    ) else sim_batch["simhash"]
    nb = t.num_rows // sim_batch.num_rows
    return t.append_column("simhash", pa.concat_arrays([sims] * nb))



def similarity_hit_rate(minhash_ds, cfg: Config = DEFAULT_CONFIG):
    """A3 (VALIDATION_METHODS.md:264): N_LSH_matches / N_candidate_pairs.

    One row: n_candidates, n_matches, hit_rate — candidates are star
    probes per bucket; matches pass the Jaccard verification.
    """
    from ray.data.aggregate import Sum

    from hmse_ray.stages.aggregates import hash_partitioned_groupby_arrow

    bands = minhash_ds.map_batches(
        lambda t: band_explode(t, cfg, 1, carry_sig=True), batch_format="pyarrow"
    )

    def count_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"n_candidates": pa.array([0], pa.int64()),
                 "n_matches": pa.array([0], pa.int64())}
            )
        tp, rep_idx = _bucket_partition_table(t)
        n = tp.num_rows
        M = np.asarray(tp["minhash"].combine_chunks().flatten()).reshape(n, -1)
        est = (M == M[rep_idx]).mean(axis=1)
        nonrep = np.arange(n) != rep_idx
        keep = nonrep & (est >= cfg.jaccard_threshold)
        return pa.table(
            {"n_candidates": pa.array([int(nonrep.sum())], pa.int64()),
             "n_matches": pa.array([int(keep.sum())], pa.int64())}
        )

    counts = hash_partitioned_groupby_arrow(bands, "bucket", count_part)
    agg = counts.aggregate(
        Sum("n_candidates", alias_name="n_candidates"),
        Sum("n_matches", alias_name="n_matches"),
    )
    nc = agg.get("n_candidates") or 0
    nm = agg.get("n_matches") or 0
    import pandas as pd

    return pd.DataFrame(
        [{"n_candidates": nc, "n_matches": nm, "hit_rate": nm / max(1, nc)}]
    )


def _rep_rows_partition(t: pa.Table, num_salts: int) -> pa.Table:
    """All sub-bucket representative rows of one hash partition,
    re-keyed to the parent bucket (vectorized: the first row of each
    sorted sub-bucket is its representative)."""
    if t.num_rows == 0:
        return pa.table(
            {
                "image_id": pa.array([], pa.string()),
                "bucket": pa.array([], pa.int64()),
                "minhash": pa.array([], t.schema.field("minhash").type)
                if "minhash" in t.schema.names
                else pa.array([], pa.null()),
            }
        )
    t, rep_idx = _bucket_partition_table(t)
    firsts = np.unique(rep_idx)
    sel = pa.array(firsts, pa.int64())
    parents = (
        t["bucket"].to_numpy()[firsts].view(np.uint64) // np.uint64(num_salts)
    ).view(np.int64)
    return pa.table(
        {
            "image_id": t["image_id"].take(sel),
            "bucket": pa.array(parents, pa.int64()),
            "minhash": t["minhash"].take(sel),
        }
    )


def candidate_pairs(minhash_ds, cfg: Config = DEFAULT_CONFIG, num_salts: int = 1):
    """Verified candidate pair Dataset: (id_a, id_b, jaccard_est), deduped.

    SHUFFLE 2 of SURVEY.md section 4.2: band explode -> groupby(bucket)
    -> per-group star edges with Jaccard verification. The same pair can
    surface from several bands — deduped by a final groupby.

    With num_salts > 1 (hot-bucket skew at scale), a second, much
    smaller pass links the sub-bucket representatives of each parent
    bucket so recall across sub-buckets is preserved.
    """
    from hmse_ray.stages.aggregates import hash_partitioned_groupby_arrow

    bands = minhash_ds.map_batches(
        lambda t: band_explode(t, cfg, num_salts, carry_sig=True),
        batch_format="pyarrow",
    )
    edges = hash_partitioned_groupby_arrow(
        bands, "bucket", lambda t: _star_edges_partition(t, cfg)
    )
    if num_salts > 1:
        reps = hash_partitioned_groupby_arrow(
            bands, "bucket", lambda t: _rep_rows_partition(t, num_salts)
        )
        link_edges = hash_partitioned_groupby_arrow(
            reps, "bucket", lambda t: _star_edges_partition(t, cfg)
        )
        edges = edges.union(link_edges)
    return dedup_pair_edges(edges)
