"""L4 LSH banding: bucket materialization, candidate pairs, salting (J2/T5).

Reference semantics (README.md:1553-1576, 1929-1945): each record's
n=128 signature is split into b=4 bands of r=32 rows; records colliding
in any band bucket are candidate near-duplicates; candidates are
verified by the signature-agreement Jaccard estimate, then delta-encoded.
The reference holds band tables as a shared in-memory index; Ray-Data-
first the bucket IS the shuffle group: ``groupby(band_id, band_hash)``
(SURVEY.md T5 — no materialized band tables anywhere).

Round-2 architecture (VERDICT r01 findings 1+4): the candidate shuffle
is NARROW — only (image_id, bucket) rows move through the bucket
groupby (~30 B/row instead of ~550 B/row with the 128xu32 signature
replicated onto every band row, a 4x payload cut on the flagship's
dominant shuffle). Verification runs as a SECOND keyed pass over the
(tiny) unverified pair set: candidate signatures are fetched from the
materialized signature table — filtered to candidate ids via a
broadcast id set when the pair table is small enough to collect — and
joined to pairs by hash-partitioning on id then on pair key, all
vectorized arrow kernels.

Skew (README.md:1929-1932 acknowledges ~165 chunks/bucket average and
unhandled hot buckets) is handled at two levels (round 4, VERDICT r3
item 1 — the driver-side detection round-trip is no longer on the
default path):

* LOCAL SPLIT (default, zero driver syncs): inside the bucket-partition
  kernel, any group larger than cfg.max_bucket_size splits into
  ceil(size / max_bucket_size) deterministic id-hash sub-groups; each
  emits star edges linearly and the sub-group representatives link via
  one star rooted at the group minimum — all within the partition the
  rows already landed in. Connectivity is identical to pre-shuffle
  salting; the cost of a hot bucket inside one reducer is O(size).
* PRE-SHUFFLE SALTING (scale path): when the input is large enough that
  one reducer holding a mega-bucket's rows is itself the problem
  (reducer MEMORY, not kernel time), a deterministic id-hash sample
  detects hot buckets (driver value_counts of the sample) and the
  explode stage salts them into sub-buckets before the shuffle, with a
  second, much smaller pass linking sub-bucket representatives. This
  pass costs one extra scan + a driver round-trip, so it engages
  automatically only past _PRESALT_MIN_ROWS rows (where it amortizes),
  or explicitly via presalt=True. The parent bucket is carried as its
  own column (no modular recovery — the round-1 bucket//num_salts trick
  silently split parents when num_salts wasn't a power of two).

``num_salts`` forces uniform pre-shuffle salting (tests / known-skew
corpora); ``num_salts=1`` pins the fully-unsalted, unsplit path (the
SQL oracles reproduce unsalted banding).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from hmse_ray.config import Config, DEFAULT_CONFIG
from hmse_ray.functions import simhash
from hmse_ray.stages.aggregates import (distinct_pairs,
                                         hash_partitioned_groupby_arrow,
                                         pack_pair_key)

# distinct multipliers mix band_id into the 64-bit bucket key space;
# collisions across bands are ~2^-64 and only cost a false candidate
_BAND_MIX = np.uint64(0xA24BAED4963EE407)
_SIMHASH_MIX = np.uint64(0x9FB21C651E98DF25)
_SALT_MIX = np.uint64(0xC2B2AE3D27D4EB4F)  # odd: salt*mix never collides salts mod 2^64

# Below this many unverified pairs, candidate ids are collected on the
# driver and broadcast so the verify pass ships ONLY candidate
# signatures (ids ~50 B each -> ~200 MB driver heap at the limit).
# Above it, the full signature table moves once through the attach
# shuffle — still 4x less than the round-1 every-band replication.
_PAIR_BROADCAST_LIMIT = 2_000_000

# Bytes per exploded band row (id + bucket + overhead), used to size
# shuffle partitions by data volume.
_BAND_ROW_BYTES = 48

# Below this many input rows the hot-bucket sampling pass costs more
# wall time (one extra scan + a driver round-trip) than local splitting
# saves; past it, pre-shuffle salting protects reducer memory and the
# pass amortizes. ~5M rows x 4 bands x 48 B ~= 1 GB of band rows — the
# point where a single mega-bucket partition starts to matter.
_PRESALT_MIN_ROWS = 5_000_000


def dedup_pair_edges(edges_ds, val_col: str | None = "jaccard_est"):
    """Deduplicate (id_a, id_b[, val]) edges emitted by several bands
    (arrow-native hash-partitioned distinct; see aggregates.distinct_pairs)."""
    return distinct_pairs(edges_ds, val_col=val_col)


_EMPTY_EDGES = pa.table(
    {
        "id_a": pa.array([], pa.string()),
        "id_b": pa.array([], pa.string()),
        "jaccard_est": pa.array([], pa.float64()),
    }
)


def _combine(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _id_hash(ids: pa.Array) -> np.ndarray:
    """Deterministic uint64 hash per string id (C-level siphash)."""
    return pd.util.hash_array(ids.to_numpy(zero_copy_only=False)).astype(np.uint64)


# --------------------------------------------------------------- band explode


def band_explode(sig_batch: pa.Table, cfg: Config,
                 hot: tuple[np.ndarray, np.ndarray] | None = None,
                 num_salts: int = 1) -> pa.Table:
    """One signed row -> b NARROW rows (image_id, bucket[, parent]).

    bucket = band_hash * MIX + band_id — a single int64 key so
    downstream shuffles never group on composite string keys. With
    salting (uniform ``num_salts`` > 1, or per-bucket via the ``hot``
    (sorted_buckets, salt_counts) pair), salted rows get
    bucket += salt * SALT_MIX and carry the unsalted parent bucket in a
    nullable ``parent`` column (null = unsalted row).
    """
    n = sig_batch.num_rows
    b = cfg.num_bands
    ids = _combine(sig_batch["image_id"])
    raw = np.empty((b, n), dtype=np.uint64)
    for band in range(b):
        bh = sig_batch[f"band_h{band}"].to_numpy().view(np.uint64)
        raw[band] = bh * _BAND_MIX + np.uint64(band)
    return _exploded_bucket_table(raw, ids, hot, num_salts)


def _exploded_bucket_table(raw: np.ndarray, ids: pa.Array,
                           hot: tuple[np.ndarray, np.ndarray] | None,
                           num_salts: int) -> pa.Table:
    """(nb, n) raw band buckets + ids -> narrow exploded table
    (image_id, bucket[, parent]) with uniform or per-hot-bucket
    salting — the ONE implementation of the salt/parent scheme, shared
    by the minhash and simhash explodes (a fix to e.g. the hot-lookup
    searchsorted boundary must not have to land in two places)."""
    nb, n = raw.shape
    salted = num_salts > 1 or (hot is not None and len(hot[0]) > 0)
    cols: dict = {"image_id": pa.concat_arrays([ids] * nb)}
    if not salted:
        cols["bucket"] = pa.array(raw.ravel().view(np.int64), pa.int64())
        return pa.table(cols)
    if num_salts > 1:
        S = np.full((nb, n), num_salts, dtype=np.uint64)
    else:
        hot_keys, hot_salts = hot
        S = np.ones((nb, n), dtype=np.uint64)
        for band in range(nb):
            pos = np.searchsorted(hot_keys, raw[band])
            pos_c = np.minimum(pos, len(hot_keys) - 1)
            m = hot_keys[pos_c] == raw[band]
            S[band][m] = hot_salts[pos_c[m]]
    idh = _id_hash(ids)
    salt = idh[None, :] % S
    child = raw + salt * _SALT_MIX
    unsalted = (S == 1).ravel()
    cols["bucket"] = pa.array(child.ravel().view(np.int64), pa.int64())
    cols["parent"] = pa.array(raw.ravel().view(np.int64), pa.int64(), mask=unsalted)
    return pa.table(cols)


def simhash_band_explode(sim_batch: pa.Table, cfg: Config,
                         hot: tuple[np.ndarray, np.ndarray] | None = None,
                         num_salts: int = 1) -> pa.Table:
    """SimHash rows -> narrow (image_id, bucket[, parent]) rows: 4 x
    16-bit bands.

    By pigeonhole, images with Hamming distance <= num_bands-1 always
    share an intact band; planted near-dups (ham <= 3) are guaranteed
    candidates.
    """
    n = sim_batch.num_rows
    ids = _combine(sim_batch["image_id"])
    bands = simhash.simhash_band_cols(
        sim_batch["simhash"].to_numpy(), cfg
    )  # (n, bands) uint64
    nb = bands.shape[1]
    raw = np.empty((nb, n), dtype=np.uint64)
    for band in range(nb):
        raw[band] = bands[:, band] * _SIMHASH_MIX + np.uint64(band + 1000)
    return _exploded_bucket_table(raw, ids, hot, num_salts)


# ------------------------------------------------------- hot-bucket detection


def detect_hot_buckets(ds, cfg: Config, explode_fn, n_rows: int | None = None,
                       target_sample: int = 200_000):
    """Deterministic sample -> (sorted_buckets, salt_counts) for buckets
    whose estimated size exceeds cfg.max_bucket_size, or None.

    Sampling keeps ids whose hash falls in 1/k of the space (k sized so
    ~target_sample rows survive); bucket occupancy in the sample scales
    by the rate. At bench scale the "sample" is the full table (k=1,
    exact counts); at 10^12 rows only ~target_sample rows ever reach the
    driver. Buckets a little over threshold that the sample misses are
    harmless (one task handles them); mega-buckets are caught with
    near-certainty.
    """
    if n_rows is None:
        n_rows = ds.count()
    k = max(1, n_rows // target_sample)

    def sample(t: pa.Table) -> pa.Table:
        ids = _combine(t["image_id"])
        keep = (_id_hash(ids) % np.uint64(k)) == 0
        return explode_fn(t.filter(pa.array(keep))).select(["bucket"])

    counts = (
        ds.map_batches(sample, batch_format="pyarrow")
        .to_pandas()["bucket"]
        .value_counts()
    )
    rate = 1.0 / k
    min_count = max(2, int(cfg.max_bucket_size * rate))
    hot = counts[counts > min_count]
    if hot.empty:
        return None
    est = (hot / rate).astype(np.int64)
    est = est[est > cfg.max_bucket_size]
    if est.empty:
        return None
    buckets = est.index.to_numpy().astype(np.int64).view(np.uint64)
    salts = np.clip(-(-est.to_numpy() // cfg.max_bucket_size), 2, 65536).astype(
        np.uint64
    )
    order = np.argsort(buckets)
    return buckets[order], salts[order]


# ------------------------------------------------- pass 1: narrow star edges


def _sorted_with_reps(t: pa.Table):
    """Sort one hash partition by (bucket, image_id); return (table,
    rep_idx per row, group-start indices)."""
    t = t.sort_by([("bucket", "ascending"), ("image_id", "ascending")])
    buckets = t["bucket"].to_numpy()
    n = len(buckets)
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = buckets[1:] != buckets[:-1]
    starts = np.nonzero(new)[0]
    rep_idx = starts[np.cumsum(new) - 1]
    return t, rep_idx, starts


_EMPTY_MIXED = pa.table(
    {
        "id_a": pa.array([], pa.string()),
        "id_b": pa.array([], pa.string()),
        "parent": pa.array([], pa.int64()),
    }
)


def _star_edge_indices(starts: np.ndarray, sizes: np.ndarray,
                       idh: np.ndarray | None, cap: int | None
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Row-index (a, b) arrays of star edges over sorted groups
    (a=rep row, b=member row, self-edges excluded). Groups larger than
    ``cap`` split LOCALLY into idh %% ns sub-groups (ns = ceil(size /
    cap)): each sub-group stars around its min-id row and the sub-reps
    link via one star rooted at the group's min-id row — connectivity
    identical to pre-shuffle salting, no driver round-trip, no second
    shuffle. Normal groups are fully vectorized; the per-group loop runs
    only over the (rare by definition) over-cap groups."""
    n = int(sizes.sum())
    over = sizes > cap if cap is not None else np.zeros(len(starts), dtype=bool)
    rep_per_row = np.repeat(starts, sizes)
    rows = np.arange(n)
    m = ~np.repeat(over, sizes) & (rows != rep_per_row)
    a_out, b_out = [rep_per_row[m]], [rows[m]]
    for gi in np.nonzero(over)[0]:
        s, size = int(starts[gi]), int(sizes[gi])
        g = np.arange(s, s + size)
        ns = -(-size // cap)
        salts = idh[g] % np.uint64(ns)
        order = np.argsort(salts, kind="stable")  # stable: min id first per salt
        gs, ss = g[order], salts[order]
        newg = np.empty(size, dtype=bool)
        newg[0] = True
        newg[1:] = ss[1:] != ss[:-1]
        sub_starts = np.nonzero(newg)[0]
        subrep = gs[sub_starts[np.cumsum(newg) - 1]]
        mm = gs != subrep
        a_out.append(subrep[mm])
        b_out.append(gs[mm])
        reps = gs[newg]  # g[0] (group min id) is first in its salt -> a sub-rep
        link = reps[reps != g[0]]
        a_out.append(np.full(link.size, g[0], dtype=np.int64))
        b_out.append(link)
    return np.concatenate(a_out), np.concatenate(b_out)


def _group_sizes(starts: np.ndarray, n: int) -> np.ndarray:
    return np.diff(np.append(starts, n))


def _maybe_idh(ids: pa.Array, sizes: np.ndarray, cap: int | None):
    """(idh, cap) for the split helper — idh computed only when some
    group actually exceeds cap (keeps the common path hash-free).

    The hash is avalanched (fmix64 core) before use: pre-shuffle
    salting partitions a hot bucket by RAW _id_hash %% S (band_explode),
    so inside one pre-salted sub-bucket every idh is congruent mod S —
    a local split by the same raw hash %% ns is then CONSTANT whenever
    ns shares a factor with S, the over-cap group never splits, and
    one reducer pays unbounded C(m,2). Mixing makes the local salt
    independent of any residue class of the raw hash."""
    if cap is not None and bool((sizes > cap).any()):
        h = _id_hash(ids)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        return h, cap
    return None, None


def _star_ids_partition(t: pa.Table, cap: int | None = None) -> pa.Table:
    """One hash partition of (image_id, bucket[, parent]) rows ->
    UNVERIFIED star edges (id_a=rep, id_b=member) — ids only — plus,
    for salted groups, one rep row per sub-bucket (id_a=rep, id_b="",
    parent=parent bucket) feeding the rep-link pass. Fully vectorized;
    groups over ``cap`` split locally (see _star_edge_indices)."""
    has_parent = "parent" in t.schema.names
    if t.num_rows == 0:
        return _EMPTY_MIXED if has_parent else _EMPTY_MIXED.drop_columns(["parent"])
    t, rep_idx, starts = _sorted_with_reps(t)
    n = t.num_rows
    ids = _combine(t["image_id"])
    sizes = _group_sizes(starts, n)
    idh, cap_eff = _maybe_idh(ids, sizes, cap)
    a_idx, b_idx = _star_edge_indices(starts, sizes, idh, cap_eff)
    id_a = ids.take(pa.array(a_idx, pa.int64()))
    id_b = ids.take(pa.array(b_idx, pa.int64()))
    if not has_parent:
        return pa.table({"id_a": id_a, "id_b": id_b})
    par = _combine(t["parent"])
    valid = np.asarray(par.is_valid())
    sel = starts[valid[starts]]
    m = len(sel)
    return pa.table(
        {
            "id_a": pa.concat_arrays([id_a, ids.take(pa.array(sel, pa.int64()))]),
            "id_b": pa.concat_arrays(
                [id_b, pa.array([""] * m, pa.string())]
            ),
            "parent": pa.concat_arrays(
                [pa.nulls(len(id_a), pa.int64()), par.take(pa.array(sel, pa.int64()))]
            ),
        }
    )


def _allpairs_partition(t: pa.Table, cap: int | None = None) -> pa.Table:
    """One hash partition of (image_id, bucket[, parent]) rows -> ALL
    within-bucket unverified pairs (plus rep rows for salted groups,
    star-shaped as before). Used when verification is EXACT (doc
    clustering): star edges can structurally miss a true member-member
    pair whose bucket rep fails verification, while all-pairs recall
    within a bucket is total. C(m,2) per bucket is bounded by ``cap``:
    over-cap groups emit all-pairs only within local id-hash sub-groups
    plus a rep-link star (the same approximation pre-shuffle salting
    makes — callers needing total recall pin num_salts=1)."""
    has_parent = "parent" in t.schema.names
    if t.num_rows == 0:
        return _EMPTY_MIXED if has_parent else _EMPTY_MIXED.drop_columns(["parent"])
    t, rep_idx, starts = _sorted_with_reps(t)
    n = t.num_rows
    ids = _combine(t["image_id"])
    sizes = _group_sizes(starts, n)
    idh, cap_eff = _maybe_idh(ids, sizes, cap)
    ia, ib = [], []
    # normal (not-over-cap) groups, vectorized BY SIZE CLASS: one
    # triu_indices per distinct size, broadcast over all that size's
    # group starts — no per-group Python for the overwhelmingly common
    # small buckets (sizes are bounded by cap, so few distinct classes)
    over = sizes > cap_eff if cap_eff is not None else np.zeros(
        len(starts), dtype=bool)
    norm = ~over & (sizes >= 2)
    for m in np.unique(sizes[norm]):
        gs = starts[norm & (sizes == m)]
        iu, ju = np.triu_indices(int(m), 1)
        ia.append((gs[:, None] + iu[None, :]).ravel())
        ib.append((gs[:, None] + ju[None, :]).ravel())
    for gi in np.nonzero(over)[0]:
        s, m = int(starts[gi]), int(sizes[gi])
        g = np.arange(s, s + m)
        ns = -(-m // cap_eff)
        salts = idh[g] % np.uint64(ns)
        order = np.argsort(salts, kind="stable")
        gs, ss = g[order], salts[order]
        newg = np.empty(m, dtype=bool)
        newg[0] = True
        newg[1:] = ss[1:] != ss[:-1]
        sub_starts = np.append(np.nonzero(newg)[0], m)
        for a0, a1 in zip(sub_starts[:-1], sub_starts[1:]):
            k = int(a1 - a0)
            if k < 2:
                continue
            iu, ju = np.triu_indices(k, 1)
            ia.append(gs[a0 + iu])
            ib.append(gs[a0 + ju])
        reps = gs[newg]
        link = reps[reps != g[0]]
        if link.size:
            ia.append(np.full(link.size, g[0], dtype=np.int64))
            ib.append(link)
    if ia:
        cat = np.concatenate(ia)
        id_a = ids.take(pa.array(cat, pa.int64()))
        id_b = ids.take(pa.array(np.concatenate(ib), pa.int64()))
    else:
        id_a = pa.array([], pa.string())
        id_b = pa.array([], pa.string())
    if not has_parent:
        return pa.table({"id_a": id_a, "id_b": id_b})
    par = _combine(t["parent"])
    valid = np.asarray(par.is_valid())
    sel = starts[valid[starts]]
    m = len(sel)
    return pa.table(
        {
            "id_a": pa.concat_arrays([id_a, ids.take(pa.array(sel, pa.int64()))]),
            "id_b": pa.concat_arrays([id_b, pa.array([""] * m, pa.string())]),
            "parent": pa.concat_arrays(
                [pa.nulls(len(id_a), pa.int64()), par.take(pa.array(sel, pa.int64()))]
            ),
        }
    )


def _rep_star_partition(t: pa.Table) -> pa.Table:
    """Rep-link pass: (image_id, bucket=parent) rows -> unverified star
    edges among the sub-bucket representatives of each parent."""
    if t.num_rows == 0:
        return _EMPTY_MIXED.drop_columns(["parent"])
    t, rep_idx, _ = _sorted_with_reps(t)
    n = t.num_rows
    ids = _combine(t["image_id"])
    nonrep = np.nonzero(np.arange(n) != rep_idx)[0]
    return pa.table(
        {
            "id_a": ids.take(pa.array(rep_idx[nonrep], pa.int64())),
            "id_b": ids.take(pa.array(nonrep, pa.int64())),
        }
    )


# -------------------------------------------- pass 2: signature verification


def _sig_list_array(M: np.ndarray, n_hashes: int) -> pa.ListArray:
    offsets = pa.array((np.arange(len(M) + 1) * n_hashes).astype(np.int32))
    return pa.ListArray.from_arrays(offsets, pa.array(M.ravel(), pa.uint32()))


def _empty_sig_list(n: int) -> pa.ListArray:
    return pa.ListArray.from_arrays(
        pa.array(np.zeros(n + 1, dtype=np.int32)), pa.array([], pa.uint32())
    )


def _combine_pair_groups(t: pa.Table, key_col: str, cfg: Config) -> pa.Table:
    """One hash partition of (key, jid, sig) rows, two rows per pair key
    -> verified (id_a, id_b, jaccard_est). Vectorized: sort, boundary
    scan, gathered (k, 128) uint32 agreement matrix."""
    if t.num_rows == 0:
        return _EMPTY_EDGES
    t = t.sort_by([(key_col, "ascending"), ("jid", "ascending")])
    n = t.num_rows
    keys = _combine(t[key_col])
    new = np.empty(n, dtype=bool)
    new[0] = True
    if n > 1:
        if pa.types.is_integer(keys.type):
            kn = keys.to_numpy()
            new[1:] = kn[1:] != kn[:-1]
        else:
            new[1:] = np.invert(
                np.asarray(pc.equal(keys.slice(1), keys.slice(0, n - 1)))
            )
    starts = np.nonzero(new)[0]
    sizes = np.diff(np.append(starts, n))
    good = starts[sizes == 2]  # both sigs resolved (collision-free)
    if len(good) == 0:
        return _EMPTY_EDGES
    nh = cfg.num_hashes
    arr = _combine(t["sig"])
    offs = arr.offsets.to_numpy()
    vals = np.asarray(arr.values)
    ga = vals[offs[good][:, None] + np.arange(nh)]
    gb = vals[offs[good + 1][:, None] + np.arange(nh)]
    est = (ga == gb).mean(axis=1)
    keep = np.nonzero(est >= cfg.jaccard_threshold)[0]
    ids = _combine(t["jid"])
    return pa.table(
        {
            "id_a": ids.take(pa.array(good[keep], pa.int64())),
            "id_b": ids.take(pa.array(good[keep] + 1, pa.int64())),
            "jaccard_est": pa.array(est[keep], pa.float64()),
        }
    )


def _scatter_sig_rows(t: pa.Table, id_hash_fn, ch: np.ndarray,
                      cpid: np.ndarray, cid: np.ndarray, nh: int) -> pa.Table:
    """Fast-path scatter kernel: probe each signature row's id hash into
    the sorted candidate index (ch), emit one (pair_id, jid, sig) row
    per slot whose candidate id string EXACTLY matches (collision-safe —
    ADVICE r2), dropping hash-only false matches."""
    ids = _combine(t["image_id"])
    h = id_hash_fn(ids)
    left = np.searchsorted(ch, h, side="left")
    right = np.searchsorted(ch, h, side="right")
    counts = right - left
    total = int(counts.sum())
    empty = pa.table(
        {
            "pair_id": pa.array([], pa.int64()),
            "jid": pa.array([], pa.string()),
            "sig": _empty_sig_list(0),
        }
    )
    if total == 0:
        return empty
    sel = np.repeat(np.arange(len(h)), counts)
    within = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
    slot = np.repeat(left, counts) + within
    jids = ids.take(pa.array(sel, pa.int64()))
    ok = np.asarray(jids.to_numpy(zero_copy_only=False)).astype(str) == cid[slot]
    if not ok.all():
        sel, slot = sel[ok], slot[ok]
        if sel.size == 0:
            return empty
        jids = ids.take(pa.array(sel, pa.int64()))
    M = np.asarray(_combine(t["minhash"]).flatten()).reshape(
        t.num_rows, nh
    )
    return pa.table(
        {
            "pair_id": pa.array(cpid[slot], pa.int64()),
            "jid": jids,
            "sig": _sig_list_array(np.ascontiguousarray(M[sel]), nh),
        }
    )


def verify_pairs(pairs_ds, signed_ds, cfg: Config = DEFAULT_CONFIG):
    """Unverified (id_a, id_b) pairs -> (id_a, id_b, jaccard_est) with
    est >= cfg.jaccard_threshold.

    Fast path (pair table fits the driver, the common case since pairs
    are only near-dup members): broadcast a sorted (id_hash -> pair_id,
    id) index; each signature row scatters itself directly into its
    pair groups, so candidate signatures move through ONE int64-keyed
    shuffle and non-candidate signatures never leave their block.
    EXACT regardless of 64-bit hash collisions: after the searchsorted
    probe every scattered row is string-verified against the candidate
    id it claims to match (ADVICE r2: a non-candidate corpus id
    colliding with a candidate id must not pollute a pair group), and
    intra-candidate collisions additionally fall back to the general
    path.

    General path (huge pair sets): pairs fan out into per-id half-edge
    rows, co-partitioned with ALL signature rows on hash(id) (signatures
    move once — still 4x less than replicating them onto every band
    row), then regroup on the pair key. No per-row Python anywhere.
    """
    import ray.data as rd

    pairs_ds = pairs_ds.materialize()
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        return rd.from_arrow(_EMPTY_EDGES)
    nh = cfg.num_hashes
    if n_pairs <= _PAIR_BROADCAST_LIMIT:
        # dedup on the driver (the same pair surfaces from several
        # bands) — saves a whole distinct shuffle on this path
        pt = pairs_ds.to_pandas().drop_duplicates(["id_a", "id_b"])
        n_pairs = len(pt)
        ids_all = np.concatenate([pt["id_a"].to_numpy(), pt["id_b"].to_numpy()])
        uniq_ids = np.unique(ids_all)
        uh = pd.util.hash_array(uniq_ids).astype(np.uint64)
        if len(np.unique(uh)) == len(uh):  # collision-free: exact
            pair_ids = np.concatenate([np.arange(n_pairs), np.arange(n_pairs)]).astype(
                np.int64
            )
            h_all = pd.util.hash_array(ids_all).astype(np.uint64)
            order = np.argsort(h_all, kind="stable")
            ref = ray.put(
                (h_all[order], pair_ids[order], ids_all[order].astype(str))
            )

            def sig_pair_rows(t: pa.Table) -> pa.Table:
                ch, cpid, cid = ray.get(ref)
                return _scatter_sig_rows(t, _id_hash, ch, cpid, cid, nh)

            scattered = signed_ds.map_batches(sig_pair_rows, batch_format="pyarrow")
            return hash_partitioned_groupby_arrow(
                scattered, "pair_id", lambda t: _combine_pair_groups(t, "pair_id", cfg)
            )

    # general (huge-pair-set) path: distributed distinct first — the
    # combine kernel requires exactly two rows per pair key
    pairs_ds = distinct_pairs(pairs_ds, val_col=None).materialize()

    def sig_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        M = np.asarray(_combine(t["minhash"]).flatten()).reshape(n, nh)
        return pa.table(
            {
                "jid": t["image_id"],
                "pairkey": pa.array([""] * n, pa.string()),
                "sig": _sig_list_array(M, nh),
            }
        )

    def half_edges(t: pa.Table) -> pa.Table:
        key = _combine(pack_pair_key(t["id_a"], t["id_b"]))
        n = t.num_rows
        return pa.table(
            {
                "jid": pa.concat_arrays([_combine(t["id_a"]), _combine(t["id_b"])]),
                "pairkey": pa.concat_arrays([key, key]),
                "sig": _empty_sig_list(2 * n),
            }
        )

    both = signed_ds.map_batches(sig_rows, batch_format="pyarrow").union(
        pairs_ds.map_batches(half_edges, batch_format="pyarrow")
    )

    def attach(t: pa.Table) -> pa.Table:
        is_sig = pc.equal(t["pairkey"], "")
        sigs = t.filter(is_sig)
        he = t.filter(pc.invert(is_sig))
        if he.num_rows == 0 or sigs.num_rows == 0:
            return pa.table(
                {
                    "pairkey": pa.array([], pa.string()),
                    "jid": pa.array([], pa.string()),
                    "sig": _empty_sig_list(0),
                }
            )
        idx = pc.index_in(he["jid"], value_set=_combine(sigs["jid"]))
        taken = _combine(sigs["sig"]).take(idx)
        out = pa.table({"pairkey": he["pairkey"], "jid": he["jid"], "sig": taken})
        return out.filter(pc.is_valid(out["sig"]))

    attached = hash_partitioned_groupby_arrow(both, "jid", attach)
    return hash_partitioned_groupby_arrow(
        attached, "pairkey", lambda t: _combine_pair_groups(t, "pairkey", cfg)
    )


# ------------------------------------------------------------ candidate pairs


def _band_columns(cfg: Config) -> list[str]:
    return [f"band_h{b}" for b in range(cfg.num_bands)]


def candidate_edges(signed, cfg: Config = DEFAULT_CONFIG,
                    num_salts: int | None = None, n_rows: int | None = None,
                    edge_shape: str = "star", presalt: bool | None = None):
    """UNVERIFIED candidate-edge Dataset (id_a, id_b) from a
    MATERIALIZED signed Dataset — the banding half of candidate_pairs,
    exposed so callers can plug in their own verification (e.g.
    doc_clusters' exact-Jaccard shuffle join instead of the signature
    estimate). Edges are NOT deduped (the same pair can surface from
    several bands); every verifier dedups as part of its pair-keyed
    shuffle.

    edge_shape="star" (default): rep-member edges per bucket — the
    cheap shape used with signature-estimate verification where the
    rep transitively links members. edge_shape="all": every
    within-bucket pair — required when edges are EXACT-verified and a
    failing rep edge must not orphan a true member-member pair; split
    sub-buckets still link via rep stars (documented approximation —
    splitting only triggers past cfg.max_bucket_size).

    Skew handling (module docstring): num_salts=None (default) splits
    over-cap groups LOCALLY in the partition kernel — no detection
    pass, no driver round-trip — and additionally pre-shuffle-salts
    detected hot buckets when the input is big enough for one reducer's
    memory to be at risk (n_rows >= _PRESALT_MIN_ROWS, or presalt=True).
    num_salts=1 pins the fully-unsalted path; num_salts>1 forces
    uniform pre-shuffle salting."""
    if n_rows is None:
        n_rows = signed.count()
    narrow = signed.select_columns(["image_id"] + _band_columns(cfg))
    hot = None
    ns = 1
    cap = None
    if num_salts is None:
        cap = cfg.max_bucket_size
        if presalt or (presalt is None and n_rows >= _PRESALT_MIN_ROWS):
            hot = detect_hot_buckets(
                narrow, cfg, lambda t: band_explode(t, cfg), n_rows=n_rows
            )
    elif num_salts > 1:
        ns = num_salts
    base_fn = _star_ids_partition if edge_shape == "star" else _allpairs_partition
    part_fn = lambda t: base_fn(t, cap=cap)  # noqa: E731

    hot_ref = ray.put(hot) if hot is not None else None

    def explode(t: pa.Table) -> pa.Table:
        h = ray.get(hot_ref) if hot_ref is not None else None
        return band_explode(t, cfg, hot=h, num_salts=ns)

    bands = narrow.map_batches(explode, batch_format="pyarrow")
    est_bytes = n_rows * cfg.num_bands * _BAND_ROW_BYTES
    mixed = hash_partitioned_groupby_arrow(
        bands, "bucket", part_fn, est_bytes=est_bytes
    )
    if hot is not None or ns > 1:
        # two consumers (edges filter + rep-link) — without a
        # materialize Ray Data executes the whole explode+bucket
        # shuffle (the pipeline's biggest) once PER consumer; the
        # pinned mixed table is edges+reps, far smaller than the input
        mixed = mixed.materialize()
        edges = mixed.map_batches(
            lambda t: t.filter(pc.not_equal(t["id_b"], "")).select(["id_a", "id_b"]),
            batch_format="pyarrow",
        )
        reps = mixed.map_batches(
            lambda t: (
                lambda f: pa.table({"image_id": f["id_a"], "bucket": f["parent"]})
            )(t.filter(pc.equal(t["id_b"], ""))),
            batch_format="pyarrow",
        )
        link = hash_partitioned_groupby_arrow(reps, "bucket", _rep_star_partition)
        edges = edges.union(link)
    else:
        edges = mixed
    return edges


def candidate_pairs(minhash_ds, cfg: Config = DEFAULT_CONFIG,
                    num_salts: int | None = None):
    """Verified candidate pair Dataset: (id_a, id_b, jaccard_est), deduped.

    SHUFFLE 2 of SURVEY.md section 4.2, round-2 shape: materialize the
    signed table once (it is the signature index — also the natural
    checkpoint), explode NARROW (image_id, bucket) band rows, groupby
    bucket for unverified star edges (over-cap buckets split locally —
    see candidate_edges), dedup, then verify against fetched signatures
    (see verify_pairs). num_salts=None (default) needs no driver
    detection round-trip; an explicit value forces uniform pre-shuffle
    salting (tests / known-skew corpora).
    """
    signed = minhash_ds.materialize()
    edges = candidate_edges(signed, cfg, num_salts=num_salts)
    # dedup happens inside verify_pairs (driver-side when the pair set
    # is small, a distributed distinct otherwise) — no extra shuffle
    return verify_pairs(edges, signed, cfg)


# ----------------------------------------------------------- simhash variant


def _simhash_star_partition(t: pa.Table, cfg: Config,
                            cap: int | None = None) -> pa.Table:
    """All Hamming-verified SimHash star edges of one hash partition;
    with salting also emits rep rows (id_b="", parent) per sub-bucket.
    The 8-byte simhash payload rides the narrow shuffle (unlike the
    512-byte minhash, it is cheaper to carry than to re-fetch). Groups
    over ``cap`` split locally; every emitted edge (member->sub-rep and
    sub-rep->rep link alike) is Hamming-verified in-partition."""
    has_parent = "parent" in t.schema.names
    if t.num_rows == 0:
        base = pa.table(
            {
                "id_a": pa.array([], pa.string()),
                "id_b": pa.array([], pa.string()),
                "jaccard_est": pa.array([], pa.float64()),
            }
        )
        if has_parent:
            base = base.append_column("parent", pa.array([], pa.int64())).append_column(
                "simhash", pa.array([], pa.int64())
            )
        return base
    t, rep_idx, starts = _sorted_with_reps(t)
    n = t.num_rows
    sims = t["simhash"].to_numpy()
    ids = _combine(t["image_id"])
    sizes = _group_sizes(starts, n)
    idh, cap_eff = _maybe_idh(ids, sizes, cap)
    a_idx, b_idx = _star_edge_indices(starts, sizes, idh, cap_eff)
    ham = simhash.hamming64(sims[b_idx], sims[a_idx])
    keep = ham <= cfg.simhash_hamming_threshold
    a_k, b_k = a_idx[keep], b_idx[keep]
    out = {
        "id_a": ids.take(pa.array(a_k, pa.int64())),
        "id_b": ids.take(pa.array(b_k, pa.int64())),
        "jaccard_est": pa.array(1.0 - ham[keep] / 64.0, pa.float64()),
    }
    if not has_parent:
        return pa.table(out)
    par = _combine(t["parent"])
    valid = np.asarray(par.is_valid())
    sel = starts[valid[starts]]
    m = len(sel)
    sel_a = pa.array(sel, pa.int64())
    n_kept = len(a_k)
    return pa.table(
        {
            "id_a": pa.concat_arrays([out["id_a"], ids.take(sel_a)]),
            "id_b": pa.concat_arrays([out["id_b"], pa.array([""] * m, pa.string())]),
            "jaccard_est": pa.concat_arrays(
                [out["jaccard_est"], pa.nulls(m, pa.float64())]
            ),
            "parent": pa.concat_arrays([pa.nulls(n_kept, pa.int64()), par.take(sel_a)]),
            "simhash": pa.concat_arrays(
                [pa.nulls(n_kept, pa.int64()), _combine(t["simhash"]).take(sel_a)]
            ),
        }
    )


def simhash_candidate_pairs(simhash_ds, cfg: Config = DEFAULT_CONFIG,
                            num_salts: int | None = None, dedup: bool = True):
    """Verified image near-dup pairs: (id_a, id_b, jaccard_est=1-ham/64).

    Same narrow-shuffle + local-split/pre-salt harness as the MinHash
    path (see candidate_edges); the simhash itself (8 bytes) rides the
    band rows, so verification is in-bucket (no second fetch pass
    needed).

    dedup=False (VERDICT r3 item 1) returns the verified edges LAZY and
    UNDEDUPED (the same pair can surface from several bands with the
    same deterministic jaccard_est): the flagship clustering path
    consumes edges through union-find, which is dedup-agnostic, so the
    materialize + driver-dedup barrier here would be pure latency.
    Pair-ENUMERATION consumers keep the default dedup=True."""
    sims = simhash_ds.materialize()
    n_rows = sims.count()
    hot = None
    ns = 1
    cap = None
    if num_salts is None:
        cap = cfg.max_bucket_size
        if n_rows >= _PRESALT_MIN_ROWS:
            hot = detect_hot_buckets(
                sims, cfg, lambda t: simhash_band_explode(t, cfg), n_rows=n_rows
            )
    elif num_salts > 1:
        ns = num_salts

    hot_ref = ray.put(hot) if hot is not None else None

    def explode(t: pa.Table) -> pa.Table:
        h = ray.get(hot_ref) if hot_ref is not None else None
        out = simhash_band_explode(t, cfg, hot=h, num_salts=ns)
        if t.num_rows == 0:
            return out.append_column("simhash", pa.array([], pa.int64()))
        nb = out.num_rows // t.num_rows
        return out.append_column(
            "simhash", pa.concat_arrays([_combine(t["simhash"])] * nb)
        )

    bands = sims.select_columns(["image_id", "simhash"]).map_batches(
        explode, batch_format="pyarrow"
    )
    est_bytes = n_rows * cfg.simhash_bands * (_BAND_ROW_BYTES + 8)
    mixed = hash_partitioned_groupby_arrow(
        bands, "bucket", lambda t: _simhash_star_partition(t, cfg, cap=cap),
        est_bytes=est_bytes,
    )
    if hot is not None or ns > 1:
        mixed = mixed.materialize()  # two consumers: see candidate_edges
        edges = mixed.map_batches(
            lambda t: t.filter(pc.not_equal(t["id_b"], "")).select(
                ["id_a", "id_b", "jaccard_est"]
            ),
            batch_format="pyarrow",
        )
        reps = mixed.map_batches(
            lambda t: (
                lambda f: pa.table(
                    {
                        "image_id": f["id_a"],
                        "bucket": f["parent"],
                        "simhash": f["simhash"],
                    }
                )
            )(t.filter(pc.equal(t["id_b"], ""))),
            batch_format="pyarrow",
        )
        link = hash_partitioned_groupby_arrow(
            reps, "bucket", lambda t: _simhash_star_partition(t, cfg)
        )
        edges = edges.union(link)
    else:
        edges = mixed
    if not dedup:  # lazy, undeduped — the clustering path's shape
        return edges
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges <= _PAIR_BROADCAST_LIMIT:
        # tiny pair set: dedup on the driver instead of a whole shuffle
        import ray.data as rd

        if n_edges == 0:
            return rd.from_arrow(_EMPTY_EDGES)
        pt = (
            edges.to_pandas()
            .groupby(["id_a", "id_b"], as_index=False, sort=False)["jaccard_est"]
            .max()
        )
        return rd.from_arrow(
            pa.Table.from_pandas(pt, preserve_index=False).cast(_EMPTY_EDGES.schema)
        )
    return dedup_pair_edges(edges)


# ------------------------------------------------------------------ hit rate


def similarity_hit_rate(minhash_ds, cfg: Config = DEFAULT_CONFIG):
    """A3 (VALIDATION_METHODS.md:264): N_LSH_matches / N_candidate_pairs.

    One row: n_candidates (distinct unverified band-collision pairs),
    n_matches (pairs passing Jaccard verification), hit_rate.
    """
    signed = minhash_ds.materialize()
    n_rows = signed.count()
    narrow = signed.select_columns(["image_id"] + _band_columns(cfg))
    bands = narrow.map_batches(
        lambda t: band_explode(t, cfg), batch_format="pyarrow"
    )
    mixed = hash_partitioned_groupby_arrow(
        bands, "bucket", _star_ids_partition,
        est_bytes=n_rows * cfg.num_bands * _BAND_ROW_BYTES,
    )
    uniq = distinct_pairs(mixed, val_col=None).materialize()
    n_candidates = uniq.count()
    n_matches = verify_pairs(uniq, signed, cfg).count()
    return pd.DataFrame(
        [
            {
                "n_candidates": n_candidates,
                "n_matches": n_matches,
                "hit_rate": n_matches / max(1, n_candidates),
            }
        ]
    )


def membership_rows(minhash_ds, simhash_ds, cfg: Config = DEFAULT_CONFIG):
    """Narrow (image_id, bucket) membership for bipartite clustering.

    NO salting here, by design: the bipartite min-label path uses only
    combiner-based Min aggregates, which pre-aggregate hot buckets
    map-side before the shuffle — salting would instead SPLIT clusters.
    """
    m = minhash_ds.map_batches(
        lambda t: band_explode(t, cfg), batch_format="pyarrow"
    )
    if simhash_ds is not None:
        s = simhash_ds.map_batches(
            lambda t: simhash_band_explode(t, cfg), batch_format="pyarrow"
        )
        m = m.union(s)
    return m
