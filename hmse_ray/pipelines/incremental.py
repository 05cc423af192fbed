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
    tests/test_incremental.py::TestBloomSemijoin).
    """
    import ray

    from hmse_ray.functions.bloom import Bloom, build_from_dataset

    # materialize once: the bloom build and the co-partition shuffle both
    # consume the delta's (sha, id) rows — without this the delta texts
    # would be re-sha256-hashed a second time inside _assign (ADVICE r4)
    delta = sha_rows(delta_ds, id_col, text_col).materialize()
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


# ====================================================== incremental NEAR-dup
#
# The reference's L4 is ONLINE like its L3: each new record's MinHash
# signature probes the persisted band tables — collision -> candidate,
# signature-estimate verify -> delta-encode against the matched base and
# do NOT insert; no verified match -> store full and INSERT the record's
# band entries + signature (README.md:1553-1576). The batch analog here
# extends the exact-sha machinery above to LSH:
#
# - the persisted near-dup index is two narrow parquet tables: band rows
#   (bucket:int64, image_id) — one row per (record, band), the exact
#   shape lsh.band_explode shuffles — and the signature table
#   (image_id, minhash, band_h*), the verification side;
# - ingesting a delta shard = sign the delta (actor pool), explode its
#   band rows, ONE co-partition shuffle on the int64 bucket key against
#   the index band rows (optionally Bloom-prefiltered by the delta's
#   bucket set — functions/bloom.py int64 keys — so the shuffle carries
#   ~|delta| x bands x (1+fpp) index rows instead of |index| x bands),
#   emitting candidate (delta, base) probe pairs and within-delta
#   (earlier, later) pairs per bucket;
# - candidates are verified by the signature-agreement estimate
#   (stages/lsh.verify_pairs — candidate signatures move through one
#   int64-keyed shuffle; non-candidates never leave their block);
# - assignment reproduces the reference's ONLINE insertion order
#   exactly: processing delta records in ascending id order, a record is
#   NEW iff it has no verified index match and no verified EARLIER-NEW
#   delta match (those are precisely the entries the online index would
#   contain when it is probed); otherwise canonical = min over (verified
#   base matches ∪ verified earlier-new delta matches). Matched records
#   are never inserted, so chains do not form — matching the reference,
#   where a delta-encoded record never enters the band tables.
#
# Because the rule is "the index as of this record's turn", ingesting
# delta1 then delta2 (ids(delta1) < ids(delta2)) is IDENTICAL to
# ingesting delta1 ∪ delta2 in one shot — the fold-equivalence that
# makes repeated shard ingests converge to the single-run answer
# (pinned in tests/test_incremental.py::TestNeardupIngest).
#
# Scale notes: the only driver-side state is the verified match graph —
# bounded by the number of DUPLICATE records in one delta shard, not by
# the corpus or the shard (limit-gated at _NEARDUP_COLLECT_LIMIT with a
# "split the shard" error; splitting is lossless by fold-equivalence).
# Band explode is unsalted so results match the SQL oracle bit-for-bit;
# mega-bucket protection is the explicit ``bucket_cap`` knob (min-id
# representative probing, a documented recall approximation) rather than
# silent salting.

_NEARDUP_COLLECT_LIMIT = 5_000_000


def _caption_rows(docs_ds, id_col: str, text_col: str):
    import pyarrow.compute as pc

    def conv(t: pa.Table) -> pa.Table:
        return pa.table({
            "image_id": pc.cast(t[id_col], pa.string()),
            "caption": t[text_col],
        })

    return docs_ds.map_batches(conv, batch_format="pyarrow")


def sign_minhash(docs_ds, cfg, id_col: str = "doc_id", text_col: str = "text"):
    """(id, text) Dataset -> signed Dataset (image_id:string, minhash,
    band_h0..band_h{b-1}) via the MinHash actor pool."""
    from hmse_ray.stages import signatures

    return signatures.minhash_stage(_caption_rows(docs_ds, id_col, text_col), cfg)


def _normalize_sigs(cfg):
    """Cast the minhash column to fixed_size_list so parquet-loaded
    (plain list) and freshly-signed sides union under one schema."""
    nh = cfg.num_hashes

    def fn(t: pa.Table) -> pa.Table:
        col = t["minhash"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_fixed_size_list(col.type):
            return t
        arr = pa.FixedSizeListArray.from_arrays(col.flatten(), nh)
        return t.set_column(t.schema.get_field_index("minhash"), "minhash", arr)

    return fn


def band_rows(signed_ds, cfg):
    """Signed Dataset -> narrow (image_id, bucket:int64) band rows
    (unsalted lsh.band_explode — the persisted index shape)."""
    from hmse_ray.stages import lsh

    cols = ["image_id"] + [f"band_h{b}" for b in range(cfg.num_bands)]
    return signed_ds.select_columns(cols).map_batches(
        lambda t: lsh.band_explode(t, cfg), batch_format="pyarrow"
    )


def build_neardup_index(docs_ds, cfg, id_col: str = "doc_id",
                        text_col: str = "text"):
    """Base-run near-dup index: (band rows Dataset, signature Dataset).

    Every base record is an index entry (the base corpus is treated as
    already-ingested history, the state the reference's online inserts
    leave behind)."""
    sigs = sign_minhash(docs_ds, cfg, id_col, text_col).materialize()
    return band_rows(sigs, cfg), sigs


def persist_neardup_index(bands_ds, sigs_ds, path: str) -> str:
    """Write band rows + signatures as two parquet subdirs under one
    atomically-committed directory (same _SUCCESS convention as
    persist_index)."""
    tmp = path + ".tmp"
    bands_ds.write_parquet(os.path.join(tmp, "bands"))
    sigs_ds.write_parquet(os.path.join(tmp, "sigs"))
    os.rename(tmp, path)
    with open(os.path.join(path, "_SUCCESS"), "w", encoding="utf-8") as f:
        f.write("")
    return path


def load_neardup_index(path: str):
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        raise FileNotFoundError(f"near-dup index at {path} has no _SUCCESS marker")
    return (rd.read_parquet(os.path.join(path, "bands")),
            rd.read_parquet(os.path.join(path, "sigs")))


_PAIR_COPART_SCHEMA = pa.schema([
    ("bucket", pa.int64()),
    ("base_id", pa.string()),
    ("delta_id", pa.string()),
])

_EMPTY_CAND = pa.table({
    "kind": pa.array([], pa.int64()),
    "id_a": pa.array([], pa.string()),
    "id_b": pa.array([], pa.string()),
})


def _bucket_pairs_kernel(cap: int | None):
    """Per-partition kernel over co-partitioned band rows: emit
    candidate pairs per bucket — kind=0 probe (id_a=delta, id_b=base,
    full cross product) and kind=1 within-delta (numeric id_a < id_b,
    all pairs). With ``cap``, over-cap buckets degrade to min-id
    representative probing/starring (documented recall approximation;
    the oracle-checked path runs cap=None)."""

    def merge(left: pa.Table, right: pa.Table) -> pa.Table:
        if right.num_rows == 0:
            return _EMPTY_CAND
        R = pd.DataFrame({
            "bucket": right["bucket"].to_numpy(),
            "d": right["delta_id"].to_pandas(),
        })
        frames = []
        if left.num_rows:
            L = pd.DataFrame({
                "bucket": left["bucket"].to_numpy(),
                "b": left["base_id"].to_pandas(),
            })
            if cap is not None and len(L) and len(R):
                ln = L.groupby("bucket")["b"].transform("size")
                rmap = R.groupby("bucket")["d"].size()
                rn = L["bucket"].map(rmap).fillna(0)
                over = (ln * rn > cap).to_numpy()
                if over.any():
                    Lo = L[over].copy()
                    bi = Lo["b"].astype(np.int64)
                    mins = bi.groupby(Lo["bucket"]).transform("min")
                    L = pd.concat([L[~over], Lo[(bi == mins).to_numpy()]])
            probe = R.merge(L, on="bucket")
            if len(probe):
                frames.append(pd.DataFrame({
                    "kind": np.int64(0), "id_a": probe["d"], "id_b": probe["b"],
                }))
        if len(R) > 1:
            Rd = R.copy()
            Rd["di"] = Rd["d"].astype(np.int64)
            if cap is not None:
                sz = Rd.groupby("bucket")["d"].transform("size")
                over = (sz * (sz - 1) // 2 > cap).to_numpy()
                if over.any():
                    Ro = Rd[over]
                    mmin = Ro.groupby("bucket")["di"].transform("min")
                    mask = (Ro["di"] != mmin).to_numpy()
                    if mask.any():
                        frames.append(pd.DataFrame({
                            "kind": np.int64(1),
                            "id_a": mmin[mask].astype(np.int64).astype(str),
                            "id_b": Ro["d"][mask],
                        }))
                    Rd = Rd[~over]
            dd = Rd.merge(Rd, on="bucket")
            dd = dd[dd["di_x"] < dd["di_y"]]
            if len(dd):
                frames.append(pd.DataFrame({
                    "kind": np.int64(1), "id_a": dd["d_x"], "id_b": dd["d_y"],
                }))
        if not frames:
            return _EMPTY_CAND
        out = pd.concat(frames, ignore_index=True)
        return pa.table({
            "kind": pa.array(out["kind"].to_numpy(np.int64), pa.int64()),
            "id_a": pa.array(out["id_a"], pa.string()),
            "id_b": pa.array(out["id_b"], pa.string()),
        })

    return merge


def _add_pairkey(a_col, b_col) -> pa.Array:
    # length-prefixed so ids containing "|" can't alias two distinct
    # pairs onto one key (aggregates.pack_pair_key, oriented here)
    s1 = a_col.to_pandas()
    s2 = b_col.to_pandas()
    swap = (s2 < s1).to_numpy()
    lo = pd.Series(np.where(swap, s2, s1))
    hi = pd.Series(np.where(swap, s1, s2))
    return pa.array(lo.str.len().astype(str) + "|" + lo + "|" + hi, pa.string())


_TAG_SCHEMA = pa.schema([
    ("pairkey", pa.string()),
    ("jaccard_est", pa.float64()),
    ("kind", pa.int64()),
    ("id_a", pa.string()),
    ("id_b", pa.string()),
])

_EMPTY_TAGGED = pa.table({
    "kind": pa.array([], pa.int64()),
    "id_a": pa.array([], pa.string()),
    "id_b": pa.array([], pa.string()),
    "jaccard_est": pa.array([], pa.float64()),
})


def _tag_merge(vt: pa.Table, ct: pa.Table) -> pa.Table:
    """Re-attach (kind, orientation) tags to verified pairs: verify_pairs
    returns lexically-sorted ids, so the tagged candidate row (unique per
    unordered pair — base/delta endpoint sets are disjoint and kind-1
    pairs are numerically oriented) is recovered by pairkey."""
    if vt.num_rows == 0 or ct.num_rows == 0:
        return _EMPTY_TAGGED
    vd = vt.select(["pairkey", "jaccard_est"]).to_pandas()
    cd = ct.select(["pairkey", "kind", "id_a", "id_b"]).to_pandas()
    cd = cd.drop_duplicates("pairkey")
    m = vd.merge(cd, on="pairkey")
    return pa.table({
        "kind": pa.array(m["kind"].to_numpy(np.int64), pa.int64()),
        "id_a": pa.array(m["id_a"], pa.string()),
        "id_b": pa.array(m["id_b"], pa.string()),
        "jaccard_est": pa.array(m["jaccard_est"].to_numpy(np.float64), pa.float64()),
    })


def _greedy_assign(tg: pd.DataFrame) -> dict[int, int]:
    """Online-order assignment over the verified match graph: returns
    {doc_id -> canonical_id} for NOT-new delta docs only (everything
    else is new, canonical=self). O(participants + edges) single pass in
    ascending id order — the sequential semantics of the reference's
    online inserts, run over the (duplicate-bounded) match graph."""
    probe = tg[tg["kind"] == 0]
    dd = tg[tg["kind"] == 1]
    bmin: dict[int, int] = {}
    if len(probe):
        bmin = (
            pd.Series(probe["id_b"].astype(np.int64).to_numpy(),
                      index=probe["id_a"].astype(np.int64).to_numpy())
            .groupby(level=0).min().to_dict()
        )
    preds: dict[int, list[int]] = {}
    u = dd["id_a"].astype(np.int64).to_numpy() if len(dd) else np.array([], np.int64)
    v = dd["id_b"].astype(np.int64).to_numpy() if len(dd) else np.array([], np.int64)
    for uu, vv in zip(u.tolist(), v.tolist()):
        preds.setdefault(vv, []).append(uu)
    participants = sorted(set(bmin) | set(u.tolist()) | set(v.tolist()))
    new: set[int] = set()
    canon: dict[int, int] = {}
    for d in participants:
        c = [x for x in preds.get(d, ()) if x in new]
        if d in bmin:
            c.append(bmin[d])
        if c:
            canon[d] = min(c)
        else:
            new.add(d)
    return canon


def ingest_delta_neardup(index_bands, index_sigs, delta_ds, cfg,
                         id_col: str = "doc_id", text_col: str = "text",
                         semijoin: bool = False, m_bits: int = 1 << 20,
                         k: int = 7, num_partitions: int | None = None,
                         bucket_cap: int | None = None,
                         return_signed: bool = False):
    """Near-dup-dedup a delta shard against a persisted LSH band index.

    Returns (id_col, canonical_id, is_new) for every delta doc — the
    online L4 probe semantics (module comment above). ``semijoin=True``
    Bloom-prefilters the index band rows by the delta's bucket set
    before the co-partition shuffle. Output is bit-identical: a false
    positive lets an index row with bucket k through even though no
    delta row carries k, so the per-bucket merge emits no pair for it;
    false negatives cannot occur, so no candidate is ever lost.

    ``return_signed=True`` additionally returns the delta's signature
    dataset (re-ingested ids excluded) so callers appending new
    canonicals to the index (neardup_index_delta) can filter it instead
    of paying a second signing pass over the delta.
    """
    import ray

    from hmse_ray.stages import lsh
    from hmse_ray.stages.aggregates import copartition_two

    signed = sign_minhash(delta_ds, cfg, id_col, text_col).materialize()

    # Online-rule guard: a delta id ALREADY PRESENT in the persisted
    # index is already ingested — the reference's online rule never
    # re-inserts (README.md:1209-1210). Without this guard the id's
    # signature appears twice in signed_union, every pair group
    # touching it exceeds verify_pairs' exactly-two-rows shape and is
    # silently dropped, so the doc (and its true matches) would come
    # back is_new=1 and corrupt the index with duplicate entries on an
    # operator retry / re-crawl. Such ids are excluded from probing
    # entirely and reported (id, canonical=id, is_new=0). Membership =
    # one column-pruned streaming scan of the index id column against
    # the broadcast sorted delta id set (the delta is the bounded side
    # of an ingest by design — same contract as the collect-limit
    # gate); no shuffle.
    delta_id_arr = np.sort(
        signed.select_columns(["image_id"]).to_pandas()["image_id"]
        .to_numpy().astype(np.int64))
    _dref = ray.put(delta_id_arr)

    def _index_collisions(t: pa.Table) -> pa.Table:
        arr = ray.get(_dref)
        if t.num_rows == 0 or len(arr) == 0:
            return pa.table({"image_id": pa.array([], pa.int64())})
        ids = t["image_id"].to_numpy().astype(np.int64)
        pos = np.minimum(np.searchsorted(arr, ids), len(arr) - 1)
        return pa.table(
            {"image_id": pa.array(ids[arr[pos] == ids], pa.int64())})

    _coll = (index_sigs.select_columns(["image_id"])
             .map_batches(_index_collisions, batch_format="pyarrow")
             .to_pandas())  # empty-result frames lose their schema
    dup_ids = (np.unique(_coll["image_id"].to_numpy(np.int64))
               if len(_coll) else np.array([], np.int64))
    if dup_ids.size:
        _dupref = ray.put(dup_ids)

        def _drop_reingested(t: pa.Table) -> pa.Table:
            arr = ray.get(_dupref)
            if t.num_rows == 0:
                return t
            ids = t["image_id"].to_numpy().astype(np.int64)
            pos = np.minimum(np.searchsorted(arr, ids), len(arr) - 1)
            return t.take(np.flatnonzero(arr[pos] != ids))

        signed = signed.map_batches(
            _drop_reingested, batch_format="pyarrow").materialize()

    dbands = band_rows(signed, cfg)
    if semijoin:
        from hmse_ray.functions.bloom import Bloom, build_from_dataset

        dbands = dbands.materialize()
        bloom = build_from_dataset(dbands, "bucket", m_bits=m_bits, k=k,
                                   int_keys=True)
        bref = ray.put((bloom.bits, bloom.m_bits, bloom.k))

        def probe_filter(t: pa.Table) -> pa.Table:
            bits, mb, kk = ray.get(bref)
            b = Bloom(mb, kk, bits=bits)
            keep = b.contains_many_i64(t["bucket"].to_numpy())
            return t.take(np.flatnonzero(keep))

        index_bands = index_bands.map_batches(probe_filter, batch_format="pyarrow")

    def rn(col_from: str, col_to: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                [col_to if c == col_from else c for c in t.column_names])
        return fn

    left = index_bands.map_batches(rn("image_id", "base_id"), batch_format="pyarrow")
    right = dbands.map_batches(rn("image_id", "delta_id"), batch_format="pyarrow")
    cands = copartition_two(
        left, right, "bucket", _PAIR_COPART_SCHEMA,
        _bucket_pairs_kernel(bucket_cap), num_partitions=num_partitions,
    ).materialize()

    norm = _normalize_sigs(cfg)
    signed_union = index_sigs.map_batches(norm, batch_format="pyarrow").union(
        signed.map_batches(norm, batch_format="pyarrow"))
    unv = cands.map_batches(
        lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow")
    verified = lsh.verify_pairs(unv, signed_union, cfg)

    def vkey(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"pairkey": pa.array([], pa.string()),
                             "jaccard_est": pa.array([], pa.float64())})
        return pa.table({"pairkey": _add_pairkey(t["id_a"], t["id_b"]),
                         "jaccard_est": t["jaccard_est"]})

    def ckey(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"pairkey": pa.array([], pa.string()),
                             "kind": pa.array([], pa.int64()),
                             "id_a": pa.array([], pa.string()),
                             "id_b": pa.array([], pa.string())})
        return pa.table({"pairkey": _add_pairkey(t["id_a"], t["id_b"]),
                         "kind": t["kind"], "id_a": t["id_a"], "id_b": t["id_b"]})

    tagged = copartition_two(
        verified.map_batches(vkey, batch_format="pyarrow"),
        cands.map_batches(ckey, batch_format="pyarrow"),
        "pairkey", _TAG_SCHEMA, _tag_merge, num_partitions=num_partitions,
    ).materialize()
    n_tagged = tagged.count()
    if n_tagged > _NEARDUP_COLLECT_LIMIT:
        raise ValueError(
            f"verified match graph has {n_tagged} edges > "
            f"{_NEARDUP_COLLECT_LIMIT}; split the delta shard into smaller "
            "ingests (lossless: fold-equivalence) or raise the limit")
    canon = _greedy_assign(
        tagged.to_pandas() if n_tagged else pd.DataFrame(
            {"kind": [], "id_a": [], "id_b": [], "jaccard_est": []}))
    mids = np.fromiter(canon.keys(), np.int64, len(canon))
    order = np.argsort(mids)
    mref = ray.put((mids[order],
                    np.fromiter(canon.values(), np.int64, len(canon))[order],
                    dup_ids))

    def assign(t: pa.Table) -> pa.Table:
        m_ids, m_canon, dups = ray.get(mref)
        ids = t[id_col].to_numpy()
        if len(m_ids):
            pos = np.minimum(np.searchsorted(m_ids, ids), len(m_ids) - 1)
            hit = m_ids[pos] == ids
            canonical = np.where(hit, m_canon[pos], ids)
        else:
            hit = np.zeros(len(ids), bool)
            canonical = ids
        if len(dups):
            # re-ingested ids: hits on their own indexed entry
            dpos = np.minimum(np.searchsorted(dups, ids), len(dups) - 1)
            dhit = dups[dpos] == ids
            canonical = np.where(dhit, ids, canonical)
            hit = hit | dhit
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "canonical_id": pa.array(canonical, pa.int64()),
            "is_new": pa.array((~hit).astype(np.int64), pa.int64()),
        })

    assigned = delta_ds.select_columns([id_col]).map_batches(
        assign, batch_format="pyarrow")
    return (assigned, signed) if return_signed else assigned


def neardup_index_delta(assigned_ds, delta_ds, cfg, id_col: str = "doc_id",
                        text_col: str = "text", signed_ds=None):
    """(band rows, signatures) of the NEW canonicals of an ingest — the
    rows to append to the persisted index so the next ingest folds
    (matched docs are never inserted, matching the reference's online
    rule). New-id collection is delta-bounded (same limit gate).

    ``signed_ds``: the delta's signature dataset from
    ``ingest_delta_neardup(..., return_signed=True)``. When given, the
    new canonicals' signatures are FILTERED from it instead of
    re-signing the new docs — signing is the dominant per-doc cost of
    the pipeline, so this halves the signing work of an
    ingest-plus-index-update."""
    import ray

    def only_new(t: pa.Table) -> pa.Table:
        keep = np.flatnonzero(t["is_new"].to_numpy() == 1)
        return t.select([id_col]).take(keep)

    new_tbl = assigned_ds.map_batches(only_new, batch_format="pyarrow").materialize()
    n_new = new_tbl.count()
    if n_new > _NEARDUP_COLLECT_LIMIT:
        raise ValueError("too many new canonicals to collect; split the shard")
    if n_new == 0:  # nothing to insert (empty-dataset schemas get lost)
        empty_sigs = pa.table({
            "image_id": pa.array([], pa.string()),
            "minhash": pa.FixedSizeListArray.from_arrays(
                pa.array([], pa.uint32()), cfg.num_hashes),
            **{f"band_h{b}": pa.array([], pa.int64())
               for b in range(cfg.num_bands)},
        })
        empty_bands = pa.table({
            "image_id": pa.array([], pa.string()),
            "bucket": pa.array([], pa.int64()),
        })
        return rd.from_arrow(empty_bands), rd.from_arrow(empty_sigs)
    new_ids = set(new_tbl.to_pandas()[id_col].to_numpy().tolist())
    ref = ray.put(np.sort(np.fromiter(new_ids, np.int64, len(new_ids))))

    if signed_ds is not None:
        def pick_sig(t: pa.Table) -> pa.Table:
            arr = ray.get(ref)
            if t.num_rows == 0 or len(arr) == 0:
                return t.take(np.array([], np.int64))
            ids = t["image_id"].to_numpy().astype(np.int64)
            pos = np.minimum(np.searchsorted(arr, ids), len(arr) - 1)
            return t.take(np.flatnonzero(arr[pos] == ids))

        sigs = signed_ds.map_batches(
            pick_sig, batch_format="pyarrow").materialize()
        return band_rows(sigs, cfg), sigs

    def pick(t: pa.Table) -> pa.Table:
        arr = ray.get(ref)
        ids = t[id_col].to_numpy()
        if len(arr) == 0:
            return t.take(np.array([], np.int64))
        pos = np.minimum(np.searchsorted(arr, ids), len(arr) - 1)
        return t.take(np.flatnonzero(arr[pos] == ids))

    new_docs = delta_ds.map_batches(pick, batch_format="pyarrow")
    sigs = sign_minhash(new_docs, cfg, id_col, text_col).materialize()
    return band_rows(sigs, cfg), sigs
