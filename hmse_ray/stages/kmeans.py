"""Distributed quantized k-means (Lloyd's) + SemDeDup-style semantic dedup.

The reference's similarity layer clusters near-duplicates by signature
(README.md:291 L4); the training-data-pipeline analog for EMBEDDING
columns is SemDeDup (Abbas et al., arXiv:2303.09540): k-means the
embedding space, then deduplicate within each cluster by cosine
similarity. This module implements both halves Ray-Data-first and
INTEGER-EXACT, so the DuckDB oracle reproduces every step bit-for-bit:

- coordinates are quantized ONCE: ``qv = floor(x * 1024 + 0.5)`` as
  int64. x is float32 in the table; float32->float64 is exact and
  *2^10 is exact in IEEE double, so the quantization is
  bit-deterministic on both sides (numpy and DuckDB).
- distances / dots / norms are all int64. Magnitudes are safe:
  |qv| <= ~513 at 64 dims, so dot <= 64*513^2 ~ 1.7e7 and every
  squared product in the threshold rule stays < 2^63 (see
  ``semantic_flags``).
- the centroid update rounds back to ints:
  ``c = floor((2*s + n) / (2*n))`` with ONE IEEE double division —
  both numpy and DuckDB divide the same exactly-representable int
  operands with one round-to-nearest, hence identical bits. Empty
  clusters keep their previous centroid.
- init is the k smallest ``(murmur3(vec_id), vec_id)`` ranks — a
  data-independent pseudo-random pick, reproduced in SQL by the
  murmur3 CTE chain.
- assignment tie-break: smallest cluster id (np.argmin first-hit ==
  SQL ``row_number() ORDER BY d2, j``).

Scale shape (the classic broadcast-centroids Lloyd's):

- each iteration is ONE streaming pass over the (column-pruned)
  embeddings: ``map_batches`` computes per-batch partial
  ``(cluster, count, per-dim sum)`` tables — k rows per batch — and
  the driver reduces k*dim int64s (~8 KB at k=16, d=64) and
  re-broadcasts via the next pass's closure. No shuffle at all; blocks
  never leave their node. At 10^12 rows this is exactly the shape a
  256-node cluster wants: the all-to-all is deferred to the single
  hash partition by final cluster id in the dedup step.
- the within-cluster pairwise (SemDeDup's own design) is strip-chunked
  matmul bounded to ~256 MB per strip; cluster population is
  controlled by k, which the paper scales with the corpus (they run
  k=11k at 440M docs). Per-cluster work is quadratic ONLY within a
  cluster — the lever is k, not a hidden all-pairs.

Dedup rule (the one-shot SemDeDup variant): rank cluster members by
(dist2-to-centroid, vec_id) ascending; member v is a duplicate iff SOME
earlier-ranked u in the same cluster has cos(u, v) >= t. ``keeper_id``
is the earliest such u (v itself when kept). Note this is one-shot, not
sequential-greedy: u may itself be a duplicate — pinned in tests and
mirrored exactly by the SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hmse_ray.functions import murmur3

K = 16
ITERS = 4
SCALE = 1024  # 2^10: x*SCALE is exact in float64 for |x| < 2^43
INIT_SEED = 0x5EED_C1 % (1 << 32)
PLANT_BASE = 1_000_000_000
PLANT_SEED = 0xDE_D0B
PLANT_AMP = 8  # per-coord perturbation in {-8..8}: cos ~ 0.9993
# cosine threshold t = 0.9 as the exact rational rule
#   dup iff dot > 0 and T_DEN * dot^2 >= T_NUM * |a|^2 * |b|^2
T_NUM = 81
T_DEN = 100
# sized so the strip's PEAK allocation (G reused in place + the rhs
# outer product + two boolean masks ~ 18 B/elem) stays ~300 MB per
# task; the old 1<<25 bounded only G itself while the threshold
# expression held ~4 strip-sized temporaries concurrently (~1 GB peak)
_STRIP_ELEMS = 1 << 24


def _matrix(col) -> np.ndarray:
    """list<float> column -> (n, dim) float64 ndarray (zero-copy read)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = col.values.to_numpy(zero_copy_only=False)
    n = len(col)
    return vals.reshape(n, -1).astype(np.float64)


def quantize(col) -> np.ndarray:
    """Embedding list column -> int64 quantized matrix.

    floor(x*1024 + 0.5): float32->float64 exact, *2^10 exact, one
    floor — bit-identical to the SQL
    CAST(floor(CAST(x AS DOUBLE) * 1024 + 0.5) AS BIGINT)."""
    X = _matrix(col)
    return np.floor(X * SCALE + 0.5).astype(np.int64)


def plant_near_dups(ids: np.ndarray, Q: np.ndarray, every: int = 20,
                    amp: int = PLANT_AMP, seed: int = PLANT_SEED
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Integer-level planted near-duplicates (per batch, row-derived).

    For vec_id % every == 0, append a twin at vec_id + PLANT_BASE whose
    quantized coords are perturbed by murmur3((vec_id*64+j) % 2^32,
    seed) % (2*amp+1) - amp — all int64, so the SQL oracle regenerates
    the planted rows exactly (same murmur CTE chain the other planted
    oracles use). Perturbed cosine ~ 1 - amp^2*dim/(2*SCALE^2) ~ 0.9993
    — comfortably above the 0.9 dedup threshold, and a genuine NEAR
    (not exact) duplicate in quantized space."""
    sel = ids % every == 0
    if not sel.any():
        return ids, Q
    pid = ids[sel]
    dim = Q.shape[1]
    keys = (pid[:, None] * dim + np.arange(dim)[None, :]) % (1 << 32)
    h = murmur3.murmur3_u32(keys.ravel().astype(np.uint32), seed)
    delta = (h.astype(np.int64) % (2 * amp + 1) - amp).reshape(len(pid), dim)
    return (
        np.concatenate([ids, pid + PLANT_BASE]),
        np.concatenate([Q, Q[sel] + delta]),
    )


def assign_argmin(Q: np.ndarray, C: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(assignment, dist2) against centroids C — all int64 exact.

    d2 = |q|^2 - 2 q.c + |c|^2; argmin first-hit ties to the smallest
    cluster id, matching the SQL row_number() ORDER BY d2, j."""
    q2 = np.einsum("ij,ij->i", Q, Q)
    c2 = np.einsum("ij,ij->i", C, C)
    d2 = q2[:, None] - 2 * (Q @ C.T) + c2[None, :]
    a = np.argmin(d2, axis=1)
    return a, d2[np.arange(len(a)), a]


def init_centroids(emb_ds, k: int = K, seed: int = INIT_SEED,
                   plant: bool = False) -> np.ndarray:
    """k centroids = quantized vectors of the k smallest
    (murmur3(vec_id % 2^32), vec_id) ranks.

    One streaming pass: each batch keeps its local top-k (a k-row
    partial), the driver merges blocks*k rows — bounded, deterministic
    under any blocking."""

    def partial(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        Q = quantize(t["embedding"])
        if plant:
            ids, Q = plant_near_dups(ids, Q)
        hm = murmur3.murmur3_u32((ids % (1 << 32)).astype(np.uint32),
                                 seed).astype(np.int64)
        top = np.lexsort((ids, hm))[:k]
        n, dim = len(top), Q.shape[1]
        off = pa.array((np.arange(n + 1) * dim).astype(np.int32))
        return pa.table({
            "hm": pa.array(hm[top], pa.int64()),
            "vec_id": pa.array(ids[top], pa.int64()),
            "qv": pa.ListArray.from_arrays(off, pa.array(Q[top].ravel(),
                                                         pa.int64())),
        })

    parts = emb_ds.map_batches(partial, batch_format="pyarrow").take_all()
    parts.sort(key=lambda r: (r["hm"], r["vec_id"]))
    return np.array([r["qv"] for r in parts[:k]], dtype=np.int64)


def lloyd(emb_ds, k: int = K, iters: int = ITERS, seed: int = INIT_SEED,
          plant: bool = False) -> np.ndarray:
    """iters rounds of assignment + rounded-centroid update.

    Each round: one streaming pass emitting per-batch partial
    (cluster, n, per-dim sums) — k rows/batch — reduced on the driver
    (k*dim int64s). Centroids ride into the next pass as a tiny task
    closure; no shuffle, no materialization."""
    C = init_centroids(emb_ds, k, seed, plant=plant)
    if C.shape[0] == 0:
        raise ValueError("lloyd: empty embedding dataset")
    # short init (fewer points than k): run with the k we actually have
    # instead of crashing on a k-length mask over a shorter array
    k = C.shape[0]
    dim = C.shape[1]
    for _ in range(iters):
        Cb = C  # capture by value for the pass

        def partial(t: pa.Table, C=Cb) -> pa.Table:
            ids = t["vec_id"].to_numpy()
            Q = quantize(t["embedding"])
            if plant:
                ids, Q = plant_near_dups(ids, Q)
            a, _ = assign_argmin(Q, C)
            n = np.bincount(a, minlength=k).astype(np.int64)
            S = np.zeros((k, dim), dtype=np.int64)
            np.add.at(S, a, Q)
            off = pa.array((np.arange(k + 1) * dim).astype(np.int32))
            return pa.table({
                "j": pa.array(np.arange(k, dtype=np.int64), pa.int64()),
                "n": pa.array(n, pa.int64()),
                "s": pa.ListArray.from_arrays(off, pa.array(S.ravel(),
                                                            pa.int64())),
            })

        rows = emb_ds.map_batches(partial, batch_format="pyarrow").take_all()
        n = np.zeros(k, dtype=np.int64)
        S = np.zeros((k, dim), dtype=np.int64)
        for r in rows:
            n[r["j"]] += r["n"]
            S[r["j"]] += np.asarray(r["s"], dtype=np.int64)
        nz = n > 0
        newC = C.copy()
        # floor((2s+n)/(2n)) with one IEEE double division — operands are
        # exactly-representable ints, so numpy and DuckDB agree bitwise
        newC[nz] = np.floor(
            (2.0 * S[nz] + n[nz, None]) / (2.0 * n[nz, None])
        ).astype(np.int64)
        C = newC
    return C


def assignments(emb_ds, C: np.ndarray, plant: bool = False,
                with_qv: bool = False):
    """Final assignment pass -> Dataset (vec_id, cluster, dist2 [, qv])."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        Q = quantize(t["embedding"])
        if plant:
            ids, Q = plant_near_dups(ids, Q)
        a, d2 = assign_argmin(Q, C)
        cols = {
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(a.astype(np.int64), pa.int64()),
            "dist2": pa.array(d2, pa.int64()),
        }
        if with_qv:
            n, dim = Q.shape
            off = pa.array((np.arange(n + 1) * dim).astype(np.int32))
            cols["qv"] = pa.ListArray.from_arrays(
                off, pa.array(Q.ravel(), pa.int64()))
        return pa.table(cols)

    return emb_ds.map_batches(fn, batch_format="pyarrow")


def semantic_flags(ids: np.ndarray, d2: np.ndarray, Q: np.ndarray,
                   t_num: int = T_NUM, t_den: int = T_DEN
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One-shot SemDeDup within ONE cluster — vectorized, strip-chunked.

    Returns (order, is_dup, keeper_id) where order is the member
    permutation ranked by (dist2, vec_id). v is a dup iff some
    earlier-ranked u has dot>0 and t_den*dot^2 >= t_num*|u|^2*|v|^2;
    keeper_id = earliest such u (v itself when kept).

    int64 bounds: |qv| <= SCALE/2 + eps, dot <= dim*(SCALE/2+1)^2
    ~ 1.7e7 at dim=64 -> t_den*dot^2 <= 2.8e16 << 2^63."""
    order = np.lexsort((ids, d2))
    Qo = Q[order]
    ido = ids[order]
    m = len(ido)
    n2 = np.einsum("ij,ij->i", Qo, Qo)
    is_dup = np.zeros(m, dtype=np.int64)
    keeper = ido.copy()
    found = np.zeros(m, dtype=bool)
    strip = max(1, _STRIP_ELEMS // max(m, 1))
    for u0 in range(0, m, strip):
        u1 = min(u0 + strip, m)
        G = Qo[u0:u1] @ Qo.T  # (strip, m) int64
        ok = G > 0
        np.multiply(G, G, out=G)  # dot^2 (in place; bounds in docstring)
        G *= t_den
        ok &= G >= t_num * n2[u0:u1, None] * n2[None, :]
        # u must rank strictly before v
        ok &= np.arange(u0, u1)[:, None] < np.arange(m)[None, :]
        ok[:, found] = False  # earliest strip already answered those v
        hit = ok.any(axis=0)
        if hit.any():
            first = np.argmax(ok[:, hit], axis=0) + u0
            vidx = np.flatnonzero(hit)
            is_dup[vidx] = 1
            keeper[vidx] = ido[first]
            found[vidx] = True
        if found.all():
            break
    return order, is_dup, keeper


def semantic_dedup_ds(emb_ds, k: int = K, iters: int = ITERS,
                      plant: bool = True, num_partitions: int | None = None):
    """Full SemDeDup pipeline -> Dataset (vec_id, cluster, is_dup,
    keeper_id).

    Passes: 1 init + iters Lloyd's (no shuffle) + 1 assignment carrying
    the quantized vectors, then ONE hash partition by cluster id and a
    vectorized per-cluster one-shot dedup."""
    from hmse_ray.stages.aggregates import hash_partitioned_groupby_arrow

    C = lloyd(emb_ds, k, iters, plant=plant)
    asg = assignments(emb_ds, C, plant=plant, with_qv=True)

    def per_partition(t: pa.Table) -> pa.Table:
        cl = t["cluster"].to_numpy()
        ids = t["vec_id"].to_numpy()
        d2 = t["dist2"].to_numpy()
        qv = t["qv"]
        if isinstance(qv, pa.ChunkedArray):
            qv = qv.combine_chunks()
        Q = qv.values.to_numpy().reshape(len(ids), -1)
        out_id, out_cl, out_dup, out_keep = [], [], [], []
        for c in np.unique(cl):
            seg = np.flatnonzero(cl == c)
            order, is_dup, keeper = semantic_flags(ids[seg], d2[seg], Q[seg])
            out_id.append(ids[seg][order])
            out_cl.append(np.full(len(seg), c, dtype=np.int64))
            out_dup.append(is_dup)
            out_keep.append(keeper)
        if not out_id:
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int64()),
                "is_dup": pa.array([], pa.int64()),
                "keeper_id": pa.array([], pa.int64()),
            })
        return pa.table({
            "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
            "cluster": pa.array(np.concatenate(out_cl), pa.int64()),
            "is_dup": pa.array(np.concatenate(out_dup), pa.int64()),
            "keeper_id": pa.array(np.concatenate(out_keep), pa.int64()),
        })

    return hash_partitioned_groupby_arrow(asg, "cluster", per_partition,
                                          num_partitions=num_partitions)
