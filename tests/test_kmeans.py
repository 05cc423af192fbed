"""Quantized k-means + SemDeDup (stages/kmeans.py) unit tests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from hmse_ray.stages import kmeans

SF = "/root/testdata/sf0.001"


def _emb_ds(rd, n_blocks=None):
    import os

    return rd.read_parquet(
        os.path.join(SF, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        **({"override_num_blocks": n_blocks} if n_blocks else {}),
    )


def _toy_ds(rd, X: np.ndarray, ids=None):
    n, d = X.shape
    ids = np.arange(n, dtype=np.int64) if ids is None else ids
    off = pa.array((np.arange(n + 1) * d).astype(np.int32))
    emb = pa.ListArray.from_arrays(off, pa.array(X.ravel().astype(np.float32),
                                                 pa.float32()))
    return rd.from_arrow(pa.table({"vec_id": pa.array(ids, pa.int64()),
                                   "embedding": emb}))


class TestQuantize:
    def test_matches_duckdb_floor_formula(self):
        import duckdb

        rng = np.random.default_rng(7)
        X = (rng.standard_normal((50, 8)) * 0.3).astype(np.float32)
        off = pa.array((np.arange(51) * 8).astype(np.int32))
        col = pa.ListArray.from_arrays(off, pa.array(X.ravel(), pa.float32()))
        got = kmeans.quantize(col)
        con = duckdb.connect()
        con.register("t", pa.table({"x": pa.array(X.ravel(), pa.float32())}))
        want = con.execute(
            "SELECT CAST(floor(CAST(x AS DOUBLE) * 1024 + 0.5) AS BIGINT)"
            " FROM t").fetchnumpy()
        want = next(iter(want.values())).reshape(50, 8)
        assert (got == want).all()

    def test_power_of_two_scale_is_exact(self):
        # x*1024 must be exact in float64 for any float32 x
        x = np.float32(0.123456789)
        assert np.float64(x) * 1024 == np.float64(x) * np.float64(1024.0)


class TestLloyd:
    def test_blocking_invariance(self, ray_session):
        import ray.data as rd

        c1 = kmeans.lloyd(_emb_ds(rd, 1), k=8, iters=2)
        c7 = kmeans.lloyd(_emb_ds(rd, 7), k=8, iters=2)
        assert (c1 == c7).all()

    def test_assignment_tie_breaks_to_smallest_cluster(self):
        Q = np.array([[0, 0]], dtype=np.int64)
        C = np.array([[1, 0], [-1, 0], [0, 2]], dtype=np.int64)  # d2: 1,1,4
        a, d2 = kmeans.assign_argmin(Q, C)
        assert a[0] == 0 and d2[0] == 1

    def test_empty_cluster_keeps_previous_centroid(self, ray_session):
        import ray.data as rd

        # two distinct points, k=4: at most 2 clusters can be non-empty,
        # the other >= 2 keep their init centroid through every round
        X = np.array([[1.0, 0.0], [-1.0, 0.0]] * 10, dtype=np.float32) * 0.4
        ds = _toy_ds(rd, X)
        c0 = kmeans.init_centroids(ds, k=4)
        c2 = kmeans.lloyd(ds, k=4, iters=3)
        Q = np.floor(X.astype(np.float64) * 1024 + 0.5).astype(np.int64)
        a, _ = kmeans.assign_argmin(Q, c2)
        assert len(set(a.tolist())) <= 2
        # with only two distinct points, at least two clusters never
        # receive members; their centroids must equal the init values
        # bit-for-bit (the LEFT-JOIN/COALESCE path in the SQL oracle)
        empty = [j for j in range(4) if j not in set(a.tolist())]
        assert len(empty) >= 2
        for j in empty:
            assert (c2[j] == c0[j]).all()

    def test_fewer_points_than_k(self, ray_session):
        """n < k must run with the k we actually have (short init), not
        crash on a k-length mask over an n-row centroid array; an empty
        dataset fails loudly."""
        import ray.data as rd

        X = np.array([[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0]],
                     dtype=np.float32) * 0.4
        ds = _toy_ds(rd, X)
        C = kmeans.lloyd(ds, k=16, iters=2)
        assert C.shape[0] == 3
        Q = np.floor(X.astype(np.float64) * 1024 + 0.5).astype(np.int64)
        a, _ = kmeans.assign_argmin(Q, C)
        assert set(a.tolist()) <= {0, 1, 2}
        with pytest.raises(ValueError, match="empty"):
            kmeans.lloyd(_toy_ds(rd, X[:0]), k=4, iters=1)

    def test_centroid_update_rounding_matches_sql_semantics(self):
        import duckdb

        s = np.array([-7, -5, 5, 7, 10], dtype=np.int64)
        n = np.array([2, 2, 2, 2, 4], dtype=np.int64)
        got = np.floor((2.0 * s + n) / (2.0 * n)).astype(np.int64)
        con = duckdb.connect()
        con.register("t", pa.table({"s": s, "n": n}))
        want = con.execute(
            "SELECT CAST(floor((2*s + n) / (2*n)) AS BIGINT) FROM t"
        ).fetchnumpy()
        assert (got == next(iter(want.values()))).all()


class TestSemanticFlags:
    def test_one_shot_dup_of_dup_still_flags(self):
        # a (rank 0), b ~ a (rank 1), c ~ b but NOT ~ a (rank 2):
        # one-shot compares c against ALL earlier ranks, so c is a dup
        # with keeper b even though b is itself a dup of a.
        a = np.array([100, 0, 0, 0], dtype=np.int64)
        b = np.array([98, 20, 0, 0], dtype=np.int64)   # cos(a,b) ~ 0.98
        c = np.array([80, 60, 0, 0], dtype=np.int64)   # cos(b,c)~0.95, cos(a,c)=0.8
        Q = np.stack([a, b, c])
        ids = np.array([1, 2, 3], dtype=np.int64)
        d2 = np.array([0, 1, 2], dtype=np.int64)  # forces rank order a,b,c
        order, is_dup, keeper = kmeans.semantic_flags(ids, d2, Q)
        assert list(ids[order]) == [1, 2, 3]
        assert list(is_dup) == [0, 1, 1]
        assert list(keeper) == [1, 1, 2]

    def test_strip_path_equals_naive(self, monkeypatch):
        rng = np.random.default_rng(3)
        m, d = 200, 16
        Q = rng.integers(-50, 50, size=(m, d)).astype(np.int64)
        # plant some near-dups
        Q[50] = Q[10] + 1
        Q[51] = Q[10] - 1
        ids = np.arange(m, dtype=np.int64)
        d2 = rng.integers(0, 1000, size=m).astype(np.int64)
        full = kmeans.semantic_flags(ids, d2, Q)
        monkeypatch.setattr(kmeans, "_STRIP_ELEMS", 64)  # force many strips
        strips = kmeans.semantic_flags(ids, d2, Q)
        for x, y in zip(full, strips):
            assert (x == y).all()

    def test_naive_reference(self):
        # brute-force O(m^2) reference of the one-shot rule
        rng = np.random.default_rng(11)
        m, d = 60, 8
        Q = rng.integers(-30, 30, size=(m, d)).astype(np.int64)
        Q[20] = Q[5] + 1
        ids = rng.permutation(m).astype(np.int64)
        d2 = rng.integers(0, 100, size=m).astype(np.int64)
        order, is_dup, keeper = kmeans.semantic_flags(ids, d2, Q)
        Qo, ido = Q[order], ids[order]
        n2 = (Qo * Qo).sum(1)
        for v in range(m):
            exp_first = None
            for u in range(v):
                dot = int(Qo[u] @ Qo[v])
                if dot > 0 and kmeans.T_DEN * dot * dot >= \
                        kmeans.T_NUM * int(n2[u]) * int(n2[v]):
                    exp_first = u
                    break
            if exp_first is None:
                assert is_dup[v] == 0 and keeper[v] == ido[v]
            else:
                assert is_dup[v] == 1 and keeper[v] == ido[exp_first]


class TestPlanted:
    def test_planted_twin_cosine_above_threshold(self):
        rng = np.random.default_rng(5)
        X = rng.standard_normal((40, 64))
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        Q = np.floor(X * 1024 + 0.5).astype(np.int64)
        ids = np.arange(0, 800, 20, dtype=np.int64)  # all plantable
        pids, PQ = kmeans.plant_near_dups(ids, Q)
        assert len(pids) == 80
        for i in range(40):
            u, v = PQ[i], PQ[40 + i]
            dot = int(u @ v)
            assert dot > 0
            assert kmeans.T_DEN * dot * dot >= \
                kmeans.T_NUM * int(u @ u) * int(v @ v)

    def test_planted_pairs_resolved_in_pipeline(self, ray_session):
        import ray.data as rd

        out = kmeans.semantic_dedup_ds(_emb_ds(rd), k=8, iters=2,
                                       plant=True).to_pandas()
        planted = out[out.vec_id >= kmeans.PLANT_BASE]
        assert len(planted) == 25  # 500 docs / every 20
        src = out.set_index("vec_id")
        resolved = 0
        for pid in planted.vec_id:
            oid = pid - kmeans.PLANT_BASE
            if src.loc[pid, "cluster"] == src.loc[oid, "cluster"]:
                # exactly one of the pair must be flagged, keeper sane
                da, db = src.loc[oid, "is_dup"], src.loc[pid, "is_dup"]
                assert da + db >= 1
                resolved += 1
        # boundary straddles are possible but must be rare
        assert resolved >= 20

    def test_dedup_output_partitioning_invariant(self, ray_session):
        import ray.data as rd

        a = kmeans.semantic_dedup_ds(_emb_ds(rd, 1), k=8, iters=2,
                                     plant=True).to_pandas()
        b = kmeans.semantic_dedup_ds(_emb_ds(rd, 5), k=8, iters=2,
                                     plant=True, num_partitions=3).to_pandas()
        a = a.sort_values("vec_id").reset_index(drop=True)
        b = b.sort_values("vec_id").reset_index(drop=True)
        assert (a.values == b.values).all()
