"""Unit tests for the tasks-only co-partition join helpers
(stages/aggregates.copartition_two / gather_lookup) — the round-3
replacement for Dataset.join in pipeline interiors."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


class TestGatherLookup:
    def test_inner_semantics_and_order(self):
        from hmse_ray.stages.aggregates import gather_lookup

        members = pa.table({"k": ["x", "y", "z", "x"], "v": [1, 2, 3, 4]})
        lookup = pa.table({"k": ["x", "z"], "p": [b"px", b"pz"]})
        out = gather_lookup(members, "k", lookup, "k", {"p": "p"})
        assert out["k"].to_pylist() == ["x", "z", "x"]  # y dropped (no match)
        assert out["v"].to_pylist() == [1, 3, 4]
        assert out["p"].to_pylist() == [b"px", b"pz", b"px"]

    def test_empty_members_typed(self):
        from hmse_ray.stages.aggregates import gather_lookup

        members = pa.table({"k": pa.array([], pa.string())})
        lookup = pa.table({"k": ["x"], "p": [b"px"]})
        out = gather_lookup(members, "k", lookup, "k", {"p": "p"})
        assert out.num_rows == 0
        assert out.schema.field("p").type == pa.binary()

    def test_empty_lookup_typed(self):
        from hmse_ray.stages.aggregates import gather_lookup

        members = pa.table({"k": ["x"], "v": [1]})
        lookup = pa.table(
            {"k": pa.array([], pa.string()), "p": pa.array([], pa.binary())}
        )
        out = gather_lookup(members, "k", lookup, "k", {"p": "p"})
        assert out.num_rows == 0
        assert out.schema.field("p").type == pa.binary()


class TestCopartitionTwo:
    def test_matches_pandas_merge(self, ray_session):
        import ray.data as rd

        from hmse_ray.stages.aggregates import copartition_two

        schema = pa.schema(
            [("k", pa.string()), ("a", pa.int64()), ("b", pa.string())]
        )

        def merge_inner(left_t: pa.Table, right_t: pa.Table) -> pa.Table:
            from hmse_ray.stages.aggregates import gather_lookup

            return gather_lookup(
                left_t.drop_columns(["b"]), "k", right_t, "k", {"b": "b"}
            ).select(["k", "a", "b"])

        rng = np.random.default_rng(7)
        n = 2000
        keys = [f"k{int(i)}" for i in rng.integers(0, 500, n)]
        left = pd.DataFrame({"k": keys, "a": np.arange(n)})
        rk = [f"k{i}" for i in range(0, 600, 2)]  # half match, some dangling
        right = pd.DataFrame({"k": rk, "b": [f"v{i}" for i in range(len(rk))]})

        got = copartition_two(
            rd.from_pandas(left),
            rd.from_pandas(right),
            "k",
            schema,
            merge_inner,
        ).to_pandas()
        want = left.merge(right, on="k", how="inner")
        got = got.sort_values(["k", "a"]).reset_index(drop=True)
        want = want.sort_values(["k", "a"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got[["k", "a", "b"]], want[["k", "a", "b"]])

    def test_int_key_and_cast(self, ray_session):
        import ray.data as rd

        from hmse_ray.stages.aggregates import copartition_two

        schema = pa.schema([("k", pa.int64()), ("a", pa.int32()), ("b", pa.int64())])
        left = rd.from_arrow(
            pa.table({"k": pa.array([1, 2, 3], pa.int32()),
                      "a": pa.array([10, 20, 30], pa.int32())})
        )
        right = rd.from_arrow(pa.table({"k": [2, 3, 4], "b": [200, 300, 400]}))

        def merge(lt: pa.Table, rt: pa.Table) -> pa.Table:
            from hmse_ray.stages.aggregates import gather_lookup

            return gather_lookup(
                lt.drop_columns(["b"]), "k", rt, "k", {"b": "b"}
            ).select(["k", "a", "b"])

        got = copartition_two(left, right, "k", schema, merge).to_pandas()
        got = got.sort_values("k").reset_index(drop=True)
        assert got["k"].tolist() == [2, 3]
        assert got["b"].tolist() == [200, 300]
