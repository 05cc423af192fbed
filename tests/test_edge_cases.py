"""Edge-case hardening: tiny/empty/degenerate inputs through every
pipeline entry point."""

from __future__ import annotations

import pyarrow as pa
import pytest

from hmse_ray.config import DEFAULT_CONFIG as CFG


def _tiny_images(n):
    from hmse_ray.sources import fixtures

    t, _, _ = fixtures.generate_images(max(n, 1), seed=99)
    return t.slice(0, n)


class TestTinyInputs:
    def test_single_row_clusters(self, ray_session):
        from hmse_ray.pipelines import dedup

        t = _tiny_images(1)
        cl = dedup.cluster_assignments(dedup.read_images(t), CFG).to_pandas()
        assert len(cl) == 1
        assert cl.iloc[0].cluster_id == cl.iloc[0].image_id

    def test_two_identical_rows(self, ray_session):
        from hmse_ray.pipelines import dedup

        base = _tiny_images(1)
        two = pa.concat_tables([base, base]).set_column(
            0, "image_id", pa.array(["a", "b"])
        )
        cl = dedup.cluster_assignments(dedup.read_images(two), CFG).to_pandas()
        assert cl.cluster_id.nunique() == 1

    def test_empty_caption(self, ray_session):
        from hmse_ray.pipelines import dedup

        t = _tiny_images(2)
        t = t.set_column(
            t.schema.get_field_index("caption"), "caption", pa.array(["", "x"])
        )
        cl = dedup.cluster_assignments(dedup.read_images(t), CFG).to_pandas()
        assert len(cl) == 2

    def test_chunk_index_on_empty_captions(self, ray_session):
        from hmse_ray.pipelines import dedup

        t = _tiny_images(2)
        t = t.set_column(
            t.schema.get_field_index("caption"), "caption", pa.array(["", ""])
        )
        idx = dedup.chunk_index(dedup.read_images(t), CFG).to_pandas()
        assert len(idx) == 0  # no chunks from empty captions

    def test_unicode_captions_roundtrip(self, ray_session):
        import ray

        from hmse_ray.pipelines import dedup, verify

        t = _tiny_images(2)
        caps = ["héllo wörld ünïcode ☃ " * 50, "日本語のキャプション " * 40]
        t = t.set_column(t.schema.get_field_index("caption"), "caption", pa.array(caps))
        cl = dedup.cluster_assignments(dedup.read_images(t), CFG)
        inv = verify.roundtrip(dedup.read_images(t), cl, CFG)
        assert inv["caption_pass"] == inv["n_rows"] == 2


class TestUnionFindEdgeCases:
    def test_no_edges(self):
        from hmse_ray.stages.clustering import components_unionfind

        assert components_unionfind([], ["a", "b"]) == {"a": "a", "b": "b"}

    def test_chain_and_cycle(self):
        from hmse_ray.stages.clustering import components_unionfind

        lbl = components_unionfind(
            [("b", "c"), ("a", "b"), ("c", "a"), ("x", "y")]
        )
        assert lbl["a"] == lbl["b"] == lbl["c"] == "a"
        assert lbl["x"] == lbl["y"] == "x"

    def test_long_chain_path_compression(self):
        from hmse_ray.stages.clustering import components_unionfind

        ids = [f"n{i:04d}" for i in range(500)]
        edges = list(zip(ids, ids[1:]))
        lbl = components_unionfind(edges)
        assert all(lbl[i] == "n0000" for i in ids)
