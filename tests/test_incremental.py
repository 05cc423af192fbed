"""Incremental ingest (pipelines/incremental.py) unit tests."""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pytest

from hmse_ray.pipelines import incremental


def _docs(rd, rows):
    ids, texts = zip(*rows)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


class TestIngest:
    def test_hit_miss_and_first_writer(self, ray_session):
        import ray.data as rd

        base = _docs(rd, [(1, "alpha"), (2, "beta"), (3, "alpha")])
        delta = _docs(rd, [(10, "alpha"), (11, "gamma"), (12, "gamma"),
                           (13, "delta")])
        idx = incremental.build_index(base)
        out = (incremental.ingest_delta(idx, delta)
               .to_pandas().set_index("doc_id").sort_index())
        # hit: existing canonical, is_new=0
        assert out.loc[10, "canonical_id"] == 1 and out.loc[10, "is_new"] == 0
        # miss group: min delta doc_id elected, both rows point at it
        assert out.loc[11, "canonical_id"] == 11 and out.loc[11, "is_new"] == 1
        assert out.loc[12, "canonical_id"] == 11 and out.loc[12, "is_new"] == 1
        assert out.loc[13, "canonical_id"] == 13 and out.loc[13, "is_new"] == 1

    def test_partitioning_invariance(self, ray_session):
        import ray.data as rd

        rows = [(i, f"t{i % 7}") for i in range(50)]
        base = _docs(rd, rows[:30])
        delta = _docs(rd, rows[30:])
        idx = incremental.build_index(base)
        a = (incremental.ingest_delta(idx, delta, num_partitions=1)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        b = (incremental.ingest_delta(idx, delta, num_partitions=7)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert (a.values == b.values).all()

    def test_persisted_index_round_trip(self, ray_session):
        import ray.data as rd

        base = _docs(rd, [(1, "alpha"), (2, "beta")])
        delta = _docs(rd, [(10, "beta"), (11, "new")])
        idx = incremental.build_index(base)
        with tempfile.TemporaryDirectory(dir="/tmp") as d:
            path = incremental.persist_index(idx, os.path.join(d, "idx"))
            assert os.path.exists(os.path.join(path, "_SUCCESS"))
            loaded = incremental.load_index(path)
            out_mem = (incremental.ingest_delta(idx, delta)
                       .to_pandas().sort_values("doc_id")
                       .reset_index(drop=True))
            out_disk = (incremental.ingest_delta(loaded, delta)
                        .to_pandas().sort_values("doc_id")
                        .reset_index(drop=True))
            assert (out_mem.values == out_disk.values).all()

    def test_load_without_marker_refuses(self, ray_session):
        with tempfile.TemporaryDirectory(dir="/tmp") as d:
            with pytest.raises(FileNotFoundError):
                incremental.load_index(d)

    def test_second_ingest_sees_first_ingest_canonicals(self, ray_session):
        """Repeated ingests fold into the same state the reference's
        online inserts would reach: a canonical elected in ingest 1
        resolves ingest 2's hits (first-writer-wins ACROSS ingests,
        which deliberately differs from global-min-id batch dedup)."""
        import ray.data as rd

        base = _docs(rd, [(1, "alpha")])
        delta1 = _docs(rd, [(20, "beta"), (21, "beta")])
        delta2 = _docs(rd, [(5, "beta"), (6, "alpha"), (7, "omega")])
        idx = incremental.build_index(base)
        with tempfile.TemporaryDirectory(dir="/tmp") as d:
            p0 = incremental.persist_index(idx, os.path.join(d, "idx0"))
            a1 = incremental.ingest_delta(incremental.load_index(p0), delta1)
            a1 = a1.materialize()
            # append the index delta (newly elected canonicals) -> idx1
            idx1 = incremental.load_index(p0).union(
                incremental.index_delta(a1))
            p1 = incremental.persist_index(idx1, os.path.join(d, "idx1"))
            a2 = (incremental.ingest_delta(incremental.load_index(p1), delta2)
                  .to_pandas().set_index("doc_id").sort_index())
        # doc 5 has a SMALLER id than beta's canonical 20, but 20 was
        # first writer in ingest order -> 5 is a hit pointing at 20
        assert a2.loc[5, "canonical_id"] == 20 and a2.loc[5, "is_new"] == 0
        assert a2.loc[6, "canonical_id"] == 1 and a2.loc[6, "is_new"] == 0
        assert a2.loc[7, "canonical_id"] == 7 and a2.loc[7, "is_new"] == 1

    def test_index_delta_is_only_new_canonicals(self, ray_session):
        import ray.data as rd

        base = _docs(rd, [(1, "alpha")])
        delta = _docs(rd, [(10, "alpha"), (11, "x"), (12, "x")])
        idx = incremental.build_index(base)
        out = incremental.ingest_delta(idx, delta).materialize()
        nd = incremental.index_delta(out).to_pandas()
        assert set(nd["canonical_id"]) == {11}
        assert list(nd.columns) == ["sha256", "canonical_id"]


class TestBloomSemijoin:
    """ingest_delta_semijoin must be bit-identical to ingest_delta (the
    bloom filter has no false negatives), while actually filtering the
    index side before the shuffle."""

    def test_matches_unfiltered_path(self, ray_session):
        import ray.data as rd

        base = _docs(rd, [(i, f"b{i % 37}") for i in range(200)])
        delta = _docs(rd, [(1000 + i, f"b{i}" if i % 3 == 0 else f"n{i}")
                           for i in range(60)])
        idx = incremental.build_index(base).materialize()
        a = (incremental.ingest_delta(idx, delta)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        b = (incremental.ingest_delta_semijoin(idx, delta)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert (a.values == b.values).all()

    def test_tiny_bloom_high_fpp_still_exact(self, ray_session):
        """Even a saturated bloom (64 bits for 60 keys -> fpp ~ 1) only
        lets EXTRA index rows through — never loses a hit."""
        import ray.data as rd

        base = _docs(rd, [(i, f"t{i}") for i in range(100)])
        delta = _docs(rd, [(500 + i, f"t{i * 2}") for i in range(60)])
        idx = incremental.build_index(base).materialize()
        a = (incremental.ingest_delta(idx, delta)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        b = (incremental.ingest_delta_semijoin(idx, delta, m_bits=64, k=2)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert (a.values == b.values).all()

    def test_filter_shrinks_index_side(self, ray_session):
        """The point of the semi-join: with a big index and a small
        delta, the filtered index stream is ~|delta|, not |index|."""
        import ray

        import ray.data as rd

        from hmse_ray.functions.bloom import Bloom, build_from_dataset

        base = _docs(rd, [(i, f"u{i}") for i in range(5000)])
        delta = _docs(rd, [(90000 + i, f"u{i * 100}") for i in range(20)])
        idx = incremental.build_index(base).materialize()
        d_sha = incremental.sha_rows(delta)
        bloom = build_from_dataset(d_sha, "sha256")
        shas = idx.to_pandas()["sha256"].to_numpy()
        kept = int(bloom.contains_many(shas).sum())
        # 20 true members + fpp * 5000; at m=2^20/k=7 fpp is ~0 here
        assert 20 <= kept <= 40, kept
