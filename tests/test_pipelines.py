"""Integration tests: flagship pipeline, store/verify roundtrip,
checkpoint resume, determinism (SURVEY.md section 5 items 1/2/4/5)."""

from __future__ import annotations

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from hmse_ray.config import DEFAULT_CONFIG as CFG

N_FIX = 300
SEED = 1234


@pytest.fixture(scope="module")
def fixture_dir(ray_session):
    from hmse_ray.sources import fixtures

    return fixtures.fixture_dir(N_FIX, seed=SEED)


@pytest.fixture(scope="module")
def cluster_df(ray_session, fixture_dir):
    from hmse_ray.pipelines import dedup

    images = dedup.read_images(fixture_dir + "/images")
    return dedup.cluster_assignments(images, CFG).to_pandas()


class TestFlagship:
    def test_general_verify_path_matches_broadcast(
        self, ray_session, fixture_dir, cluster_df, monkeypatch
    ):
        """VERDICT r02 item 9: force every pair set past
        _PAIR_BROADCAST_LIMIT so the whole flagship runs the general
        (co-partitioned shuffle) verify path end-to-end; cluster
        assignments must be identical to the broadcast fast path."""
        from hmse_ray.pipelines import dedup
        from hmse_ray.stages import lsh

        monkeypatch.setattr(lsh, "_PAIR_BROADCAST_LIMIT", 0)
        images = dedup.read_images(fixture_dir + "/images")
        general = dedup.cluster_assignments(images, CFG).to_pandas()
        a = cluster_df.sort_values("image_id").reset_index(drop=True)
        b = general.sort_values("image_id").reset_index(drop=True)
        assert a["image_id"].tolist() == b["image_id"].tolist()
        assert a["cluster_id"].tolist() == b["cluster_id"].tolist()

    def test_covers_all_images(self, fixture_dir, cluster_df):
        images = pq.read_table(fixture_dir + "/images", columns=["image_id"])
        assert sorted(cluster_df["image_id"]) == sorted(images["image_id"].to_pylist())

    def test_required_dup_pair_recall(self, fixture_dir, cluster_df):
        # north_rule: dup-pair recall >= 0.99 on reliably-detectable pairs
        gp = pq.read_table(fixture_dir + "/golden_pairs.parquet").to_pandas()
        req = gp[gp.required]
        lbl = dict(zip(cluster_df.image_id, cluster_df.cluster_id))
        hit = sum(lbl[a] == lbl[b] for a, b in zip(req.id_a, req.id_b))
        assert hit / len(req) >= 0.99

    def test_no_overmerge_of_golden_groups(self, fixture_dir, cluster_df):
        gc = pq.read_table(fixture_dir + "/golden_clusters.parquet").to_pandas()
        gold = dict(zip(gc.image_id, gc.cluster_id))
        lbl = dict(zip(cluster_df.image_id, cluster_df.cluster_id))
        from collections import defaultdict

        members = defaultdict(set)
        for iid, c in lbl.items():
            members[c].add(gold[iid])
        mixed = sum(1 for v in members.values() if len(v) > 1)
        assert mixed == 0

    def test_cluster_id_is_component_min(self, cluster_df):
        grp = cluster_df.groupby("cluster_id")["image_id"].min()
        assert (grp.index == grp.values).all()

    def test_determinism(self, ray_session, fixture_dir, cluster_df):
        from hmse_ray.pipelines import dedup

        images = dedup.read_images(fixture_dir + "/images")
        again = dedup.cluster_assignments(images, CFG).to_pandas()
        a = cluster_df.sort_values("image_id").reset_index(drop=True)
        b = again.sort_values("image_id").reset_index(drop=True)
        assert a.equals(b)

    def test_dedup_first_matches_direct(self, ray_session, fixture_dir, cluster_df):
        # dedup-before-sign must yield the same components as signing
        # every row (duplicate signatures are identical)
        from hmse_ray.pipelines import dedup

        direct = dedup.cluster_assignments(
            fixture_dir + "/images", CFG, dedup_first=True
        ).to_pandas()
        a = cluster_df.sort_values("image_id").reset_index(drop=True)
        b = direct.sort_values("image_id").reset_index(drop=True)
        assert a.equals(b)

    def test_distributed_cc_matches_driver(self, ray_session, fixture_dir, cluster_df):
        from hmse_ray.pipelines import dedup

        images = dedup.read_images(fixture_dir + "/images")
        dist = dedup.cluster_assignments(images, CFG, force_distributed=True).to_pandas()
        a = cluster_df.sort_values("image_id").reset_index(drop=True)
        b = dist.sort_values("image_id").reset_index(drop=True)
        assert a.equals(b)


class TestExactDedupCapability:
    def test_five_copies_within_1p1x(self, ray_session):
        # README.md:1301-1315 / 2153: 5 identical copies => physical <= 1.1x unique
        from hmse_ray.pipelines import dedup
        from hmse_ray.sources import fixtures

        images, _, _ = fixtures.generate_images(60, seed=9)
        five = __import__("pyarrow").concat_tables([images] * 5)
        # re-id the copies so ids stay unique
        import pyarrow as pa

        ids = [f"{i}c{k}" for k in range(5) for i in images["image_id"].to_pylist()]
        five = five.set_column(0, "image_id", pa.array(ids))
        idx = dedup.chunk_index(dedup.read_images(five), CFG)
        st = __import__("hmse_ray.stages.exact_dedup", fromlist=["dedup_stats"]).dedup_stats(
            idx
        ).to_pandas().iloc[0]
        assert st["physical_bytes"] <= 1.1 * (st["logical_bytes"] / 5)


class TestStoreVerify:
    def test_roundtrip_invariant(self, ray_session, fixture_dir, cluster_df):
        import ray

        from hmse_ray.pipelines import dedup, verify

        images = dedup.read_images(fixture_dir + "/images")
        clusters = ray.data.from_pandas(cluster_df)
        inv = verify.roundtrip(images, clusters, CFG)
        assert inv["caption_pass"] == inv["n_rows"] == N_FIX
        assert inv["pixel_pass"] == inv["n_rows"]
        assert inv["n_missing"] == 0

    def test_lost_rows_are_surfaced_not_masked(self, ray_session, fixture_dir,
                                               cluster_df):
        """A verifier whose join silently drops records must not report
        100%% pass over the shrunken universe: removing one restored row
        must show up as n_missing, not as a smaller-but-passing n_rows."""
        import ray

        from hmse_ray.pipelines import dedup, verify
        from hmse_ray.stages import store

        images = dedup.read_images(fixture_dir + "/images")
        clusters = ray.data.from_pandas(cluster_df)
        st = store.store_table(images, clusters, CFG).materialize()
        restored = verify.reconstruct(st, CFG).materialize()
        drop_id = restored.take(1)[0]["image_id"]
        crippled = restored.filter(
            lambda r: r["image_id"] != drop_id)
        inv = verify.verify_invariant(crippled, images, CFG)
        assert inv["n_missing"] == 1
        assert inv["n_rows"] == N_FIX - 1

    def test_null_caption_row_roundtrips(self, ray_session):
        """Null captions are tolerated by the signer; the store and the
        verify loop must not crash on them either."""
        import numpy as np
        import pandas as pd

        import ray

        from hmse_ray.functions import imagecodec
        from hmse_ray.pipelines import verify
        from hmse_ray.sources.fixtures import IMG_H, IMG_W
        from hmse_ray.stages import store

        rows = []
        for i in range(2):
            pix = np.full((IMG_H, IMG_W, 3), 40 * (i + 1), np.uint8)
            rows.append({"image_id": f"n{i}",
                         "bytes": imagecodec.encode(pix, "png"),
                         "w": IMG_W, "h": IMG_H, "fmt": "png",
                         "caption": None if i == 0 else "cap",
                         "phash": 0})
        images = ray.data.from_pandas(pd.DataFrame(rows))
        clusters = ray.data.from_pandas(pd.DataFrame(
            {"image_id": ["n0", "n1"], "cluster_id": ["n0", "n1"]}))
        st = store.store_table(images, clusters, CFG)
        assert st.count() == 2
        inv = verify.roundtrip(images, clusters, CFG)
        # the null caption restores as "" (the signer's b"" convention),
        # so it cannot byte-equal None — but nothing crashes and the
        # non-null row passes
        assert inv["n_rows"] == 2 and inv["n_missing"] == 0
        assert inv["pixel_pass"] == 2

    def test_store_kinds_present(self, ray_session, fixture_dir, cluster_df):
        import ray

        from hmse_ray.pipelines import dedup
        from hmse_ray.stages import store

        images = dedup.read_images(fixture_dir + "/images")
        st = store.store_table(images, ray.data.from_pandas(cluster_df), CFG)
        kinds = set(st.to_pandas()["store_kind"])
        assert kinds <= {"full", "pointer", "delta"}
        assert "pointer" in kinds  # planted exact dups must pointer
        assert "full" in kinds


class TestResume:
    def test_kill_and_resume_identical(self, ray_session, fixture_dir, tmp_path):
        from hmse_ray.sources import fixtures
        from hmse_ray.state import checkpoint

        images = pq.read_table(fixture_dir + "/images")
        shard_dir = str(tmp_path / "shards")
        files = fixtures.write_sharded(images, shard_dir, shards=6)

        out_a = str(tmp_path / "run_uninterrupted")
        checkpoint.run_resumable(files, out_a, CFG, num_partitions=4)

        out_b = str(tmp_path / "run_killed")
        with pytest.raises(RuntimeError, match="simulated kill"):
            checkpoint.run_resumable(files, out_b, CFG, num_partitions=4, stop_after=2)
        done_markers = [
            os.path.join(out_b, "phase1", d, "_SUCCESS")
            for d in os.listdir(os.path.join(out_b, "phase1"))
        ]
        assert len(done_markers) == 2
        mtimes = {m: os.path.getmtime(m) for m in done_markers}

        checkpoint.run_resumable(files, out_b, CFG, num_partitions=4)  # resume
        for m, t in mtimes.items():  # finished partitions not recomputed
            assert os.path.getmtime(m) == t

        ca = pq.read_table(os.path.join(out_a, "final", "clusters")).to_pandas()
        cb = pq.read_table(os.path.join(out_b, "final", "clusters")).to_pandas()
        ca = ca.sort_values("image_id").reset_index(drop=True)
        cb = cb.sort_values("image_id").reset_index(drop=True)
        assert ca.equals(cb)

    def test_partition_count_invariance(self, ray_session, fixture_dir, tmp_path):
        # final clusters must not depend on how the input was partitioned
        from hmse_ray.sources import fixtures
        from hmse_ray.state import checkpoint

        images = pq.read_table(fixture_dir + "/images")
        files = fixtures.write_sharded(images, str(tmp_path / "sp"), shards=6)
        outs = []
        for p in (2, 5):
            out = str(tmp_path / f"run_p{p}")
            checkpoint.run_resumable(files, out, CFG, num_partitions=p)
            outs.append(
                pq.read_table(os.path.join(out, "final", "clusters"))
                .to_pandas()
                .sort_values("image_id")
                .reset_index(drop=True)
            )
        assert outs[0].equals(outs[1])

    def test_resume_recomputes_on_new_input_files(self, ray_session,
                                                  fixture_dir, tmp_path):
        """A _SUCCESS marker must not be trusted when the input set
        changed: re-running with an extra shard that hashes into a
        finished partition must recompute it (lineage mismatch), not
        silently drop the new shard from the run."""
        from hmse_ray.sources import fixtures
        from hmse_ray.state import checkpoint

        images = pq.read_table(fixture_dir + "/images")
        files = fixtures.write_sharded(images, str(tmp_path / "sl"), shards=6)
        out = str(tmp_path / "run_lineage")
        checkpoint.run_resumable(files[:4], out, CFG, num_partitions=2)
        n_before = pq.read_table(
            os.path.join(out, "final", "clusters")).num_rows

        checkpoint.run_resumable(files, out, CFG, num_partitions=2)
        clusters = pq.read_table(os.path.join(out, "final", "clusters"))
        assert clusters.num_rows == N_FIX > n_before
        # every shard's rows made it into the final clusters
        got = set(clusters.to_pandas()["image_id"])
        want = set(images.to_pandas()["image_id"])
        assert got == want

    def test_partition_metrics_written(self, ray_session, fixture_dir, tmp_path):
        from hmse_ray.sources import fixtures
        from hmse_ray.state import checkpoint

        images = pq.read_table(fixture_dir + "/images")
        files = fixtures.write_sharded(images, str(tmp_path / "s2"), shards=3)
        out = str(tmp_path / "run_m")
        stats = checkpoint.run_resumable(
            files, out, CFG, num_partitions=2, write_store=True
        )
        assert stats["n_total"] >= stats["n_unique"] > 0
        kinds = {r["store_kind"] for r in stats["store_kinds"]}
        assert "full" in kinds and "pointer" in kinds
        assert os.path.exists(os.path.join(out, "final", "store"))
        for pm in stats["partitions"]:
            assert pm["partition_dedup_ratio"] >= 1.0
            assert pm["n_rows"] > 0
        lineage = json.load(
            open(os.path.join(out, "phase1", "part=0", "lineage.json"))
        )
        assert lineage["input_files"]


class TestSubstringCaptions:
    def test_flag_links_contained_caption(self, ray_session):
        """cfg.substring_captions=True links a caption wholly contained
        in a much longer caption (too dissimilar for MinHash banding:
        jaccard ~0.2 vs threshold 0.8); default False leaves them
        apart."""
        import pyarrow as pa

        from hmse_ray.pipelines import dedup

        short = "a remarkably specific caption about a turquoise bicycle " * 2
        long_ = short + " entirely different trailing content " * 10
        other = "unrelated text about volcanic geology and sediment layers " * 4
        table = pa.table(
            {
                "image_id": ["s1", "s2", "s3"],
                "caption": [short, long_, other],
            }
        )
        base = dedup.cluster_assignments(
            table, CFG, use_simhash=False
        ).to_pandas().set_index("image_id")["cluster_id"]
        assert base["s1"] != base["s2"]
        on = dedup.cluster_assignments(
            table, CFG.with_overrides(substring_captions=True), use_simhash=False
        ).to_pandas().set_index("image_id")["cluster_id"]
        assert on["s1"] == on["s2"]
        assert on["s3"] != on["s1"]
