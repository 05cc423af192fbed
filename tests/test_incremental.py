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


# --------------------------------------------------- incremental NEAR-dup

# Long distinct base texts; 'qq'-suffixed variants are high-Jaccard
# near-dups (byte-4-gram J ~ 0.98 >> the 0.8 threshold), reversed texts
# share almost no 4-grams with their originals.
def _long(tag: str) -> str:
    return " ".join(f"{tag}{i} token{(i * 7 + len(tag)) % 23}" for i in range(40))


def _neardup_cfg():
    from hmse_ray.pipelines.queries import TEXT_CFG

    return TEXT_CFG


def _ingest_df(bands, sigs, delta, cfg, **kw):
    return (incremental.ingest_delta_neardup(bands, sigs, delta, cfg, **kw)
            .to_pandas().set_index("doc_id").sort_index())


class TestNeardupIngest:
    def test_planted_outcomes(self, ray_session):
        """All three online outcomes: hit-on-base, elected-new, and
        hit-on-earlier-new-delta-insert (the within-shard online path)."""
        import ray.data as rd

        cfg = _neardup_cfg()
        base = _docs(rd, [(1, _long("alpha")), (2, _long("beta")),
                          (3, _long("gamma"))])
        delta = _docs(rd, [
            (10, _long("beta") + " qq"),    # near-dup of base 2 -> hit
            (11, _long("omega")),           # novel -> new
            (12, _long("omega") + " qq"),   # near-dup of 11 ONLY -> earlier-new
            (13, _long("zeta")),            # novel -> new
        ])
        bands, sigs = incremental.build_neardup_index(base, cfg)
        out = _ingest_df(bands, sigs, delta, cfg)
        assert out.loc[10, "canonical_id"] == 2 and out.loc[10, "is_new"] == 0
        assert out.loc[11, "canonical_id"] == 11 and out.loc[11, "is_new"] == 1
        assert out.loc[12, "canonical_id"] == 11 and out.loc[12, "is_new"] == 0
        assert out.loc[13, "canonical_id"] == 13 and out.loc[13, "is_new"] == 1

    def test_matched_docs_are_not_inserted(self, ray_session):
        """The reference's online rule: a delta-encoded (matched) record
        never enters the band tables — so a later ingest matching IT
        must instead match nothing (or its canonical's entry)."""
        import ray.data as rd

        cfg = _neardup_cfg()
        base = _docs(rd, [(1, _long("alpha"))])
        d1 = _docs(rd, [(10, _long("alpha") + " qq")])  # hit on 1, NOT inserted
        bands, sigs = incremental.build_neardup_index(base, cfg)
        a1 = incremental.ingest_delta_neardup(bands, sigs, d1, cfg).materialize()
        nb, ns = incremental.neardup_index_delta(a1, d1, cfg)
        assert nb.count() == 0 and ns.count() == 0  # nothing new -> no insert

    def test_reingest_same_id_is_idempotent(self, ray_session):
        """A delta id already in the index (re-crawl / operator retry)
        must come back (id, canonical=id, is_new=0) — and must NOT
        poison the pair groups of other delta docs matching it: before
        the guard, the duplicated signature made every group touching
        the id exceed verify_pairs' two-row shape and the matches were
        silently dropped (is_new=1, duplicate index append)."""
        import ray.data as rd

        cfg = _neardup_cfg()
        base = _docs(rd, [(1, _long("alpha")), (2, _long("beta"))])
        bands, sigs = incremental.build_neardup_index(base, cfg)
        delta = _docs(rd, [
            (2, _long("beta")),            # ALREADY INDEXED id
            (12, _long("beta") + " qq"),   # near-dup of doc 2 -> must hit
            (13, _long("rho")),            # novel -> new
        ])
        out, signed = incremental.ingest_delta_neardup(
            bands, sigs, delta, cfg, return_signed=True)
        df = out.to_pandas().set_index("doc_id").sort_index()
        assert df.loc[2, "canonical_id"] == 2 and df.loc[2, "is_new"] == 0
        assert df.loc[12, "canonical_id"] == 2 and df.loc[12, "is_new"] == 0
        assert df.loc[13, "canonical_id"] == 13 and df.loc[13, "is_new"] == 1
        # the re-ingested id never re-enters the index (no duplicates)
        nb, ns = incremental.neardup_index_delta(out, delta, cfg)
        got = sorted(ns.to_pandas()["image_id"].astype(int).tolist())
        assert got == [13], got
        # signed excludes the re-ingested id (safe to filter for append)
        sids = sorted(signed.to_pandas()["image_id"].astype(int).tolist())
        assert sids == [12, 13], sids

    def test_index_delta_reuses_signed(self, ray_session):
        """neardup_index_delta(signed_ds=...) must produce the same
        index rows as the re-signing path, without a second signing
        pass over the delta."""
        import ray.data as rd

        cfg = _neardup_cfg()
        base = _docs(rd, [(1, _long("alpha")), (2, _long("beta"))])
        bands, sigs = incremental.build_neardup_index(base, cfg)
        delta = _docs(rd, [(10, _long("beta") + " qq"),  # hit -> not inserted
                           (11, _long("tau")),            # new
                           (12, _long("ups"))])           # new
        out, signed = incremental.ingest_delta_neardup(
            bands, sigs, delta, cfg, return_signed=True)
        out = out.materialize()
        nb1, ns1 = incremental.neardup_index_delta(out, delta, cfg)
        nb2, ns2 = incremental.neardup_index_delta(
            out, delta, cfg, signed_ds=signed)
        norm = incremental._normalize_sigs(cfg)
        p1 = (ns1.map_batches(norm, batch_format="pyarrow").to_pandas()
              .sort_values("image_id").reset_index(drop=True))
        p2 = (ns2.map_batches(norm, batch_format="pyarrow").to_pandas()
              .sort_values("image_id").reset_index(drop=True))
        assert p1.equals(p2)
        b1 = (nb1.to_pandas().sort_values(["image_id", "bucket"])
              .reset_index(drop=True))
        b2 = (nb2.to_pandas().sort_values(["image_id", "bucket"])
              .reset_index(drop=True))
        assert b1.equals(b2)

    def test_fold_equivalence(self, ray_session):
        """ingest(D1) then ingest(D2) against the appended index ==
        ingest(D1 ∪ D2) in one shot (ids(D1) < ids(D2)) — the property
        that makes shard-splitting lossless."""
        import pandas as pd

        import ray.data as rd

        cfg = _neardup_cfg()
        base = _docs(rd, [(i, _long(f"b{i}")) for i in range(1, 6)])
        rows1 = [(10, _long("b2") + " qq"),   # hit on base 2
                 (11, _long("x")),            # new
                 (12, _long("x") + " qq")]    # earlier-new 11
        rows2 = [(20, _long("x") + " qq qq"),  # matches 11 (new in D1) via index
                 (21, _long("y")),             # new
                 (22, _long("b3") + " qq")]    # hit on base 3
        d1, d2 = _docs(rd, rows1), _docs(rd, rows2)
        dc = _docs(rd, rows1 + rows2)
        bands, sigs = incremental.build_neardup_index(base, cfg)
        bands, sigs = bands.materialize(), sigs.materialize()

        a1 = incremental.ingest_delta_neardup(bands, sigs, d1, cfg).materialize()
        nb, ns = incremental.neardup_index_delta(a1, d1, cfg)
        bands1 = bands.union(nb).materialize()
        sigs1 = sigs.union(
            ns.map_batches(lambda t: t, batch_format="pyarrow")).materialize()
        a2 = incremental.ingest_delta_neardup(bands1, sigs1, d2, cfg)
        two = pd.concat([a1.to_pandas(), a2.to_pandas()]).sort_values(
            "doc_id").reset_index(drop=True)

        one = (incremental.ingest_delta_neardup(bands, sigs, dc, cfg)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert (two.values == one.values).all(), (two, one)
        # the cross-shard case actually exercised the index-append path
        both = two.set_index("doc_id")
        assert both.loc[20, "canonical_id"] == 11 and both.loc[20, "is_new"] == 0

    def test_persist_load_round_trip(self, ray_session):
        import ray.data as rd

        cfg = _neardup_cfg()
        base = _docs(rd, [(1, _long("alpha")), (2, _long("beta"))])
        delta = _docs(rd, [(10, _long("alpha") + " qq"), (11, _long("nu"))])
        bands, sigs = incremental.build_neardup_index(base, cfg)
        with tempfile.TemporaryDirectory(dir="/tmp") as d:
            path = incremental.persist_neardup_index(
                bands, sigs, os.path.join(d, "ndidx"))
            assert os.path.exists(os.path.join(path, "_SUCCESS"))
            lb, ls = incremental.load_neardup_index(path)
            mem = _ingest_df(bands, sigs, delta, cfg)
            disk = _ingest_df(lb, ls, delta, cfg)
            assert (mem.values == disk.values).all()
        with tempfile.TemporaryDirectory(dir="/tmp") as d:
            with pytest.raises(FileNotFoundError):
                incremental.load_neardup_index(d)

    def test_semijoin_identical(self, ray_session):
        """Bloom pre-filter on int64 bucket keys: bit-identical output,
        even saturated (m_bits=64 -> fpp ~ 1 only ADDS index rows)."""
        import ray.data as rd

        cfg = _neardup_cfg()
        base = _docs(rd, [(i, _long(f"s{i}")) for i in range(1, 40)])
        delta = _docs(rd, [(100 + i, _long(f"s{i * 3}") + (" qq" if i % 2 else ""))
                           for i in range(1, 15)])
        bands, sigs = incremental.build_neardup_index(base, cfg)
        bands, sigs = bands.materialize(), sigs.materialize()
        a = _ingest_df(bands, sigs, delta, cfg)
        b = _ingest_df(bands, sigs, delta, cfg, semijoin=True)
        c = _ingest_df(bands, sigs, delta, cfg, semijoin=True, m_bits=64, k=2)
        assert (a.values == b.values).all()
        assert (a.values == c.values).all()

    def test_semijoin_filters_index_bands(self, ray_session):
        """The point of the bloom: the filtered index band stream is
        ~|delta matches| x bands, not |index| x bands."""
        import ray.data as rd

        from hmse_ray.functions.bloom import build_from_dataset

        cfg = _neardup_cfg()
        base = _docs(rd, [(i, _long(f"u{i}")) for i in range(1, 400)])
        delta = _docs(rd, [(1000 + i, _long(f"u{i * 50}")) for i in range(1, 5)])
        bands, _ = incremental.build_neardup_index(base, cfg)
        bands = bands.materialize()
        dsig = incremental.sign_minhash(delta, cfg).materialize()
        dbands = incremental.band_rows(dsig, cfg).materialize()
        bloom = build_from_dataset(dbands, "bucket", int_keys=True)
        keys = bands.to_pandas()["bucket"].to_numpy()
        kept = int(bloom.contains_many_i64(keys).sum())
        # >= 4 exact-dup deltas x 16 bands true hits must survive; the
        # stream must shrink to a small fraction of |index| x bands
        # (natural near-collisions between the structured synthetic
        # texts add some legitimate extras; bloom fpp ~0 at 2^20)
        assert 4 * cfg.num_bands <= kept <= len(keys) // 10, (kept, len(keys))

    def test_matches_bruteforce_online_simulation(self, ray_session):
        """The pipeline's assignment must equal a direct O(n^2)
        simulation of the reference's online loop (probe bands ->
        est-verify -> first-writer insert) on a random mixed corpus —
        a structure-free pin beyond the planted fixtures."""
        import numpy as np

        import ray.data as rd

        from hmse_ray.functions import minhash as mh_fn

        cfg = _neardup_cfg()
        rng = np.random.default_rng(20260819)
        vocab = [f"w{i:03d}" for i in range(300)]
        base_rows, delta_rows = [], []
        texts = {}

        def mk(tag):
            return " ".join(
                str(vocab[int(rng.integers(300))]) for _ in range(45))

        for i in range(1, 25):
            t = mk(i)
            base_rows.append((i, t))
            texts[i] = t
        nid = 100
        for i in range(12):
            r = rng.random()
            if r < 0.4:  # near-dup of a random base doc
                src = int(rng.integers(1, 25))
                t = texts[src] + " zz"
            elif r < 0.6 and delta_rows:  # near-dup of an earlier delta doc
                src, st = delta_rows[int(rng.integers(len(delta_rows)))]
                t = st + " qq"
            else:  # novel
                t = mk(f"d{i}")
            delta_rows.append((nid, t))
            texts[nid] = t
            nid += 1

        # brute-force online simulation with the pipeline's own kernels
        ids = [i for i, _ in base_rows] + [i for i, _ in delta_rows]
        sigs = mh_fn.signatures([texts[i].encode() for i in ids], cfg)
        bands = mh_fn.band_hashes(sigs, cfg)
        pos = {d: k for k, d in enumerate(ids)}
        index = [i for i, _ in base_rows]  # online band-table contents
        expect = {}
        for d, _ in delta_rows:
            matches = []
            for b in index:
                share = (bands[pos[d]] == bands[pos[b]]).any()
                est = (sigs[pos[d]] == sigs[pos[b]]).mean()
                if share and est >= cfg.jaccard_threshold:
                    matches.append(b)
            if matches:
                expect[d] = (min(matches), 0)
            else:
                expect[d] = (d, 1)
                index.append(d)

        bds, sg = incremental.build_neardup_index(_docs(rd, base_rows), cfg)
        out = _ingest_df(bds, sg, _docs(rd, delta_rows), cfg)
        for d, (canon, new) in expect.items():
            assert out.loc[d, "canonical_id"] == canon, (d, expect[d])
            assert out.loc[d, "is_new"] == new, (d, expect[d])

    def test_bucket_cap_smoke(self, ray_session):
        """bucket_cap engages representative probing without losing the
        exact-duplicate hits (dups share every bucket with the min-id
        base rep, so representative probing still finds them)."""
        import ray.data as rd

        cfg = _neardup_cfg()
        shared = _long("hot")
        base = _docs(rd, [(i, shared) for i in range(1, 30)])  # one mega-bucket set
        delta = _docs(rd, [(100, shared), (101, _long("cold"))])
        bands, sigs = incremental.build_neardup_index(base, cfg)
        out = _ingest_df(bands, sigs, delta, cfg, bucket_cap=4)
        assert out.loc[100, "canonical_id"] == 1 and out.loc[100, "is_new"] == 0
        assert out.loc[101, "is_new"] == 1
