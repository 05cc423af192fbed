"""Round-2 driver-query additions: ANN recall, planted embedding
near-dups, streaming image derivation, store/verify queries, checkpoint
marker filtering."""

from __future__ import annotations

import os

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


class TestAnnRecall:
    def test_approx_paths_recall(self, ray_session):
        from hmse_ray.pipelines.queries import ann_recall

        df = ann_recall(SF)
        assert set(df["method"]) == {"lsh", "ivf"}
        # approximate paths must find >= 90% of the brute-force top-10
        assert (df["recall_at_k"] >= 0.9).all(), df.to_dict("records")

    def test_fixed_seed_rowcount_pins(self, ray_session):
        """VERDICT r02 item 10: seeds are fixed, so the approximate
        candidate sets are deterministic — pin the result row counts
        (10 queries x k=10 when every query fills its top-k)."""
        from hmse_ray.pipelines.queries import ann_topk_ivf, ann_topk_lsh

        lsh = ann_topk_lsh(SF).to_pandas()
        ivf = ann_topk_ivf(SF).to_pandas()
        assert len(lsh) == 100, len(lsh)
        assert len(ivf) == 100, len(ivf)
        assert lsh.groupby("query_id").size().max() <= 10
        assert ivf.groupby("query_id").size().max() <= 10

    def test_lsh_many_queries_bounded(self, ray_session):
        """VERDICT r03 item 8: large query sets must keep per-batch work
        vectorized (one lexsort over candidates, no per-query Python
        loop). nq=500 = every vector in the sf0.001 table is a query;
        recall for the standard 10 queries stays >= 0.9."""
        from hmse_ray.pipelines.queries import ann_topk, ann_topk_lsh

        lsh = ann_topk_lsh(SF, n_queries=500).to_pandas()
        assert len(lsh) == 5000, len(lsh)  # 500 queries x full top-10
        assert lsh.groupby("query_id").size().max() <= 10
        exact = ann_topk(SF).to_pandas()
        truth = {q: set(g["vec_id"]) for q, g in exact.groupby("query_id")}
        sub = lsh[lsh["query_id"] < 10]
        hit = sum(
            len(set(g["vec_id"]) & truth[q]) for q, g in sub.groupby("query_id")
        )
        assert hit / 100 >= 0.9, hit

    def test_lsh_partitioned_matches_broadcast(self, ray_session):
        """The query-PARTITIONED variant (queries as a Dataset, one
        co-partition shuffle on the bucket key — the >1k-query scale
        shape) returns EXACTLY the broadcast variant's results: same
        probe sets, same candidates, same (-score, vec_id) tie-break."""
        from hmse_ray.pipelines.queries import (
            ann_topk_lsh,
            ann_topk_lsh_partitioned,
        )

        cols = ["query_id", "score_r", "vec_id"]
        a = (
            ann_topk_lsh(SF, n_queries=100)
            .to_pandas()
            .sort_values(cols)
            .reset_index(drop=True)
        )
        b = (
            ann_topk_lsh_partitioned(SF, n_queries=100)
            .to_pandas()
            .sort_values(cols)
            .reset_index(drop=True)
        )
        assert len(a) == len(b) > 0
        assert a[cols].equals(b[cols])


class TestEmbeddingNearDups:
    def test_planted_pairs_found(self, ray_session):
        from hmse_ray.pipelines.queries import PLANT_OFFSET, embedding_near_dups

        df = embedding_near_dups(SF).to_pandas()
        assert len(df) > 0  # non-vacuous at sf0.001 (VERDICT r01 finding 7)
        import pyarrow.parquet as pq

        ids = pq.read_table(
            os.path.join(SF, "embeddings.parquet"), columns=["vec_id"]
        )["vec_id"].to_numpy()
        planted = set(ids[ids % 20 == 0].astype(np.int64))
        found = set()
        for a, b in zip(df["id_a"], df["id_b"]):
            lo, hi = min(a, b), max(a, b)
            if hi - PLANT_OFFSET == lo:
                found.add(lo)
        assert len(found) / max(1, len(planted)) >= 0.9
        # every reported pair really is cosine-close
        assert (df["cosine"] >= 0.98).all()


class TestStreamingImageDerivation:
    def test_ds_matches_table(self, ray_session):
        from hmse_ray.sources import fixtures

        t = fixtures.images_from_documents(SF)
        ds = fixtures.images_from_documents_ds(SF).to_pandas()
        ds = ds.sort_values("image_id").reset_index(drop=True)
        tt = t.to_pandas().sort_values("image_id").reset_index(drop=True)
        assert ds.equals(tt)


class TestNgramPairs:
    def test_pairs_verified_exact(self, ray_session):
        from hmse_ray.functions import textstats
        from hmse_ray.pipelines.queries import ngram_jaccard_pairs

        df = ngram_jaccard_pairs(SF).to_pandas()
        assert len(df) > 0
        assert (df["jaccard"] >= 0.7).all()
        assert (df["id_a"] < df["id_b"]).all()
        # spot-check reported scores against a direct computation
        import pyarrow.parquet as pq

        docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                             columns=["doc_id", "text"]).to_pandas()
        txt = dict(zip(docs["doc_id"], docs["text"]))
        for r in df.head(5).itertuples():
            j = textstats.ngram_jaccard(txt[r.id_a], txt[r.id_b])
            assert abs(j - r.jaccard) < 1e-6

    def test_prefix_filter_recall_vs_bruteforce(self, ray_session):
        """Pairs with INTERMEDIATE similarity (0.7-0.9) — the band LSH
        S-curve blind spot — must all be found (prefix-filter recall
        guarantee)."""
        import itertools

        import pyarrow as pa
        import ray.data as rd

        from hmse_ray.functions import textstats
        from hmse_ray.pipelines.queries import exact_jaccard_pairs

        rng = __import__("numpy").random.default_rng(77)
        base = "the quick brown fox jumps over the lazy dog " * 8
        texts = []
        for i in range(40):
            # perturb a shared base by replacing a variable-length tail
            # so pairwise jaccards spread across [0.3, 1.0]
            cut = rng.integers(0, len(base) // 2)
            tail = "".join(rng.choice(list("abcdefgh ")) for _ in range(cut))
            texts.append(base[: len(base) - cut] + tail)
        docs = rd.from_arrow(
            pa.table({"doc_id": pa.array(range(40), pa.int64()),
                      "text": pa.array(texts, pa.string())})
        )
        got = exact_jaccard_pairs(docs, 0.7).to_pandas()
        got_pairs = {(int(a), int(b)) for a, b in zip(got.id_a, got.id_b)}
        want = {
            (i, j)
            for i, j in itertools.combinations(range(40), 2)
            if textstats.ngram_jaccard(texts[i], texts[j]) >= 0.7
        }
        assert want, "fixture must contain >=1 true pair"
        assert got_pairs == want


class TestStoreQueries:
    def test_store_kind_stats(self, ray_session):
        from hmse_ray.pipelines.queries import store_kind_stats_docs

        df = store_kind_stats_docs(SF)
        kinds = set(df["store_kind"])
        assert "pointer" in kinds  # planted exact dups
        assert "full" in kinds

    def test_roundtrip_invariant(self, ray_session):
        from hmse_ray.pipelines.queries import roundtrip_invariant

        df = roundtrip_invariant(SF)
        r = df.iloc[0]
        assert r["caption_pass"] == r["n_rows"] > 0
        assert r["pixel_pass"] == r["n_rows"]


class TestCdcSourceChunks:
    def test_streams_reassemble_and_bound(self, ray_session):
        import pyarrow.parquet as pq

        from hmse_ray.config import DEFAULT_CONFIG as CFG
        from hmse_ray.pipelines.queries import cdc_source_chunks

        df = cdc_source_chunks(SF).to_pandas()
        assert len(df) > 0
        assert (df["chunk_len"] <= CFG.chunk_max).all()
        docs = pq.read_table(
            os.path.join(SF, "documents.parquet"), columns=["source", "text"]
        ).to_pandas()
        want_len = docs.assign(n=docs["text"].str.len()).groupby("source")["n"].sum()
        got_len = df.groupby("source")["chunk_len"].sum()
        assert got_len.sort_index().equals(want_len.sort_index())
        # at least one source long enough to produce multiple chunks
        assert df.groupby("source")["chunk_idx"].max().max() >= 1


class TestPairHistograms:
    def test_est_tracks_true_histogram(self, ray_session):
        """Same murmur-rank pairing on both sides: the MinHash-estimate
        histogram must roughly match the exact-Jaccard one (O2
        estimator calibration)."""
        from hmse_ray.pipelines.queries import (
            random_pair_jaccard_hist,
            random_pair_true_jaccard_hist,
        )

        est = random_pair_jaccard_hist(SF)
        true = random_pair_true_jaccard_hist(SF)
        assert est["n_pairs"].sum() == true["n_pairs"].sum() > 0
        l1 = (est["n_pairs"] - true["n_pairs"]).abs().sum()
        # estimator stderr ~1/sqrt(128)=0.09 vs 0.1-wide bins: allow
        # boundary spill on up to half the pairs
        assert l1 <= est["n_pairs"].sum()

    def test_estimate_hist_no_driver_signature_collect(self, ray_session,
                                                       monkeypatch):
        """VERDICT r4 item 2: the estimate histogram must never collect
        the signature table on the driver — the only driver-side
        to_pandas allowed is the P x n_bins histogram rows."""
        import ray.data

        from hmse_ray.pipelines.queries import random_pair_jaccard_hist

        collected = []
        orig = ray.data.Dataset.to_pandas

        def spy(self, *a, **kw):
            df = orig(self, *a, **kw)
            collected.append((list(df.columns), len(df)))
            return df

        monkeypatch.setattr(ray.data.Dataset, "to_pandas", spy)
        out = random_pair_jaccard_hist(SF)
        assert out["n_pairs"].sum() > 0
        for cols, n in collected:
            assert "minhash" not in cols and "text" not in cols, collected
            assert n <= 10_000, collected  # histogram partials only


class TestCLI:
    def test_energy_json(self, capsys):
        from hmse_ray.run import main

        assert main(["energy", "--size-gb", "75"]) == 0
        import json

        out = json.loads(capsys.readouterr().out.strip())
        assert out["total_wh"] > 0 and out["breakeven_cf"] > 1

    def test_cluster_command(self, ray_session, tmp_path, capsys):
        from hmse_ray.run import main
        from hmse_ray.sources import fixtures

        images, _, _ = fixtures.generate_images(30, seed=11)
        fixtures.write_sharded(images, str(tmp_path / "in"), shards=2)
        out = str(tmp_path / "clusters")
        assert main(["cluster", "--input", str(tmp_path / "in"), "--output", out]) == 0
        import json

        import pyarrow.parquet as pq

        res = json.loads(capsys.readouterr().out.strip())
        assert res["rows"] == 30
        t = pq.read_table(out)
        assert sorted(t.column_names) == ["cluster_id", "image_id"]
        assert t.num_rows == 30

    def test_substring_command(self, ray_session, tmp_path, capsys):
        import json

        import pyarrow.parquet as pq

        from hmse_ray.run import main

        out = str(tmp_path / "pairs")
        rc = main(
            [
                "substring",
                "--input", os.path.join(SF, "documents.parquet"),
                "--output", out,
            ]
        )
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip())
        assert res["rows"] == 28  # sf0.001 strict containment pairs
        t = pq.read_table(out)
        assert sorted(t.column_names) == [
            "id_sub", "id_sup", "len_sub", "len_sup",
        ]
        assert t.num_rows == 28

    def test_ingest_command_round_trip(self, ray_session, tmp_path, capsys):
        """build-from -> ingest (semijoin) -> updated index -> second
        ingest resolves against first ingest's canonicals."""
        import json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from hmse_ray.run import main

        def write(path, rows):
            ids, texts = zip(*rows)
            pq.write_table(pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }), path)

        base_p = str(tmp_path / "base.parquet")
        d1_p = str(tmp_path / "d1.parquet")
        d2_p = str(tmp_path / "d2.parquet")
        write(base_p, [(1, "alpha"), (2, "beta")])
        write(d1_p, [(20, "gamma"), (21, "gamma"), (22, "alpha")])
        write(d2_p, [(5, "gamma"), (6, "nu")])

        idx0 = str(tmp_path / "idx0")
        assert main(["ingest", "--index", idx0,
                     "--build-from", base_p]) == 0
        assert json.loads(capsys.readouterr().out.strip())["entries"] == 2

        out1, idx1 = str(tmp_path / "a1"), str(tmp_path / "idx1")
        assert main(["ingest", "--index", idx0, "--delta", d1_p,
                     "--output", out1, "--updated-index", idx1,
                     "--semijoin"]) == 0
        r1 = json.loads(capsys.readouterr().out.strip())
        assert r1["rows"] == 3 and r1["new_canonicals"] == 1

        out2 = str(tmp_path / "a2")
        assert main(["ingest", "--index", idx1, "--delta", d2_p,
                     "--output", out2]) == 0
        a2 = pq.read_table(out2).to_pandas().set_index("doc_id")
        # gamma's canonical was elected in ingest 1 (doc 20)
        assert a2.loc[5, "canonical_id"] == 20 and a2.loc[5, "is_new"] == 0
        assert a2.loc[6, "is_new"] == 1

    def test_ingest_build_from_conflict_errors(self, ray_session, tmp_path):
        """ADVICE r4: --build-from combined with --delta/--output must
        refuse instead of silently ignoring the ingest half."""
        import pytest

        from hmse_ray.run import main

        with pytest.raises(SystemExit):
            main(["ingest", "--index", str(tmp_path / "i"),
                  "--build-from", "x.parquet", "--delta", "y.parquet"])

    def test_ingest_neardup_round_trip(self, ray_session, tmp_path, capsys):
        """--neardup: build band index -> semijoin near-dup ingest ->
        updated index -> second ingest resolves against the first
        ingest's inserted canonical (online L4 semantics via CLI)."""
        import json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from hmse_ray.run import main

        def long(tag):
            return " ".join(
                f"{tag}{i} tok{(i * 7 + len(tag)) % 23}" for i in range(40))

        def write(path, rows):
            ids, texts = zip(*rows)
            pq.write_table(pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }), path)

        base_p = str(tmp_path / "base.parquet")
        d1_p = str(tmp_path / "d1.parquet")
        d2_p = str(tmp_path / "d2.parquet")
        write(base_p, [(1, long("alpha")), (2, long("beta"))])
        write(d1_p, [(20, long("gamma")), (21, long("beta") + " qq")])
        write(d2_p, [(30, long("gamma") + " qq"), (31, long("nu"))])

        idx0 = str(tmp_path / "ndidx0")
        assert main(["ingest", "--neardup", "--index", idx0,
                     "--build-from", base_p]) == 0
        assert json.loads(capsys.readouterr().out.strip())["entries"] == 2

        out1, idx1 = str(tmp_path / "n1"), str(tmp_path / "ndidx1")
        assert main(["ingest", "--neardup", "--semijoin", "--index", idx0,
                     "--delta", d1_p, "--output", out1,
                     "--updated-index", idx1]) == 0
        r1 = json.loads(capsys.readouterr().out.strip())
        assert r1["rows"] == 2 and r1["new_canonicals"] == 1  # 20 new, 21 hit

        out2 = str(tmp_path / "n2")
        assert main(["ingest", "--neardup", "--index", idx1,
                     "--delta", d2_p, "--output", out2]) == 0
        a2 = pq.read_table(out2).to_pandas().set_index("doc_id")
        # 30 is a near-dup of doc 20, inserted by ingest 1
        assert a2.loc[30, "canonical_id"] == 20 and a2.loc[30, "is_new"] == 0
        assert a2.loc[31, "is_new"] == 1


class TestCheckpointMarkers:
    def test_phase2_ignores_uncommitted_dirs(self, ray_session, tmp_path):
        from hmse_ray.config import DEFAULT_CONFIG as CFG
        from hmse_ray.sources import fixtures
        from hmse_ray.state import checkpoint

        images, _, _ = fixtures.generate_images(40, seed=3)
        files = fixtures.write_sharded(images, str(tmp_path / "s"), shards=3)
        import pyarrow.parquet as pq

        out = str(tmp_path / "run")
        checkpoint.run_resumable(files, out, CFG, num_partitions=2)

        def clusters():
            return (
                pq.read_table(os.path.join(out, "final", "clusters"))
                .to_pandas()
                .sort_values("image_id")
                .reset_index(drop=True)
            )

        before = clusters()
        # plant a leftover .tmp dir and a marker-less partial partition:
        # phase 2 must ignore both
        p1 = os.path.join(out, "phase1")
        os.makedirs(os.path.join(p1, "part=9.tmp", "minhash"), exist_ok=True)
        os.makedirs(os.path.join(p1, "part=8", "minhash"), exist_ok=True)
        stats = checkpoint.run_phase2(out, CFG)
        assert stats["n_total"] > 0
        assert clusters().equals(before)


class TestSubstringDups:
    def test_matches_bruteforce_containment(self, ray_session):
        """substring_dup_pairs == the exact position() cross join at
        sf0.001 (winnowing recall guarantee holds: min doc len 47 >=
        23 = k + window - 1)."""
        import pyarrow.parquet as pq

        from hmse_ray.pipelines.queries import substring_dup_pairs

        df = substring_dup_pairs(SF).to_pandas()
        docs = pq.read_table(
            os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
        ).to_pandas()
        txt = dict(zip(docs["doc_id"], docs["text"]))
        truth = set()
        items = list(txt.items())
        for a, ta in items:
            for b, tb in items:
                if len(ta) >= 23 and len(ta) < len(tb) and ta in tb:
                    truth.add((a, b))
        got = set(zip(df["id_sub"], df["id_sup"]))
        assert got == truth and len(truth) > 0
        for r in df.itertuples():
            assert r.len_sub == len(txt[r.id_sub])
            assert r.len_sup == len(txt[r.id_sup])

    def test_planted_containment_recall(self, ray_session):
        """Planted sub/sup rows (including multi-container subs and an
        equal-length non-pair) come back exactly — recall 1 at or above
        the winnowing guarantee length."""
        import ray.data as rd

        from hmse_ray.pipelines.queries import substring_dup_docs

        base = "the quick brown fox jumps over the lazy dog " * 4  # 180 chars
        rows = [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": "PREFIX " + base + " SUFFIX"},
            {"doc_id": 3, "text": "x" * 40 + base + "y" * 40},
            {"doc_id": 4, "text": base[: len(base) - 1] + "!"},  # same len, not contained
            {"doc_id": 5, "text": "completely unrelated content " * 8},
        ]
        df = substring_dup_docs(rd.from_items(rows)).to_pandas()
        got = set(zip(df["id_sub"], df["id_sup"]))  # generic path: string ids
        assert ("1", "2") in got and ("1", "3") in got
        assert all(p[0] != "4" and p[1] != "4" for p in got)
        assert all("5" not in p for p in got)


class TestSubstringDupsCap:
    def test_max_bucket_cap_keeps_longest_sups(self, ray_session):
        """The documented skew cap: over-cap fingerprint buckets keep
        only their LONGEST sup rows (containment targets are
        length-biased), so with max_bucket=1 the longest container
        survives while shorter ones may drop — and the default cap
        keeps both."""
        import ray.data as rd

        from hmse_ray.pipelines.queries import substring_dup_docs

        base = "the quick brown fox jumps over the lazy dog " * 4
        rows = [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": "PREFIX " + base + " SUFFIX"},
            {"doc_id": 3, "text": "x" * 40 + base + "y" * 40},
        ]
        full = substring_dup_docs(rd.from_items(rows)).to_pandas()
        assert {("1", "2"), ("1", "3")} <= set(zip(full["id_sub"], full["id_sup"]))
        capped = substring_dup_docs(rd.from_items(rows), max_bucket=1).to_pandas()
        got = set(zip(capped["id_sub"], capped["id_sup"]))
        assert ("1", "3") in got  # the longest container always survives


class TestSharedDictAccounting:
    def test_shared_dict_never_worse_sometimes_better(self, ray_session):
        """compress_record_dict falls back to per-record when the
        dictionary doesn't help, so per-source CF is >= the per-record
        CF everywhere, and strictly better where the sample catches
        cross-record redundancy."""
        from hmse_ray.pipelines.queries import (
            compression_accounting,
            compression_accounting_shared,
        )

        per = compression_accounting(SF).to_pandas().set_index("source")["cf"]
        sh = (
            compression_accounting_shared(SF)
            .to_pandas()
            .set_index("source")["cf"]
        )
        assert set(per.index) == set(sh.index)
        assert (sh[per.index] >= per - 1e-9).all()


class TestSubstringClusters:
    def test_clusters_match_bruteforce_cc(self, ray_session):
        """substring_doc_clusters == union-find over the exact
        containment cross join (min-string labels, singletons self)."""
        import pyarrow.parquet as pq

        from hmse_ray.pipelines.queries import substring_doc_clusters

        res = substring_doc_clusters(SF).to_pandas()
        docs = pq.read_table(
            os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
        ).to_pandas()
        txt = dict(zip(docs["doc_id"], docs["text"]))
        parent = {str(i): str(i) for i in txt}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        items = list(txt.items())
        for a, ta in items:
            for b, tb in items:
                if len(ta) >= 23 and len(ta) < len(tb) and ta in tb:
                    ra, rb = find(str(a)), find(str(b))
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        want = {str(i): min(
            (m for m in parent if find(m) == find(str(i))), key=str
        ) for i in txt}
        got = dict(zip(res["image_id"], res["cluster_id"]))
        assert got == want
        assert len(res) == len(txt)


class TestCorpusFileSource:
    def test_file_chunks_match_tabular(self, ray_session):
        """The raw-file corpus source (read_binary_files over per-source
        derived text files) produces exactly the tabular
        cdc_source_chunks cuts — same streams, same gear hashes."""
        from hmse_ray.pipelines.queries import cdc_source_chunks, corpus_file_chunks

        cols = ["source", "chunk_idx", "chunk_len", "sha"]
        a = (
            corpus_file_chunks(SF).to_pandas()[cols]
            .sort_values(cols).reset_index(drop=True)
        )
        b = (
            cdc_source_chunks(SF).to_pandas()[cols]
            .sort_values(cols).reset_index(drop=True)
        )
        assert len(a) == len(b) > 0
        assert a.equals(b)


class TestWindowedChunkEmbed:
    def test_matches_duckdb_oracle(self, ray_session):
        import duckdb

        from hmse_ray.pipelines.queries import ORACLES, windowed_chunk_embed

        cols = ["doc_id", "win_idx", "tok_lo", "n_tok",
                "emb_qsum", "emb_qnorm"]
        got = (windowed_chunk_embed(SF).to_pandas()[cols]
               .sort_values(["doc_id", "win_idx"]).reset_index(drop=True))
        con = duckdb.connect()
        for t in ("documents", "embeddings"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{SF}/{t}.parquet')")
        want = (con.execute(ORACLES["windowed_chunk_embed"]).df()[cols]
                .sort_values(["doc_id", "win_idx"]).reset_index(drop=True)
                .astype("int64"))
        assert got.equals(want)

    def test_window_geometry(self, ray_session):
        from hmse_ray.pipelines.queries import windowed_chunk_embed

        df = windowed_chunk_embed(SF, win=8, stride=4).to_pandas()
        assert (df["tok_lo"] == df["win_idx"] * 4).all()
        assert (df["n_tok"] >= 1).all() and (df["n_tok"] <= 8).all()
        # every window of a doc carries the same embedding summary
        assert (df.groupby("doc_id")["emb_qsum"].nunique() == 1).all()
