"""Round-3 doc_clusters rework (VERDICT r2 item 2): LSH-edge clustering
with shuffle-join exact verification.

Two pins:
  1. recall — on the driver corpus the LSH(16x8)+exact-verify edge set
     EQUALS the guaranteed-recall prefix-filter exact join at the same
     threshold (so the semantics change loses nothing at test scale);
  2. scale shape — LSH candidate count grows ~linearly on a 10x
     synthetic corpus where the exact join's prefix filter is quadratic
     by construction (shared low-similarity background + planted dups).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

SF = "/root/testdata/sf0.001"


def _edge_set(ds) -> set[tuple[int, int]]:
    df = ds.to_pandas()
    return {
        (min(int(a), int(b)), max(int(a), int(b)))
        for a, b in zip(df["id_a"], df["id_b"])
    }


def _lsh_exact_edges(docs, threshold):
    """doc_clusters' edge pipeline: TEXT_CFG banding -> shuffle-join
    exact verification."""
    from hmse_ray.pipelines.queries import TEXT_CFG, exact_verify_edges
    from hmse_ray.stages import lsh, signatures

    as_caps = docs.map_batches(
        lambda t: pa.table(
            {"image_id": pc.cast(t["doc_id"], pa.string()), "caption": t["text"]}
        ),
        batch_format="pyarrow",
    )
    signed = signatures.minhash_stage(as_caps, TEXT_CFG).materialize()
    cand = lsh.candidate_edges(signed, TEXT_CFG, edge_shape="all")
    return exact_verify_edges(docs, cand, threshold)


class TestDocClustersLshRecall:
    def test_lsh_edges_match_exact_join(self, ray_session):
        """Pinned recall = 1.0 at threshold 0.8 on the driver corpus:
        the LSH+exact-verify edges equal the prefix-filter exact join
        (guaranteed recall) edge-for-edge."""
        import ray.data as rd

        from hmse_ray.pipelines.queries import _docs, exact_jaccard_pairs

        docs = _docs(SF, ["doc_id", "text"]).materialize()
        exact = _edge_set(exact_jaccard_pairs(docs, 0.8))
        lsh_edges = _edge_set(_lsh_exact_edges(docs, 0.8))
        assert lsh_edges == exact, (
            f"missed {sorted(exact - lsh_edges)[:10]}, "
            f"spurious {sorted(lsh_edges - exact)[:10]}"
        )
        assert len(exact) > 0  # non-vacuous


def _synth_docs(n: int, seed: int = 7):
    """Deterministic corpus: low background similarity (random 30-word
    texts over a 4000-word vocab) + ~4% planted near-dup pairs (one
    word substituted). The regime where LSH candidates are ~linear but
    any all-pairs-shaped join is quadratic."""
    import ray.data as rd

    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:04d}" for i in range(4000)])
    texts = [
        " ".join(rng.choice(vocab, size=30, replace=False)) for _ in range(n)
    ]
    # plant near-dups: doc i copies doc i-1 with one word changed
    for i in range(1, n, 25):
        words = texts[i - 1].split()
        words[int(rng.integers(len(words)))] = str(vocab[int(rng.integers(4000))])
        texts[i] = " ".join(words)
    return rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})
    )


class TestCandidateScaleShape:
    def test_lsh_candidates_grow_linearly(self, ray_session):
        """VERDICT r2 item 2 'done' criterion: candidate count at 10x
        corpus size grows far closer to linear (10x) than quadratic
        (100x)."""
        from hmse_ray.pipelines.queries import exact_verify_edges
        from hmse_ray.stages import lsh, signatures
        from hmse_ray.pipelines.queries import TEXT_CFG

        counts = {}
        for n in (300, 3000):
            docs = _synth_docs(n).materialize()
            as_caps = docs.map_batches(
                lambda t: pa.table(
                    {
                        "image_id": pc.cast(t["doc_id"], pa.string()),
                        "caption": t["text"],
                    }
                ),
                batch_format="pyarrow",
            )
            signed = signatures.minhash_stage(as_caps, TEXT_CFG).materialize()
            cand = lsh.candidate_edges(signed, TEXT_CFG, edge_shape="all")
            # threshold 0 keeps every DEDUPED candidate pair -> the count
            counts[n] = exact_verify_edges(docs, cand, 0.0).count()
        ratio = counts[3000] / max(1, counts[300])
        assert counts[300] >= 6  # planted dups found at the small size
        assert ratio < 30, f"candidates {counts} grew {ratio:.1f}x on 10x docs"

    def test_planted_dups_recovered(self, ray_session):
        """The planted one-word-substitution pairs verify at j >= 0.8."""
        docs = _synth_docs(600).materialize()
        edges = _edge_set(_lsh_exact_edges(docs, 0.8))
        planted = {(i - 1, i) for i in range(1, 600, 25)}
        assert planted <= edges, sorted(planted - edges)[:5]


def _hot_bucket_fixture(tmp_path) -> str:
    """Planted hot-bucket corpus written as <dir>/documents.parquet:

    - a 40-doc near-identical family (one template, tiny suffix edits,
      j >= 0.95 pairwise) — its band buckets hold all 40 docs, so any
      uniform salting splits them into sub-buckets (the orphan-risk
      shape a salted rep chain must not break apart);
    - a 3-doc similarity CHAIN A~B~C with j(A,B), j(B,C) >= 0.8 but
      j(A,C) < 0.8 — connectivity must come from verified edges, not
      from any single rep;
    - distinct background docs."""
    import pyarrow.parquet as pq

    base = " ".join(f"hot{i:03d} item{(i * 5) % 17}" for i in range(36))
    texts = [base + f" v{j:02d}" for j in range(40)]           # hot family
    chain = " ".join(f"ch{i:03d}" for i in range(50))
    # measured byte-4-gram jaccards: j(A,B)=0.832, j(B,C)=0.831,
    # j(A,C)=0.692 — adjacent >= 0.8, endpoints < 0.8
    pad1 = " " + " ".join(f"p1x{i}" for i in range(8))
    pad2 = " " + " ".join(f"p2y{i}" for i in range(10))
    texts += [chain, chain + pad1, chain + pad1 + pad2]        # A, B, C
    texts += [" ".join(f"bg{k}t{i}a{(i * 3 + k) % 13}" for i in range(40))
              for k in range(10)]                              # background
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    d = str(tmp_path / "hotsf")
    import os

    os.makedirs(d, exist_ok=True)
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    return d


class TestDocClustersSalted:
    """VERDICT r4 item 6: doc_clusters with forced salting must equal
    the unsalted path — and the unsalted DuckDB oracle — exactly."""

    def test_salted_matches_oracle_on_hot_bucket_fixture(
            self, ray_session, tmp_path):
        import duckdb

        from hmse_ray.pipelines.queries import ORACLES, doc_clusters

        d = _hot_bucket_fixture(tmp_path)
        got = (doc_clusters(d, num_salts=4).to_pandas()
               .sort_values("image_id").reset_index(drop=True))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')")
        want = (con.execute(ORACLES["doc_clusters"]).df()
                .sort_values("image_id").reset_index(drop=True))
        assert got["image_id"].tolist() == want["image_id"].tolist()
        assert got["cluster_id"].tolist() == want["cluster_id"].tolist()
        # non-vacuous: the hot family is one cluster, the chain another
        labels = got.set_index("image_id")["cluster_id"]
        fam = {labels[str(i)] for i in range(40)}
        assert len(fam) == 1
        ch = {labels[str(i)] for i in (40, 41, 42)}
        assert len(ch) == 1 and ch != fam

    def test_salted_matches_unsalted_nonpow2(self, ray_session, tmp_path):
        from hmse_ray.pipelines.queries import doc_clusters

        d = _hot_bucket_fixture(tmp_path)
        uns = (doc_clusters(d).to_pandas()
               .sort_values("image_id").reset_index(drop=True))
        s3 = (doc_clusters(d, num_salts=3).to_pandas()
              .sort_values("image_id").reset_index(drop=True))
        assert (uns.values == s3[uns.columns].values).all()
