"""Decontamination + stratified sampling query tests (data-mixing ops)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hmse_ray.functions import murmur3
from hmse_ray.pipelines import queries

SF = "/root/testdata/sf0.001"


class TestDecontaminate:
    def test_known_containment_flagged(self, ray_session):
        out = queries.decontaminate_docs(SF).to_pandas()
        # benchmark docs never appear in the output
        assert not (out.doc_id % 50 == 7).any()
        # natural contamination measured in testdata: n=4 flags a stable
        # nonzero subset; contaminated <=> n_hits > 0
        assert out.contaminated.sum() > 0
        assert ((out.n_hits > 0) == (out.contaminated == 1)).all()

    def test_matches_python_reference(self, ray_session):
        import pyarrow.parquet as pq

        out = queries.decontaminate_docs(SF).to_pandas().set_index("doc_id")
        t = pq.read_table(SF + "/documents.parquet",
                          columns=["doc_id", "text"])
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()

        def grams(tx, n=4):
            tk = tx.split()
            return {" ".join(tk[i:i + n]) for i in range(len(tk) - n + 1)}

        bench = set().union(
            *[grams(tx) for d, tx in zip(ids, texts) if d % 50 == 7])
        for d, tx in zip(ids, texts):
            if d % 50 == 7:
                continue
            assert out.loc[d, "n_hits"] == len(grams(tx) & bench)

    def test_copartition_path_bit_parity(self, ray_session):
        """VERDICT r4 item 3: the large-benchmark co-partition-on-gram
        path (forced via broadcast_limit=0) must match the broadcast
        path row for row."""
        bc = (queries.decontaminate_docs(SF).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
        cp = (queries.decontaminate_docs(SF, broadcast_limit=0).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
        assert list(bc.columns) == list(cp.columns)
        assert (bc.values == cp[bc.columns].values).all()


class TestStratifiedSample:
    def test_ranks_complete_and_deterministic(self, ray_session):
        a = queries.stratified_sample_docs(SF).to_pandas()
        b = queries.stratified_sample_docs(SF).to_pandas()
        a = a.sort_values(["source", "sel_rank"]).reset_index(drop=True)
        b = b.sort_values(["source", "sel_rank"]).reset_index(drop=True)
        assert (a.values == b.values).all()
        # every source contributes exactly min(8, source size) ranks 1..k
        for _, g in a.groupby("source"):
            assert list(g.sel_rank) == list(range(1, len(g) + 1))
            assert len(g) <= 8

    def test_matches_murmur_rank_brute_force(self, ray_session):
        import pyarrow.parquet as pq

        out = queries.stratified_sample_docs(SF).to_pandas()
        t = pq.read_table(SF + "/documents.parquet",
                          columns=["doc_id", "source"])
        ids = np.asarray(t.column("doc_id").to_pylist(), dtype=np.int64)
        src = np.asarray(t.column("source").to_pylist(), dtype=object)
        hm = murmur3.murmur3_u32((ids % (1 << 32)).astype(np.uint32),
                                 queries._STRAT_SEED).astype(np.int64)
        for s in np.unique(src):
            m = src == s
            order = np.lexsort((ids[m], hm[m]))
            want = ids[m][order][:8]
            got = out[out.source == s].sort_values("sel_rank").doc_id.to_numpy()
            assert (got == want).all()

    def test_combiner_invariant_under_blocking(self, ray_session):
        import ray.data as rd

        # tiny synthetic corpus pushed through different block counts
        ids = np.arange(200, dtype=np.int64)
        srcs = np.array([f"s{i % 3}" for i in ids], dtype=object)
        tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                        "source": pa.array(srcs, pa.string())})
        import hmse_ray.pipelines.queries as q

        def run(nb):
            ds = rd.from_arrow(tbl).repartition(nb)
            orig = q._docs
            try:
                q._docs = lambda sf, columns=None: ds
                return (q.stratified_sample_docs("ignored", per_source=5)
                        .to_pandas()
                        .sort_values(["source", "sel_rank"])
                        .reset_index(drop=True))
            finally:
                q._docs = orig

        a, b = run(1), run(13)
        assert (a.values == b.values).all()
        assert len(a) == 15
