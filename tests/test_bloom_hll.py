"""Bloom filter (functions/bloom.py) and HyperLogLog (functions/hll.py)
unit tests — pure numpy, no Ray needed except the end-to-end query
parity checks."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from hmse_ray.functions.bloom import Bloom, hex_words, int_words
from hmse_ray.functions.hll import estimate, registers64

SF = "/root/testdata/sf0.001"


def _shas(keys):
    return [hashlib.sha256(str(k).encode()).hexdigest() for k in keys]


class TestHexWords:
    def test_matches_int_parse(self):
        hs = _shas(range(200))
        w0, w1 = hex_words(hs)
        for s, a, b in zip(hs, w0, w1):
            assert int(s[:8], 16) == a
            assert int(s[8:16], 16) == b

    def test_uppercase_and_empty(self):
        w0, _ = hex_words(["ABCDEF0012345678" + "0" * 48])
        assert w0[0] == int("abcdef00", 16)
        w0, w1 = hex_words([])
        assert w0.size == 0 and w1.size == 0


class TestBloom:
    def test_sub_word_m_bits_rejected(self):
        """m_bits < 64 allocated a zero-length word array and every
        probe IndexError'd; the constructor must refuse it loudly."""
        import pytest

        with pytest.raises(AssertionError, match="64"):
            Bloom(32, k=3)

    def test_no_false_negatives(self):
        added = _shas(range(0, 3000, 3))
        b = Bloom(1 << 16, k=5).add_many(added)
        assert b.contains_many(added).all()

    def test_fpp_bounded(self):
        added = _shas(range(1000))
        b = Bloom(1 << 16, k=5).add_many(added)
        probe = _shas(range(100000, 110000))
        fpp = b.contains_many(probe).mean()
        # theoretical fpp for n=1000, m=65536, k=5 is ~2e-5
        assert fpp < 0.005, fpp

    def test_union_is_or(self):
        a_keys, b_keys = _shas(range(100)), _shas(range(100, 200))
        u = Bloom(1 << 12).add_many(a_keys).union(
            Bloom(1 << 12).add_many(b_keys))
        assert u.contains_many(a_keys + b_keys).all()

    def test_int_words_avalanche_and_determinism(self):
        keys = np.arange(-500, 500, dtype=np.int64)  # structured input
        w0, w1 = int_words(keys)
        x0, x1 = int_words(keys.copy())
        assert (w0 == x0).all() and (w1 == x1).all()
        # fmix64 avalanches sequential ints: words look uniform (no
        # duplicate (w0,w1) pairs, both halves well spread)
        assert len(set(zip(w0.tolist(), w1.tolist()))) == len(keys)
        assert len(np.unique(w0 >> np.uint64(24))) > 200
        z0, z1 = int_words(np.array([], np.int64))
        assert z0.size == 0 and z1.size == 0

    def test_i64_no_false_negatives_and_fpp(self):
        added = np.arange(0, 30000, 3, dtype=np.int64) * 7919 - 11
        b = Bloom(1 << 18, k=5).add_many_i64(added)
        assert b.contains_many_i64(added).all()
        probe = np.arange(1_000_000, 1_010_000, dtype=np.int64)
        fpp = b.contains_many_i64(probe).mean()
        assert fpp < 0.02, fpp

    def test_deterministic(self):
        keys = _shas(range(500))
        a = Bloom(1 << 14, k=3).add_many(keys)
        b = Bloom(1 << 14, k=3).add_many(keys[::-1])
        assert (a.bits == b.bits).all()


def _rho_scalar(h64: int, p: int) -> int:
    w = h64 & ((1 << (64 - p)) - 1)
    return (64 - p) + 1 - w.bit_length()


class TestHLLKernel:
    def test_registers_match_scalar_reference(self):
        hs = _shas(range(500))
        for p in (12, 14):
            j, rho = registers64(hs, p)
            for s, jj, rr in zip(hs[:50], j[:50], rho[:50]):
                h64 = int(s[:16], 16)
                assert jj == h64 >> (64 - p)
                assert rr == _rho_scalar(h64, p)

    def test_p_floor_enforced(self):
        # p < 12 would overflow float64 exactness for the rho word
        import pytest

        with pytest.raises(ValueError):
            registers64(_shas(range(4)), 8)

    def test_rho_zero_word(self):
        # craft a hex whose low (64-p) bits are zero: rho = max
        p = 12
        hx = format(0xABC << 52, "016x") + "0" * 48
        _, rho = registers64([hx], p)
        assert rho[0] == (64 - p) + 1

    def test_estimate_accuracy(self):
        # HLL standard error is ~1.04/sqrt(m); with m=4096 that is
        # ~1.6% — allow 5% on a single draw
        for n in (1000, 20000):
            hs = _shas(range(n))
            j, rho = registers64(hs, 12)
            mx = pd.DataFrame({"j": j, "r": rho}).groupby("j")["r"].max()
            est, zeros = estimate(mx.to_numpy(), 12)
            assert abs(est / n - 1) < 0.05, (n, est)

    def test_merge_associativity(self):
        # register-max merge of two halves == registers of the union
        hs = _shas(range(4000))
        j, r = registers64(hs, 12)
        half = len(hs) // 2
        a = pd.DataFrame({"j": j[:half], "r": r[:half]}).groupby("j")["r"].max()
        b = pd.DataFrame({"j": j[half:], "r": r[half:]}).groupby("j")["r"].max()
        merged = pd.concat([a, b]).groupby(level=0).max()
        whole = pd.DataFrame({"j": j, "r": r}).groupby("j")["r"].max()
        assert merged.equals(whole)


class TestHLLQuery:
    def test_matches_duckdb_oracle_bitwise(self, ray_session):
        import duckdb

        from hmse_ray.pipelines.queries import ORACLES, hll_distinct_docs

        got = (hll_distinct_docs(SF).to_pandas()
               .sort_values("source").reset_index(drop=True))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
        want = (con.execute(ORACLES["hll_distinct_docs"]).df()
                .sort_values("source").reset_index(drop=True))
        assert (got["est_distinct_r"].to_numpy()
                == want["est_distinct_r"].to_numpy()).all()
        assert (got["zero_registers"].to_numpy()
                == want["zero_registers"].to_numpy()).all()

    def test_estimate_tracks_exact_distinct(self, ray_session):
        import duckdb

        from hmse_ray.pipelines.queries import hll_distinct_docs

        got = hll_distinct_docs(SF).to_pandas().sort_values("source")
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
        exact = con.execute(
            "SELECT source, COUNT(DISTINCT text) c FROM documents "
            "GROUP BY 1 ORDER BY 1").df()
        rel = np.abs(got["est_distinct_r"].to_numpy()
                     / exact["c"].to_numpy() - 1)
        assert rel.max() < 0.08, rel.max()
