"""Unit tests for text-analysis kernels (no Ray)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hmse_ray.functions import textstats


class TestTokens:
    def test_ws_tokens(self):
        s = pd.Series(["a b  c", "  x ", "", None, "one"])
        assert textstats.ws_token_counts(s).tolist() == [3, 1, 0, 0, 1]

    def test_re_tokens(self):
        s = pd.Series(["abc 123 x!y", ""])
        # abc / 123 / x / ! / y
        assert textstats.re_token_counts(s).tolist() == [5, 0]


class TestCharClasses:
    def test_counts(self):
        c = textstats.char_class_counts(pd.Series(["Ab1 ,x"]))
        assert c["n_chars"][0] == 6
        assert c["n_digits"][0] == 1
        assert c["n_spaces"][0] == 1
        assert c["n_alpha"][0] == 3
        assert c["n_punct"][0] == 1


class TestLangId:
    def test_english_detected(self):
        langs, conf = textstats.lang_scores(
            pd.Series(["the cat and the dog of a house is that it for"])
        )
        assert langs[0] == "en"
        assert conf[0] > 0.5

    def test_unknown(self):
        langs, conf = textstats.lang_scores(pd.Series(["zzz qqq www"]))
        assert langs[0] == "und"


class TestQuality:
    def test_ranges_and_ordering(self):
        good = "the quick brown fox jumps over the lazy dog and it is a fine day for all of us " * 4
        bad = "!!! ### $$$ %%% ^^^ &&& *** ((( )))"
        q = textstats.quality_scores(pd.Series([good, bad]))
        assert 0 <= q[1] < q[0] <= 1


class TestFingerprints:
    def test_degenerate_winnow_k_rejected(self):
        """k < 4 hashed every gram to 0 (all docs fingerprint to {0} ->
        all-pairs candidates); non-multiples of 4 silently dropped the
        trailing bytes of every gram. Both now raise."""
        import pytest

        for bad in (0, 3, 5, 7):
            with pytest.raises(ValueError, match="multiple of 4"):
                textstats.winnow_fingerprints("hello world text", k=bad)

    def test_char_ngram_n_guard(self):
        import pytest

        with pytest.raises(NotImplementedError):
            textstats.char_ngram_set("abcdef", n=5)

    def test_deterministic_and_shift_stable(self):
        a = "the quick brown fox jumps over the lazy dog " * 30
        b = "PREFIX " + a
        fa = textstats.winnow_fingerprints(a)
        fb = textstats.winnow_fingerprints(b)
        inter = np.intersect1d(fa, fb).size
        # winnowing keeps most fingerprints stable under a prefix shift
        assert inter / fa.size > 0.9
        assert textstats.doc_fingerprint64(a) == textstats.doc_fingerprint64(a)

    def test_distinct_docs_differ(self):
        assert textstats.doc_fingerprint64("aaa bbb ccc " * 20) != textstats.doc_fingerprint64(
            "xxx yyy zzz " * 20
        )


class TestTextSimHash:
    def test_near_vs_far(self):
        # realistic vocab size: ~80 distinct tokens; one token edited
        rng = np.random.default_rng(3)
        vocab = [f"tok{i}{chr(97 + i % 26)}" for i in range(80)]
        base = " ".join(vocab * 3)
        near = base.replace("tok7h ", "tok7hX ", 2)
        far = " ".join(f"other{i}" for i in range(80)) * 3
        h = lambda t: textstats.simhash64_text(t)
        d_near = bin(h(base) ^ h(near)).count("1")
        d_far = bin((h(base) ^ h(far)) & ((1 << 64) - 1)).count("1")
        assert d_near < d_far
        assert d_near <= 12
        assert d_far > 16

    def test_empty(self):
        assert textstats.simhash64_text("") == 0


class TestNgramJaccard:
    def test_identity_and_bounds(self):
        a = "the quick brown fox"
        assert textstats.ngram_jaccard(a, a) == 1.0
        assert 0.0 <= textstats.ngram_jaccard(a, "totally different words") < 0.3


class TestTfidfTopTerms:
    SF = "/root/testdata/sf0.001"

    def test_matches_duckdb_oracle(self, ray_session):
        import duckdb

        from hmse_ray.pipelines.queries import ORACLES, tfidf_top_terms

        cols = ["source", "term", "tf", "df", "score_r", "sel_rank"]
        got = (tfidf_top_terms(self.SF).to_pandas()[cols]
               .sort_values(["source", "sel_rank"]).reset_index(drop=True))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{self.SF}/documents.parquet')")
        want = (con.execute(ORACLES["tfidf_top_terms"]).df()[cols]
                .sort_values(["source", "sel_rank"]).reset_index(drop=True))
        assert got["term"].tolist() == want["term"].tolist()
        assert (got["score_r"].to_numpy() == want["score_r"].to_numpy()).all()
        assert (got["tf"].to_numpy() == want["tf"].to_numpy()).all()

    def test_shape_and_ranking(self, ray_session):
        from hmse_ray.pipelines.queries import tfidf_top_terms

        df = tfidf_top_terms(self.SF, k=3).to_pandas()
        g = df.groupby("source")
        assert (g.size() <= 3).all()
        for _, grp in g:
            s = grp.sort_values("sel_rank")
            # scores non-increasing with rank within a source
            assert (s["score_r"].diff().dropna() <= 1e-12).all()

    def test_blocking_invariance(self, ray_session, monkeypatch):
        """VERDICT r4 item 4: the post-merge per-partition top-k
        combiner must be invariant to input blocking (the combiner runs
        after df is global, so no block layout can evict a true top-k
        term)."""
        import hmse_ray.pipelines.queries as q

        cols = ["source", "term", "tf", "df", "score_r", "sel_rank"]
        base = (q.tfidf_top_terms(self.SF).to_pandas()[cols]
                .sort_values(["source", "sel_rank"]).reset_index(drop=True))
        orig = q._docs

        def reblocked(sf_dir, columns=None):
            return orig(sf_dir, columns).repartition(7)

        monkeypatch.setattr(q, "_docs", reblocked)
        alt = (q.tfidf_top_terms(self.SF).to_pandas()[cols]
               .sort_values(["source", "sel_rank"]).reset_index(drop=True))
        assert base["term"].tolist() == alt["term"].tolist()
        assert (base[["tf", "df", "sel_rank"]].values
                == alt[["tf", "df", "sel_rank"]].values).all()
        assert (base["score_r"].to_numpy() == alt["score_r"].to_numpy()).all()
