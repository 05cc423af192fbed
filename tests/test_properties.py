"""Property-based tests (hypothesis) for the pure kernels added in
round 4: suffix array, JFIF codec, delta SA encoder, winnowing
containment. No Ray needed."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hmse_ray.functions import delta, jpegcodec, suffixarray
from hmse_ray.functions.imagecodec import psnr
from hmse_ray.functions.textstats import winnow_fingerprints

# small alphabets maximize repeated-substring edge cases
_small_bytes = st.binary(min_size=0, max_size=400).map(
    lambda b: bytes(x % 5 for x in b)
)


class TestSuffixArrayProperties:
    @settings(max_examples=60, deadline=None)
    @given(_small_bytes)
    def test_build_is_a_suffix_permutation(self, data):
        sa = suffixarray.build(data)
        n = len(data)
        assert sorted(sa.tolist()) == list(range(n))
        # adjacent suffixes are nondecreasing
        for a, b in zip(sa, sa[1:]):
            assert data[a:] <= data[b:]

    @settings(max_examples=60, deadline=None)
    @given(_small_bytes, st.binary(min_size=1, max_size=24).map(
        lambda b: bytes(x % 5 for x in b)))
    def test_find_agrees_with_in(self, hay, needle):
        sa = suffixarray.build(hay)
        pos = suffixarray.find(hay, sa, needle)
        if needle in hay:
            assert pos >= 0 and hay[pos : pos + len(needle)] == needle
        else:
            assert pos == -1

    @settings(max_examples=40, deadline=None)
    @given(_small_bytes, _small_bytes)
    def test_longest_match_found_substring_is_real(self, base, target):
        if len(base) == 0 or len(target) == 0:
            return
        sa = suffixarray.build(base)
        pos, ln = suffixarray.longest_match(base, sa, target, 0)
        if ln:
            assert base[pos : pos + ln] == target[:ln]
        # no strictly longer prefix exists anywhere in base
        if ln < len(target):
            assert target[: ln + 1] not in base


class TestDeltaSAProperties:
    @settings(max_examples=25, deadline=None)
    @given(st.binary(min_size=64, max_size=2000), st.binary(min_size=0, max_size=64),
           st.integers(0, 1999))
    def test_sa_ops_roundtrip(self, base, insert, cut):
        cut = min(cut, len(base))
        target = base[:cut] + insert + base[cut:]
        blob = delta._encode_ops_sa(base, target)
        if blob is not None:
            assert delta._apply_ops(base, blob) == target


class TestJfifProperties:
    @settings(max_examples=15, deadline=None)
    @given(st.integers(9, 40), st.integers(9, 40), st.integers(0, 2**32 - 1))
    def test_roundtrip_shape_and_error_bound(self, h, w, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        dec = jpegcodec.jfif_decode(jpegcodec.jfif_encode(px, 98))
        assert dec.shape == px.shape
        assert psnr(px, dec) >= 38.0  # q98 clears 40 on typical noise;
        # 38 leaves margin for tiny pathological tiles

    @settings(max_examples=10, deadline=None)
    @given(st.integers(8, 64), st.integers(8, 64), st.integers(0, 255))
    def test_flat_images_exact(self, h, w, v):
        px = np.full((h, w, 3), v, np.uint8)
        dec = jpegcodec.jfif_decode(jpegcodec.jfif_encode(px, 75))
        assert (dec == px).all()


class TestWinnowContainmentProperty:
    @settings(max_examples=40, deadline=None)
    @given(st.text(alphabet="abcdefgh ", min_size=23, max_size=120),
           st.text(alphabet="abcdefgh ", min_size=0, max_size=60),
           st.text(alphabet="abcdefgh ", min_size=0, max_size=60))
    def test_contained_doc_shares_all_fingerprints(self, sub, pre, suf):
        """The reduction substring_dup_docs relies on: every fingerprint
        winnowing selects in a contained text is also selected in the
        container (for len(sub) >= k + window - 1 = 23)."""
        sup = pre + sub + suf
        f_sub = set(winnow_fingerprints(sub).tolist())
        f_sup = set(winnow_fingerprints(sup).tolist())
        assert f_sub <= f_sup


class TestBloomHLLProperties:
    @given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=300),
           st.integers(1, 8))
    @settings(max_examples=30, deadline=None)
    def test_bloom_never_false_negative(self, keys, k):
        import hashlib

        from hmse_ray.functions.bloom import Bloom

        shas = [hashlib.sha256(str(x).encode()).hexdigest() for x in keys]
        b = Bloom(1 << 12, k=k).add_many(shas)
        assert b.contains_many(shas).all()

    @given(st.integers(0, 2**64 - 1), st.integers(12, 20))
    @settings(max_examples=200, deadline=None)
    def test_hll_register_matches_scalar(self, h64, p):
        from hmse_ray.functions.hll import registers64

        hx = format(h64, "016x") + "0" * 48
        j, rho = registers64([hx], p)
        w = h64 & ((1 << (64 - p)) - 1)
        assert j[0] == h64 >> (64 - p)
        assert rho[0] == (64 - p) + 1 - w.bit_length()
        assert 1 <= rho[0] <= (64 - p) + 1
