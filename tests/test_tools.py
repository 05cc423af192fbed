"""Unit tests for the scalar utility models (A7 energy, A8 stats) and
the layer-ablation surface. No Ray session needed except the ablation
integration check."""

from __future__ import annotations

import numpy as np
import pytest

from hmse_ray.config import ABLATION_CONFIGS, DEFAULT_CONFIG as CFG
from hmse_ray.tools import energy_model, stats


class TestEnergyModel:
    def test_reference_scenario(self):
        # tools/README.md:83-86: 75 GB at 1 Mbps, CF 9.375 -> ROI ~40x,
        # break-even CF ~1.022
        be = energy_model.breakeven_cf(75, 1.0)
        assert be == pytest.approx(1.022, abs=0.005)
        r = energy_model.roi(75, 9.375, 1.0)
        assert r == pytest.approx(40.4, rel=0.05)

    def test_energy_monotone_in_cf(self):
        e2 = energy_model.energy(10, 2.0, 1.0)
        e4 = energy_model.energy(10, 4.0, 1.0)
        assert e4.total_wh < e2.total_wh
        assert e4.compression_wh == e2.compression_wh

    def test_never_breaks_even(self):
        # tiny corpus: compression energy exceeds entire transmission
        assert energy_model.breakeven_cf(0.001, 1000.0) == float("inf")


class TestStats:
    def test_summary(self):
        s = stats.summarize([1, 2, 3, 4, 5])
        assert s["mean"] == 3 and s["median"] == 3 and s["n"] == 5

    def test_bootstrap_ci_contains_mean(self):
        rng = np.random.default_rng(0)
        x = rng.normal(10, 2, 100)
        lo, hi = stats.bootstrap_ci(x, seed=7)
        assert lo < x.mean() < hi
        assert stats.bootstrap_ci(x, seed=7) == (lo, hi)  # seeded determinism

    def test_welch_t_detects_difference(self):
        rng = np.random.default_rng(1)
        a, b = rng.normal(0, 1, 50), rng.normal(2, 1, 50)
        r = stats.welch_t(a, b)
        assert r["p_approx"] < 0.001 and r["p"] < 0.001
        same = stats.welch_t(a, a)
        assert same["p_approx"] > 0.9
        assert abs(stats.cohens_d(a, b)) > 1.0

    def test_t_distribution_exact(self):
        # textbook values: P(T>2.042 | df=30) = 0.025; P(T>1 | df=1) = 0.25
        assert abs(stats._t_sf(2.042, 30) - 0.025) < 5e-4
        assert abs(stats._t_sf(1.0, 1) - 0.25) < 1e-9
        assert abs(stats.betainc_reg(2, 3, 0.5) - 0.6875) < 1e-9

    def test_shapiro_wilk_matches_exact_tables(self):
        # Royston's weights example; W by the original 1965 n=11
        # coefficient table is 0.7889 (hand-computable)
        r = stats.shapiro_wilk(
            [148, 154, 158, 160, 161, 162, 166, 170, 182, 195, 236]
        )
        assert abs(r["W"] - 0.7889) < 2e-3
        assert r["p"] < 0.05  # clearly non-normal (outlier 236)

    def test_shapiro_wilk_calibration(self):
        rng = np.random.default_rng(0)
        ps = np.array(
            [stats.shapiro_wilk(rng.standard_normal(30))["p"] for _ in range(200)]
        )
        # p approximately uniform under H0
        assert 0.01 < (ps < 0.05).mean() < 0.12
        pe = np.array(
            [stats.shapiro_wilk(rng.exponential(size=30))["p"] for _ in range(100)]
        )
        assert (pe < 0.01).mean() > 0.7  # skewed data rejected


class TestAblations:
    def test_layer_subsets_produce_expected_outputs(self, ray_session):
        from hmse_ray.pipelines import dedup
        from hmse_ray.sources import fixtures

        images, _, _ = fixtures.generate_images(40, seed=11)
        full = dedup.ablation_run(images, ABLATION_CONFIGS["full"])
        assert set(full) == {"l1_accounting", "chunk_index", "dedup_stats", "clusters"}
        l1 = dedup.ablation_run(images, ABLATION_CONFIGS["l1_only"])
        assert set(l1) == {"l1_accounting"}
        acc = l1["l1_accounting"]
        assert acc["bytes_out"] < acc["bytes_in"]
        no_l4 = dedup.ablation_run(images, ABLATION_CONFIGS["l1_l2_l3"])
        assert "clusters" not in no_l4 and "chunk_index" in no_l4
        l4_only = dedup.ablation_run(images, ABLATION_CONFIGS["l4_only"])
        assert set(l4_only) == {"chunks", "clusters"}

    def test_degraded_whole_record_dedup(self, ray_session):
        import pyarrow as pa

        from hmse_ray.pipelines import dedup

        t = pa.table(
            {
                "image_id": ["a", "b", "c"],
                "caption": ["same same " * 200, "same same " * 200, "diff " * 300],
            }
        )
        cfg = CFG.with_overrides(enable_l2=False)
        out = dedup.ablation_run(t, cfg)
        idx = out["chunk_index"].to_pandas()
        assert len(idx) == 2  # whole-record hashing: 2 distinct records
        assert idx.refcount.max() == 2
