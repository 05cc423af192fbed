"""Statistical harness (A8) — numpy-only reimplementation of the
reference's pre-registered analysis plan (VALIDATION_METHODS.md:332-369,
538-566): summary stats, seeded bootstrap CIs, Welch's t-test with a
normal-approximation p-value, Cohen's d. scipy is not available in this
container; the normal approximation is adequate at the reference's
n=30 trial counts.
"""

from __future__ import annotations

import math

import numpy as np


def summarize(x) -> dict:
    a = np.asarray(x, dtype=np.float64)
    return {
        "n": int(a.size),
        "mean": float(a.mean()),
        "median": float(np.median(a)),
        "std": float(a.std(ddof=1)) if a.size > 1 else 0.0,
        "min": float(a.min()),
        "max": float(a.max()),
    }


def bootstrap_ci(x, stat=np.mean, n_boot: int = 1000, alpha: float = 0.05,
                 seed: int = 42) -> tuple[float, float]:
    """Seeded percentile bootstrap CI (B=1000 per the reference plan)."""
    a = np.asarray(x, dtype=np.float64)
    rng = np.random.default_rng(seed)
    boots = np.array([stat(a[rng.integers(0, a.size, a.size)]) for _ in range(n_boot)])
    return (
        float(np.quantile(boots, alpha / 2)),
        float(np.quantile(boots, 1 - alpha / 2)),
    )


def _norm_sf(z: float) -> float:
    return 0.5 * math.erfc(z / math.sqrt(2.0))


def welch_t(x, y) -> dict:
    """Welch's unequal-variance t-test, two-sided normal-approx p."""
    a = np.asarray(x, dtype=np.float64)
    b = np.asarray(y, dtype=np.float64)
    va, vb = a.var(ddof=1) / a.size, b.var(ddof=1) / b.size
    t = (a.mean() - b.mean()) / math.sqrt(max(va + vb, 1e-300))
    df = (va + vb) ** 2 / max(
        va**2 / max(a.size - 1, 1) + vb**2 / max(b.size - 1, 1), 1e-300
    )
    p = 2 * _norm_sf(abs(t))
    return {"t": float(t), "df": float(df), "p_approx": float(p)}


def cohens_d(x, y) -> float:
    a = np.asarray(x, dtype=np.float64)
    b = np.asarray(y, dtype=np.float64)
    pooled = math.sqrt(
        ((a.size - 1) * a.var(ddof=1) + (b.size - 1) * b.var(ddof=1))
        / max(a.size + b.size - 2, 1)
    )
    return float((a.mean() - b.mean()) / max(pooled, 1e-300))
