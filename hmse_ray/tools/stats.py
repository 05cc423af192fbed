"""Statistical harness (A8) — numpy-only reimplementation of the
reference's pre-registered analysis plan (VALIDATION_METHODS.md:332-369,
538-566): summary stats, seeded bootstrap CIs, Welch's t-test (exact
t-distribution p via a regularized-incomplete-beta continued fraction,
plus the normal approximation), Cohen's d, and the Shapiro-Wilk
normality test (Royston's AS R94 approximation, public algorithm —
scipy is not available in this container).
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


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the regularized incomplete beta
    (modified Lentz iteration on the standard even/odd coefficient
    recurrence)."""
    TINY, EPS = 1e-300, 1e-12
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c, d = 1.0, 1.0 - qab * x / qap
    if abs(d) < TINY:
        d = TINY
    d = 1.0 / d
    h = d
    for m in range(1, 300):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < TINY:
            d = TINY
        c = 1.0 + aa / c
        if abs(c) < TINY:
            c = TINY
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < TINY:
            d = TINY
        c = 1.0 + aa / c
        if abs(c) < TINY:
            c = TINY
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < EPS:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log1p(-x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def _t_sf(t: float, df: float) -> float:
    """One-sided survival P(T > t) of Student's t."""
    x = df / (df + t * t)
    p = 0.5 * betainc_reg(df / 2.0, 0.5, x)
    return p if t >= 0 else 1.0 - p


def welch_t(x, y) -> dict:
    """Welch's unequal-variance t-test; exact t-distribution p
    (regularized incomplete beta) + the normal approximation."""
    a = np.asarray(x, dtype=np.float64)
    b = np.asarray(y, dtype=np.float64)
    va, vb = a.var(ddof=1) / a.size, b.var(ddof=1) / b.size
    t = (a.mean() - b.mean()) / math.sqrt(max(va + vb, 1e-300))
    df = (va + vb) ** 2 / max(
        va**2 / max(a.size - 1, 1) + vb**2 / max(b.size - 1, 1), 1e-300
    )
    return {
        "t": float(t),
        "df": float(df),
        "p": float(2 * _t_sf(abs(t), df)),
        "p_approx": float(2 * _norm_sf(abs(t))),
    }


def _norm_ppf(p: float) -> float:
    """Inverse standard-normal CDF (Acklam's rational approximation,
    |rel err| < 1.2e-9 — public algorithm)."""
    if not 0.0 < p < 1.0:
        raise ValueError("p in (0,1) required")
    A = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
    B = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01]
    C = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
    D = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00]
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        return (((((C[0] * q + C[1]) * q + C[2]) * q + C[3]) * q + C[4]) * q + C[5]) / (
            (((D[0] * q + D[1]) * q + D[2]) * q + D[3]) * q + 1
        )
    if p > phigh:
        q = math.sqrt(-2 * math.log(1 - p))
        return -(((((C[0] * q + C[1]) * q + C[2]) * q + C[3]) * q + C[4]) * q + C[5]) / (
            (((D[0] * q + D[1]) * q + D[2]) * q + D[3]) * q + 1
        )
    q = p - 0.5
    r = q * q
    return (((((A[0] * r + A[1]) * r + A[2]) * r + A[3]) * r + A[4]) * r + A[5]) * q / (
        (((((B[0] * r + B[1]) * r + B[2]) * r + B[3]) * r + B[4]) * r + 1)
    )


def shapiro_wilk(x) -> dict:
    """Shapiro-Wilk normality test, Royston 1995 approximation (AS R94,
    public algorithm; 3 <= n <= 5000). Returns {"W", "p"}.

    Coefficients: Blom order-statistic scores m_i, a_n/a_{n-1}
    polynomial corrections in 1/sqrt(n), and the ln(1-W)
    normal-approximation moments in ln(n) (n >= 12) or n (n < 12),
    all from the published algorithm.
    """
    a = np.sort(np.asarray(x, dtype=np.float64))
    n = a.size
    if n < 3:
        raise ValueError("shapiro_wilk requires n >= 3")
    if n > 5000:
        raise ValueError("AS R94 approximation is validated for n <= 5000")
    if a[-1] == a[0]:
        return {"W": 1.0, "p": 1.0}
    m = np.array([_norm_ppf((i - 0.375) / (n + 0.25)) for i in range(1, n + 1)])
    mm = float(m @ m)
    u = 1.0 / math.sqrt(n)
    w = np.empty(n)
    cn = m[-1] / math.sqrt(mm)
    an = (-2.706056 * u**5 + 4.434685 * u**4 - 2.071190 * u**3
          - 0.147981 * u**2 + 0.221157 * u + cn)
    if n > 5:
        cn1 = m[-2] / math.sqrt(mm)
        an1 = (-3.582633 * u**5 + 5.682633 * u**4 - 1.752461 * u**3
               - 0.293762 * u**2 + 0.042981 * u + cn1)
        phi = (mm - 2 * m[-1] ** 2 - 2 * m[-2] ** 2) / (
            1 - 2 * an**2 - 2 * an1**2
        )
        w[2:-2] = m[2:-2] / math.sqrt(phi)
        w[-1], w[0] = an, -an
        w[-2], w[1] = an1, -an1
    else:
        phi = (mm - 2 * m[-1] ** 2) / (1 - 2 * an**2)
        w[1:-1] = m[1:-1] / math.sqrt(phi)
        w[-1], w[0] = an, -an
    xm = a.mean()
    W = float((w @ a) ** 2 / ((a - xm) ** 2).sum())
    W = min(W, 1.0)
    if n == 3:
        p = max(0.0, min(1.0, 6.0 / math.pi * (math.asin(math.sqrt(W)) - math.asin(math.sqrt(0.75)))))
        return {"W": W, "p": p}
    if n <= 11:
        g = -2.273 + 0.459 * n
        mu = 0.5440 - 0.39978 * n + 0.025054 * n**2 - 0.0006714 * n**3
        sigma = math.exp(1.3822 - 0.77857 * n + 0.062767 * n**2 - 0.0020322 * n**3)
        z = (-math.log(g - math.log1p(-W)) - mu) / sigma
    else:
        ln_n = math.log(n)
        mu = 0.0038915 * ln_n**3 - 0.083751 * ln_n**2 - 0.31082 * ln_n - 1.5861
        sigma = math.exp(0.0030302 * ln_n**2 - 0.082676 * ln_n - 0.4803)
        z = (math.log1p(-W) - mu) / sigma
    return {"W": W, "p": float(_norm_sf(z))}


def cohens_d(x, y) -> float:
    a = np.asarray(x, dtype=np.float64)
    b = np.asarray(y, dtype=np.float64)
    pooled = math.sqrt(
        ((a.size - 1) * a.var(ddof=1) + (b.size - 1) * b.var(ddof=1))
        / max(a.size + b.size - 2, 1)
    )
    return float((a.mean() - b.mean()) / max(pooled, 1e-300))
