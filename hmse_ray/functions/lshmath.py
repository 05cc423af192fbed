"""LSH detection-probability math (README.md:2233-2258).

P(candidate | Jaccard s) = 1 - (1 - s^r)^b for b bands of r rows.
Reference operating point b=4, r=32: P=0.069 @ s=0.80, 0.249 @ 0.85,
0.567 @ 0.90, 0.870 @ 0.95 (README.md:2249-2258).
"""

from __future__ import annotations

from hmse_ray.config import Config, DEFAULT_CONFIG


def detection_probability(s: float, cfg: Config = DEFAULT_CONFIG) -> float:
    return 1.0 - (1.0 - s**cfg.rows_per_band) ** cfg.num_bands


def expected_recall_curve(cfg: Config = DEFAULT_CONFIG) -> dict[float, float]:
    return {s: detection_probability(s, cfg) for s in (0.80, 0.85, 0.90, 0.95, 1.0)}
