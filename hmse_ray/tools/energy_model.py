"""Energy break-even model (A7) — reimplemented from the reference's
published semantics (tools/energy_calculator.py:28-92, tools/README.md:83-86).

Pure scalar model: is it worth spending compression energy to shrink a
transmission? Total energy = compression energy (constant for a given
corpus) + transmission energy (inversely proportional to the
compression factor). The break-even CF solves
``E_compress + E_transmit(CF) = E_transmit(1.0)``.

Written from the formulas, not ported code; defaults match the
reference scenario (0.5 W / 36 h compression, 5 W transmit).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class EnergyBreakdown:
    compression_wh: float
    transmission_wh: float
    total_wh: float
    transmission_hrs: float


def energy(size_gb: float, cf: float, bandwidth_mbps: float,
           compress_power_w: float = 0.5, compress_time_hrs: float = 36.0,
           transmit_power_w: float = 5.0) -> EnergyBreakdown:
    """Total energy (Wh) to compress at factor ``cf`` then transmit."""
    if cf <= 0:
        raise ValueError("cf must be positive")
    size_bits = size_gb * 8e9
    bandwidth_bps = bandwidth_mbps * 1e6
    e_compress = compress_power_w * compress_time_hrs
    t_transmit_hrs = (size_bits / cf / bandwidth_bps) / 3600.0
    e_transmit = transmit_power_w * t_transmit_hrs
    return EnergyBreakdown(
        compression_wh=e_compress,
        transmission_wh=e_transmit,
        total_wh=e_compress + e_transmit,
        transmission_hrs=t_transmit_hrs,
    )


def breakeven_cf(size_gb: float, bandwidth_mbps: float,
                 compress_power_w: float = 0.5, compress_time_hrs: float = 36.0,
                 transmit_power_w: float = 5.0) -> float:
    """CF at which compressing pays for itself; inf if it never does."""
    e_uncompressed = energy(
        size_gb, 1.0, bandwidth_mbps, compress_power_w, compress_time_hrs,
        transmit_power_w,
    ).transmission_wh
    e_compress = compress_power_w * compress_time_hrs
    if e_compress >= e_uncompressed:
        return float("inf")
    return e_uncompressed / (e_uncompressed - e_compress)


def roi(size_gb: float, cf: float, bandwidth_mbps: float, **kw) -> float:
    """Energy saved per energy spent compressing."""
    with_c = energy(size_gb, cf, bandwidth_mbps, **kw)
    without = energy(size_gb, 1.0, bandwidth_mbps, **kw)
    saved = without.transmission_wh - with_c.transmission_wh
    return saved / max(1e-12, with_c.compression_wh)
