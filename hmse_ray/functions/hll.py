"""HyperLogLog distinct-count (Flajolet et al. 2007) over sha256 keys.

The scale story: an EXACT distinct count (``groupby(sha).count``) is an
all-to-all shuffle of one row per document. The HLL register form makes
the shuffle cardinality-bounded: every batch reduces to at most
``m = 2^p`` (register, max rho) partial rows per group, partials merge
by ``max`` (associative/commutative), and only ``groups x m`` tiny
integer rows ever move. At 10^12 rows the shuffle payload is ~KBs per
group instead of the corpus.

Determinism note (why this is SQL-checkable bit-for-bit): the hash is
the first 32 bits of sha256 (DuckDB has sha256()); registers and rho
are pure integer arithmetic; ``sum(2^-rho)`` is EXACT in float64 (every
term is a multiple of 2^-(32-p+1) and the sum stays < m, well inside
the 52-bit mantissa), so it is order-independent; the final estimate
shares one IEEE division/log sequence written identically in the SQL
oracle, rounded to 3 decimals.
"""

from __future__ import annotations

import numpy as np

from hmse_ray.functions.bloom import hex_words


def registers32(sha_hexes, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rho) per key from the first 32 sha bits.

    register = top p bits; rho = 1 + leading zeros of the remaining
    (32-p)-bit word (= (32-p)+1 - bitlength, exact via frexp).
    """
    h32, _ = hex_words(sha_hexes)
    j = (h32 >> np.uint64(32 - p)).astype(np.int64)
    w = (h32 & np.uint64((1 << (32 - p)) - 1)).astype(np.float64)
    _, e = np.frexp(w)  # exponent == bitlength for exact small ints; 0 for 0
    rho = (32 - p) + 1 - e.astype(np.int64)
    return j, rho


def estimate(max_rho: np.ndarray, p: int) -> tuple[float, int]:
    """HLL estimate from the non-zero registers' max-rho values.

    Returns (estimate, zero_registers). Uses the standard alpha_m bias
    constant and the small-range linear-counting correction — written
    operation-for-operation like the SQL oracle so both engines run the
    identical IEEE sequence.
    """
    m = 1 << p
    zeros = m - len(max_rho)
    sum_inv = float(
        np.power(2.0, -max_rho.astype(np.float64)).sum()
    ) + float(zeros)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / sum_inv
    if raw <= 2.5 * m and zeros > 0:
        return m * float(np.log(m / zeros)), zeros
    return raw, zeros
