"""HyperLogLog distinct-count (Flajolet et al. 2007) over sha256 keys.

The scale story: an EXACT distinct count (``groupby(sha).count``) is an
all-to-all shuffle of one row per document. The HLL register form makes
the shuffle cardinality-bounded: every batch reduces to at most
``m = 2^p`` (register, max rho) partial rows per group, partials merge
by ``max`` (associative/commutative), and only ``groups x m`` tiny
integer rows ever move. At 10^12 rows the shuffle payload is ~KBs per
group instead of the corpus.

Hash width (ADVICE r4): the hash is the first SIXTY-FOUR bits of sha256
(both 32-bit words), so the estimator carries no 2^32 ceiling — a
32-bit HLL biases low past ~2^32/30 ~ 143M distinct values and
saturates near 4.3B, far below the 10^12-row design point. With 64
bits, no large-range correction is needed at any cardinality this
engine can hold.

Determinism note (why this is SQL-checkable bit-for-bit): DuckDB has
sha256(), and registers/rho are pure integer arithmetic. With the
64-bit hash the register-sum ``sum(2^-rho)`` would NOT be exact in
float64 (terms go down to 2^-(64-p+1), beyond the 52-bit mantissa when
combined with a total of up to m), so the sum is computed as an exact
INTEGER: ``sum_scaled = sum(2^(wbits+1-rho)) + zeros * 2^(wbits+1)``
(each term <= 2^wbits; the total fits int128 / Python int). Both
engines convert that one integer to float64 with the same
round-to-nearest cast and then share a single IEEE
division/log sequence, rounded to 3 decimals. Requires p >= 12 so the
(64-p)-bit remainder stays exact in float64 for the vectorized
bitlength (frexp) computation.
"""

from __future__ import annotations

import numpy as np

from hmse_ray.functions.bloom import hex_words


def registers64(sha_hexes, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rho) per key from the first 64 sha bits.

    register = top p bits; rho = 1 + leading zeros of the remaining
    (64-p)-bit word (= (64-p)+1 - bitlength, exact via frexp — valid
    because p >= 12 keeps the word under 2^53).
    """
    if p < 12:
        raise ValueError(f"p must be >= 12 for exact float64 rho (got {p})")
    w0, w1 = hex_words(sha_hexes)
    h = (w0 << np.uint64(32)) | w1
    wbits = 64 - p
    j = (h >> np.uint64(wbits)).astype(np.int64)
    w = (h & np.uint64((1 << wbits) - 1)).astype(np.float64)
    _, e = np.frexp(w)  # exponent == bitlength for exact small ints; 0 for 0
    rho = wbits + 1 - e.astype(np.int64)
    return j, rho


def estimate(max_rho: np.ndarray, p: int) -> tuple[float, int]:
    """HLL estimate from the non-zero registers' max-rho values.

    Returns (estimate, zero_registers). The register sum is an exact
    integer (module docstring) converted to float64 ONCE, then the
    standard alpha_m estimate with the small-range linear-counting
    correction — written operation-for-operation like the SQL oracle so
    both engines run the identical IEEE sequence. No large-range
    correction: the 64-bit hash needs none at reachable cardinalities.
    """
    m = 1 << p
    wbits = 64 - p
    scale = 1 << (wbits + 1)
    zeros = m - len(max_rho)
    sum_scaled = sum(
        1 << (wbits + 1 - int(r)) for r in np.asarray(max_rho).tolist()
    ) + zeros * scale
    sum_inv = float(sum_scaled) / float(scale)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / sum_inv
    if raw <= 2.5 * m and zeros > 0:
        return m * float(np.log(m / zeros)), zeros
    return raw, zeros
