"""RLWE security estimation from the Homomorphic Encryption Standard.

The reference inherits parameter security from lattigo's published
parameter sets (PN14QP439 / PN15QP880 are the standard <= 2^438 / 2^881
budgets for 128-bit security with ternary secrets). This module makes the
same contract explicit: given (logN, total modulus bits, secret
distribution), look up the maximum logQP admitting a target security
level, per the HE Standard v1.1 tables (homomorphicencryption.org,
Table 1, ternary/error columns) — the same tables lattigo validates
against.

Values are the maximum log2(QP) for each (logN, security) pair.
"""

from __future__ import annotations

import math
from typing import Tuple

# HE Standard v1.1, ternary secret ({-1,0,1}), error stddev 3.2:
# max log2(QP) for security in {128, 192, 256} bits.
_TERNARY_MAX_LOGQP = {
    10: (27, 19, 14),
    11: (54, 37, 27),
    12: (109, 75, 57),
    13: (218, 152, 118),
    14: (438, 305, 237),
    15: (881, 611, 476),
    16: (1772, 1228, 953),
    17: (3576, 2463, 1907),
}

_LEVELS = (128, 192, 256)


def max_logqp(logn: int, security: int = 128) -> int:
    """Maximum total modulus bits (log2 of Q*P) for the given ring degree
    and security level, ternary secrets."""
    if logn not in _TERNARY_MAX_LOGQP:
        raise ValueError(f"no standard entry for logN={logn}")
    if security not in _LEVELS:
        raise ValueError(f"security must be one of {_LEVELS}")
    return _TERNARY_MAX_LOGQP[logn][_LEVELS.index(security)]


def logqp(q_moduli, p_moduli=()) -> float:
    """Total log2 of the modulus chain."""
    return sum(math.log2(q) for q in tuple(q_moduli) + tuple(p_moduli))


def security_bits(logn: int, total_logqp: float) -> int:
    """Largest standard security level (128/192/256) admitted by the
    parameters, or 0 if even 128-bit is not met. Conservative: linear
    interpolation is NOT applied — the standard's table is a step
    function over logN."""
    if logn not in _TERNARY_MAX_LOGQP:
        # larger rings than the table: scale the 2^17 row linearly in N
        # (the lattice dimension); conservative for logN > 17
        base = _TERNARY_MAX_LOGQP[17]
        scale = (1 << logn) / (1 << 17)
        row = tuple(int(b * scale) for b in base)
    else:
        row = _TERNARY_MAX_LOGQP[logn]
    out = 0
    for lvl, cap in zip(_LEVELS, row):
        if total_logqp <= cap:
            out = max(out, lvl)
    return out


def check_security(logn: int, q_moduli, p_moduli=(), minimum: int = 128
                   ) -> Tuple[int, float]:
    """Returns (security_level, total_logqp); raises if below `minimum`.

    Mirrors the implicit contract of the reference's standard parameter
    sets (mkckks/mkckks_test.go:51-91 use PN15QP880/PN14QP439 = the
    128-bit ternary budgets).
    """
    total = logqp(q_moduli, p_moduli)
    lvl = security_bits(logn, total)
    if lvl < minimum:
        raise ValueError(
            f"parameters below {minimum}-bit security: logN={logn}, "
            f"logQP={total:.1f} > standard cap "
            f"{max_logqp(logn, minimum) if logn in _TERNARY_MAX_LOGQP else 'n/a'}")
    return lvl, total
