"""CKKS helper utilities (TPU rebuild of mkckks/utils.go)."""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np


def standard_deviation(vec: Sequence[float], scale: float) -> float:
    """Scaled standard deviation (mkckks/utils.go:10-28)."""
    v = np.asarray(vec, np.float64)
    return float(np.sqrt(np.mean((v - v.mean()) ** 2)) * scale)


def scale_up_exact(value: float, n: float, q: int) -> int:
    """round(value*n) mod q with sign handling (mkckks/utils.go:59-86)."""
    neg = value < 0
    x = int(abs(value) * n + 0.5) % q
    return (q - x) % q if neg else x


def gen_bigint_chain(qs: Sequence[int]):
    """Prefix products Q_0, Q_0*Q_1, ... (mkckks/utils.go:193-202)."""
    out = []
    cur = 1
    for q in qs:
        cur *= q
        out.append(cur)
    return out


def gen_switchkeys_rescaling_params(qs: Sequence[int], ps: Sequence[int]):
    """P^{-1} mod q_i in Montgomery form (mkckks/utils.go:205-224)."""
    from ..ops import modmath as mm
    P = 1
    for p in ps:
        P *= p
    return [mm.to_mont_host(pow(P % q, -1, q), q) for q in qs]


def bit_reverse_vec(values):
    """In-place-style bit-reverse permutation (mkckks/utils.go:227-268)."""
    v = np.asarray(values)
    n = len(v)
    logn = int(math.log2(n))
    from ..ops.primes import bit_reverse
    idx = np.array([bit_reverse(i, logn) for i in range(n)])
    return v[idx]
