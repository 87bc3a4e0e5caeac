"""Host-side exact CRT reconstruction (decrypt/decode boundary only).

The device data plane is pure uint32 RNS; only at the plaintext boundary
(CKKS decode, BFV decode, noise measurement in tests) do we reconstruct
big integers, with python ints via numpy object arrays.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def crt_reconstruct(limbs: np.ndarray, moduli: Sequence[int]) -> np.ndarray:
    """limbs uint32 (L, N) -> object ndarray (N,) of ints in [0, Q)."""
    Q = 1
    for q in moduli:
        Q *= q
    acc = np.zeros(limbs.shape[-1], dtype=object)
    for i, qi in enumerate(moduli):
        qhat = Q // qi
        c = (qhat * pow(qhat % qi, -1, qi)) % Q
        acc = (acc + limbs[i].astype(object) * c) % Q
    return acc


def crt_center(limbs: np.ndarray, moduli: Sequence[int]) -> np.ndarray:
    """Reconstruct and center into (-Q/2, Q/2]. Object ndarray (N,)."""
    Q = 1
    for q in moduli:
        Q *= q
    x = crt_reconstruct(limbs, moduli)
    return np.where(x > Q // 2, x - Q, x)


def to_rns(values, moduli: Sequence[int]) -> np.ndarray:
    """Signed python-int array (N,) -> uint32 (L, N)."""
    values = np.asarray(values, dtype=object)
    out = np.empty((len(moduli), len(values)), np.uint32)
    for i, qi in enumerate(moduli):
        out[i] = np.array([int(v) % qi for v in values], dtype=np.uint64
                          ).astype(np.uint32)
    return out


def log2_max_abs(centered: np.ndarray) -> float:
    """ceil-ish log2 of the max |coefficient| (noise measurement helper,
    the analog of the reference's log2OfInnerSum, mkrlwe_test.go:92-155)."""
    m = max((abs(int(v)) for v in centered), default=0)
    return float(int(m).bit_length()) if m else 0.0
