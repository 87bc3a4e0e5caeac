"""Multi-key BFV parameters with the double RNS basis Q, QMul, R = Q*QMul
(TPU rebuild of mkbfv/params.go).

The reference requires len(Q) == len(QMul); tensor products are computed in
the extended basis R (2x the limbs), then quantized by t/QMul back to Q.
Plaintext modulus T = 65537 is itself NTT-friendly for logN <= 15, so the
slot encoder reuses the framework's Ring machinery over T.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax

from .. import mkrlwe
from ..ops.ring import Ring
from ..ops.primes import ntt_primes


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["rlwe"], meta_fields=["qmul_moduli", "t"],
)
@dataclasses.dataclass(frozen=True)
class Parameters:
    rlwe: mkrlwe.Parameters       # over Q, P (carries the CRS)
    qmul_moduli: Tuple[int, ...]
    t: int

    @property
    def logn(self) -> int:
        return self.rlwe.logn

    @property
    def n(self) -> int:
        return self.rlwe.n

    @property
    def max_level(self) -> int:
        return self.rlwe.max_level

    @property
    def ring_q(self) -> Ring:
        return self.rlwe.ring_q

    @property
    def ring_qmul(self) -> Ring:
        return Ring.create(self.qmul_moduli, self.logn)

    @property
    def ring_r(self) -> Ring:
        """R = Q ++ QMul (limb order: Q limbs then QMul limbs)."""
        return self.ring_q.concat(self.ring_qmul)

    @property
    def ring_t(self) -> Ring:
        return Ring.create((self.t,), self.logn)


def new_parameters(logn: int, q_moduli, qmul_moduli, p_moduli,
                   t: int = 65537, gamma: int = 2) -> Parameters:
    assert len(q_moduli) == len(qmul_moduli), \
        "Q and QMul must have equal length (mkbfv/params.go:38-40)"
    alpha = max(1, len(p_moduli) // gamma)
    assert len(q_moduli) % alpha == 0, \
        "limb count must be a multiple of alpha (digit blocks must not " \
        "straddle the Q/QMul boundary of R)"
    rl = mkrlwe.new_parameters(logn, tuple(q_moduli), tuple(p_moduli),
                               gamma=gamma)
    params = Parameters(rlwe=rl, qmul_moduli=tuple(qmul_moduli), t=t)
    # Eagerly materialize the cached rings OUTSIDE any jit trace (Ring.create
    # is lru-cached; a first call inside a trace would cache tracers).
    params.ring_qmul, params.ring_r, params.ring_t
    return params


@functools.lru_cache(maxsize=None)
def PN15QP880() -> Parameters:
    """logN=15: Q = QMul ~ 764 bits each (28 x ~27.3b limbs), P ~57b,
    T=65537 (reference: mkbfv/mkbfv_test.go:28-75)."""
    logn = 15
    q = ntt_primes(logn, 27.3, 28)
    qmul = ntt_primes(logn, 27.3, 28, skip=28)
    p = ntt_primes(logn, 28.4, 4)
    return new_parameters(logn, q, qmul, p)


@functools.lru_cache(maxsize=None)
def PN14QP439() -> Parameters:
    """logN=14: Q = QMul ~ 319 bits (12 x ~26.6b limbs), P ~57b, T=65537
    (reference: mkbfv/mkbfv_test.go:77-108)."""
    logn = 14
    q = ntt_primes(logn, 26.6, 12)
    qmul = ntt_primes(logn, 26.6, 12, skip=12)
    p = ntt_primes(logn, 28.4, 4)
    return new_parameters(logn, q, qmul, p)
