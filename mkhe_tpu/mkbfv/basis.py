"""BFV double-basis conversions (TPU rebuild of mkbfv/basis_extension.go):

  mod_up_q_to_r: lift x mod Q into basis R = Q ++ QMul (value x + small*Q).
  rescale_q_to_r: produce w in basis R with Q*w ≡ -(y*QMul mod Q) (mod QMul)
    — i.e. w ~= y*QMul/Q up to sign conventions; together with the lift of
    the other operand and the final t/QMul quantization this realizes the
    BFV cross-basis multiplication exactly as the reference does.
  quantize: round(t * x / QMul): tensor results in R (NTT domain) back
    down to Q.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import basis, modmath as mm
from ..ops.ring import Ring
from .params import Parameters


@functools.lru_cache(maxsize=None)
def _consts(q_moduli, qmul_moduli):
    QMul = 1
    for q in qmul_moduli:
        QMul *= q
    Q = 1
    for q in q_moduli:
        Q *= q
    qmul_mod_q = np.array([mm.to_mont_host(QMul % q, q) for q in q_moduli],
                          np.uint32)
    qinv_mod_qmul = np.array(
        [mm.to_mont_host(pow(Q % p, -1, p), p) for p in qmul_moduli],
        np.uint32)
    return qmul_mod_q, qinv_mod_qmul


def mod_up_q_to_r(params: Parameters, x: jax.Array) -> jax.Array:
    """(..., Lq, N) mod Q -> (..., 2Lq, N) mod R (coeff domain).
    Reference: FastBasisExtender.ModUpQtoR (mkbfv/basis_extension.go:49-63).
    """
    rq, rqm = params.ring_q, params.ring_qmul
    t = basis.mod_up_tables(rq.moduli, rqm.moduli)
    ext = basis.mod_up(x, rq, rqm, t)
    return jnp.concatenate([x, ext], axis=-2)


def rescale_q_to_r(params: Parameters, y: jax.Array) -> jax.Array:
    """(..., Lq, N) mod Q -> (..., 2Lq, N) mod R holding
    w = -(y*QMul mod Q) * Q^{-1} mod QMul, extended to R.
    Reference: FastBasisExtender.Rescale (mkbfv/basis_extension.go:83-97).
    """
    rq, rqm = params.ring_q, params.ring_qmul
    qmul_mod_q, qinv_mod_qmul = _consts(rq.moduli, rqm.moduli)
    a = rq.mul_scalar_mont(y, qmul_mod_q)      # y*QMul mod Q
    t_q2m = basis.mod_up_tables(rq.moduli, rqm.moduli)
    conv = basis.mod_up(a, rq, rqm, t_q2m)     # a mod QMul (canonical)
    w = rqm.mul_scalar_mont(rqm.neg(conv), qinv_mod_qmul)
    t_m2q = basis.mod_up_tables(rqm.moduli, rq.moduli)
    w_q = basis.mod_up(w, rqm, rq, t_m2q)      # w mod Q
    return jnp.concatenate([w_q, w], axis=-2)


def quantize(params: Parameters, x_r_ntt: jax.Array) -> jax.Array:
    """NTT-domain (..., 2Lq, N) over R -> coeff-domain (..., Lq, N) over Q:
    round(t * x / QMul). Reference: FastBasisExtender.Quantize
    (mkbfv/basis_extension.go:66-80)."""
    rq, rqm = params.ring_q, params.ring_qmul
    ring_r = params.ring_r
    t_mont = np.array([mm.to_mont_host(params.t % q, q)
                       for q in ring_r.moduli], np.uint32)
    tx = ring_r.mul_scalar_mont(x_r_ntt, t_mont)
    tx = ring_r.intt(tx)
    lq = len(rq.moduli)
    return basis.mod_down(tx[..., :lq, :], tx[..., lq:, :], rq, rqm)
