"""BFV key generation (TPU rebuild of mkbfv/keygen.go).

Generates the fused-pair relinearization key over the two CRS vectors
a1 = CRS[0], a2 = CRS[-3], u = CRS[-1]:

  b = -s*[a1;a2] + e                               (2*beta digits)
  d = gBFV*s + e - r*[a1;a2]                       (2*beta digits)
  v = -s*u - g*r - e                               (beta digits, standard
                                                    Q-basis gadget)

where digit i of the BFV gadget carries the scalar
  G_i = floor( t * P * (QQMul/B_i) * ((QQMul/B_i)^{-1} mod B_i) / QMul )
with B_i the i-th limb of Q (first half) or QMul (second half)
(mkbfv/keygen.go:91-162).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import mkrlwe
from ..ops import modmath as mm
from .params import Parameters
from .keys import RelinearizationKey


class KeyGenerator(mkrlwe.KeyGenerator):
    def __init__(self, params: Parameters, seed: int = 1):
        super().__init__(params.rlwe, seed=seed)
        self.bfv_params = params

    def _bfv_gadget_scalars(self):
        p = self.bfv_params
        Q = 1
        for q in p.rlwe.q_moduli:
            Q *= q
        QMul = 1
        for q in p.qmul_moduli:
            QMul *= q
        P = 1
        for q in p.rlwe.p_moduli:
            P *= q
        QQMul = Q * QMul
        alpha = p.rlwe.alpha
        beta = p.rlwe.beta(p.max_level)
        out = []
        for half in (list(p.rlwe.q_moduli), list(p.qmul_moduli)):
            for i in range(beta):
                b_i = 1
                for qq in half[i * alpha:(i + 1) * alpha]:
                    b_i *= qq
                g = QQMul // b_i
                ti = pow(g % b_i, -1, b_i)
                out.append(p.t * P * g * ti // QMul)
        return out  # 2*beta python ints

    def gen_bfv_switching_key(self, sk: mkrlwe.SecretKey) -> jnp.ndarray:
        """gBFV * s + e over QP, (2*beta, Lqp, N), NTT+Mont."""
        p = self.bfv_params
        ring_qp = p.rlwe.ring_qp
        scalars = self._bfv_gadget_scalars()
        swk = self._gaussian_qp(len(scalars))
        g_mont = np.array(
            [[mm.to_mont_host(g % q, q) for q in ring_qp.moduli]
             for g in scalars], np.uint32)  # (2*beta, Lqp)
        gs = mm.mont_mul(sk.data[None], g_mont[:, :, None],
                         ring_qp.q[:, None], ring_qp.qinv_neg[:, None])
        return ring_qp.add(swk, gs)

    def gen_relinearization_key_bfv(self, sk: mkrlwe.SecretKey,
                                    r: mkrlwe.SecretKey
                                    ) -> RelinearizationKey:
        p = self.bfv_params
        ring = p.rlwe.ring_qp
        beta = p.rlwe.beta(p.max_level)
        a = jnp.concatenate([p.rlwe.crs[0][:beta],
                             p.rlwe.crs[-3][:beta]], axis=0)
        u = p.rlwe.crs[-1][:beta]

        # b/d in DOUBLE-Montgomery form (see mkrlwe/keygen._relin_b_core):
        # the x/y aggregation's Montgomery reduction then emits Montgomery
        # form directly, skipping the per-mult to_mont passes.
        e = self._gaussian_qp(2 * beta)
        b = ring.to_mont(ring.sub(e, ring.mul_mont(a, sk.data[None])))

        d = self.gen_bfv_switching_key(sk)
        d = ring.to_mont(ring.sub(d, ring.mul_mont(a, r.data[None])))

        v = self.gen_switching_key(r).data
        v = ring.neg(ring.add(ring.mul_mont(u, sk.data[None]), v))

        return RelinearizationKey(id=sk.id, b=b, d=d, v=v)
