"""Key generation (TPU rebuild of mkrlwe/keygen.go).

All keys derive from a jax.random PRNG key, so key material is
reproducible from seeds. Identities generated (with CRS a = crs[0],
u = crs[-1]; everything NTT + Montgomery):

  sk:   ternary s (P(0)=1/2), extended to QP               (keygen.go:58-75)
  pk:   (-a_0 s + e, a_0)                                  (keygen.go:88-109)
  swk(s'): gadget encryption g*s' + e, where digit i of g adds P*s' on the
        i-th RNS block of Q                                (keygen.go:270-327)
  rlk:  b_i = -s a_i + e
        d   = swk(s); d_i -= r a_i      -> d = -r a + g s + e
        v   = swk(r); v_i = -(s u_i + v_i) -> v = -s u - g r - e
                                                           (keygen.go:137-187)
  rtk:  swk(s) - a^(rot) sigma_{g^-1}(s)                   (keygen.go:190-229)
  cjk:  swk(sigma_conj(s)) - a^(conj) s                    (keygen.go:240-267)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import sampling
from ..ops.ring import galois_element_rot, galois_element_conj
from .params import Parameters
from .keys import (SecretKey, PublicKey, SwitchingKey, RelinearizationKey,
                   RotationKey, ConjugationKey)


class KeyGenerator:
    def __init__(self, params: Parameters, seed: int = 1):
        self.params = params
        self._key = jax.random.key(seed)

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # -- basic keys ---------------------------------------------------------

    def gen_secret_key(self, pid: str) -> SecretKey:
        p = self.params
        s = sampling.ternary(self._next_key(), p.n)
        s_rns = sampling.lift_signed(s, p.ring_qp)
        return SecretKey(id=pid, data=p.ring_qp.to_mont(p.ring_qp.ntt(s_rns)))

    def _gaussian_qp(self, *batch) -> jax.Array:
        """Gaussian error, extended to QP, NTT domain, Montgomery form."""
        p = self.params
        e = sampling.gaussian_rns(self._next_key(), p.ring_qp, *batch,
                                  sigma=p.sigma)
        return p.ring_qp.to_mont(p.ring_qp.ntt(e))

    def gen_public_key(self, sk: SecretKey) -> PublicKey:
        p = self.params
        a = p.crs[0][0]  # digit 0 of the relin CRS (keygen.go:104)
        e = self._gaussian_qp()
        pk0 = p.ring_qp.sub(e, p.ring_qp.mul_mont(a, sk.data))
        return PublicKey(id=sk.id, data=jnp.stack([pk0, a]))

    def gen_key_pair(self, pid: str) -> Tuple[SecretKey, PublicKey]:
        sk = self.gen_secret_key(pid)
        return sk, self.gen_public_key(sk)

    # -- switching keys -----------------------------------------------------

    def gen_switching_key(self, sk_in: SecretKey) -> SwitchingKey:
        """g * s_in + e in Montgomery+NTT: digit i carries P*s_in on the
        limbs of RNS block i (exactly the reference's gadget: g_i =
        P * (Q/B_i) * ((Q/B_i)^{-1} mod B_i) which is P mod the block's
        limbs and 0 elsewhere, keygen.go:301-324)."""
        p = self.params
        beta = p.beta(p.max_level)
        alpha = p.alpha
        swk = self._gaussian_qp(beta)  # (beta, Lqp, N)
        ps = p.ring_q.mul_scalar_mont(
            sk_in.data[:p.qcount], p.pmodq_mont)  # P*s over Q limbs, Mont
        for i in range(beta):
            lo = i * alpha
            hi = min(lo + alpha, p.qcount)
            swk = swk.at[i, lo:hi].set(
                p.ring_q.take(lo, hi).add(swk[i, lo:hi], ps[lo:hi]))
        return SwitchingKey(id=sk_in.id, data=swk)

    def gen_relinearization_key(self, sk: SecretKey, r: SecretKey
                                ) -> RelinearizationKey:
        p = self.params
        ring = p.ring_qp
        beta = p.beta(p.max_level)
        a = p.crs[0][:beta]
        u = p.crs[-1][:beta]

        e = self._gaussian_qp(beta)
        b = ring.sub(e, ring.mul_mont(a, sk.data[None]))

        d = self.gen_switching_key(sk).data
        d = ring.sub(d, ring.mul_mont(a, r.data[None]))

        v = self.gen_switching_key(r).data
        v = ring.neg(ring.add(ring.mul_mont(u, sk.data[None]), v))

        return RelinearizationKey(id=sk.id, b=b, d=d, v=v)

    def gen_rotation_key(self, rot_idx: int, sk: SecretKey) -> RotationKey:
        p = self.params
        while rot_idx < 0:
            rot_idx += p.n // 2
        if rot_idx not in p.crs:
            raise KeyError(
                f"no CRS for rotation {rot_idx}; call add_crs first "
                "(reference panics the same way, keygen.go:202-205)")
        gal = galois_element_rot(rot_idx, p.n)
        gal_inv = pow(gal, -1, 2 * p.n)
        sk_out = p.ring_qp.permute_ntt(sk.data, gal_inv)
        rk = self.gen_switching_key(sk).data
        a = p.crs[rot_idx][:p.beta(p.max_level)]
        rk = p.ring_qp.sub(rk, p.ring_qp.mul_mont(a, sk_out[None]))
        return RotationKey(id=sk.id, rot_idx=rot_idx, data=rk)

    def gen_default_rotation_keys(self, sk: SecretKey, rtk_set) -> None:
        """Power-of-two rotation keys (keygen.go:232-237)."""
        rot = 1
        while rot < self.params.n // 2:
            rtk_set.add(self.gen_rotation_key(rot, sk))
            rot *= 2

    def gen_conjugation_key(self, sk: SecretKey) -> ConjugationKey:
        p = self.params
        gal = galois_element_conj(p.n)
        sk_out = SecretKey(id=sk.id,
                           data=p.ring_qp.permute_ntt(sk.data, gal))
        ck = self.gen_switching_key(sk_out).data
        a = p.crs[-2][:p.beta(p.max_level)]
        ck = p.ring_qp.sub(ck, p.ring_qp.mul_mont(a, sk.data[None]))
        return ConjugationKey(id=sk.id, data=ck)
