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

Heavy array work runs in jitted cores; samplers draw on-device.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import sampling
from ..ops.ring import galois_element_rot, galois_element_conj
from .params import Parameters
from .keys import (SecretKey, PublicKey, SwitchingKey, RelinearizationKey,
                   RotationKey, ConjugationKey)


# -- jitted cores ------------------------------------------------------------

@jax.jit
def _secret_key_core(rp: Parameters, s_signed):
    ring = rp.ring_qp
    return ring.to_mont(ring.ntt(sampling.lift_signed(s_signed, ring)))


@jax.jit
def _gaussian_qp_core(rp: Parameters, e_signed):
    ring = rp.ring_qp
    return ring.to_mont(ring.ntt(sampling.lift_signed(e_signed, ring)))


@functools.partial(jax.jit, static_argnames=())
def _public_key_core(rp: Parameters, e_mont, s_mont):
    ring = rp.ring_qp
    a = rp.crs[0][0]
    pk0 = ring.sub(e_mont, ring.mul_mont(a, s_mont))
    return jnp.stack([pk0, a])


@jax.jit
def _switching_key_core(rp: Parameters, e_mont, s_mont):
    """swk_i = e_i + P*s on RNS block i of Q (alpha limbs starting at
    i*alpha), all in Montgomery+NTT."""
    ring = rp.ring_qp
    lq = rp.qcount
    beta = e_mont.shape[0]
    ps = rp.ring_q.mul_scalar_mont(s_mont[:lq], rp.pmodq_mont)  # P*s, Mont
    # mask[i, j] = 1 iff Q-limb j belongs to digit i's block
    limb = np.arange(lq)
    digit = np.arange(beta)[:, None]
    mask = (limb[None, :] // rp.alpha) == digit  # (beta, lq)
    swk_q = jnp.where(mask[:, :, None],
                      rp.ring_q.add(e_mont[:, :lq], ps[None]),
                      e_mont[:, :lq])
    return jnp.concatenate([swk_q, e_mont[:, lq:]], axis=1)


@jax.jit
def _relin_b_core(rp: Parameters, e_mont, s_mont):
    # b/d are stored in DOUBLE-Montgomery form (value * 2^64 mod q): the
    # x/y key aggregation's single Montgomery reduction then lands
    # directly in Montgomery form, eliminating the per-mult to_mont(x/y)
    # passes (keyswitch._aggregate_keys). One extra to_mont at keygen.
    ring = rp.ring_qp
    beta = e_mont.shape[0]
    a = rp.crs[0][:beta]
    return ring.to_mont(ring.sub(e_mont, ring.mul_mont(a, s_mont[None])))


@jax.jit
def _relin_d_core(rp: Parameters, sg, r_mont):
    ring = rp.ring_qp
    a = rp.crs[0][:sg.shape[0]]
    return ring.to_mont(ring.sub(sg, ring.mul_mont(a, r_mont[None])))


@jax.jit
def _relin_v_core(rp: Parameters, rg, s_mont):
    ring = rp.ring_qp
    u = rp.crs[-1][:rg.shape[0]]
    return ring.neg(ring.add(ring.mul_mont(u, s_mont[None]), rg))


@functools.partial(jax.jit, static_argnames=("rot_idx", "gal_inv"))
def _rotation_key_core(rp: Parameters, sg, s_mont, rot_idx, gal_inv):
    ring = rp.ring_qp
    sk_out = ring.permute_ntt(s_mont, gal_inv)
    a = rp.crs[rot_idx][:sg.shape[0]]
    return ring.sub(sg, ring.mul_mont(a, sk_out[None]))


@jax.jit
def _conjugation_key_core(rp: Parameters, sg_conj, s_mont):
    ring = rp.ring_qp
    a = rp.crs[-2][:sg_conj.shape[0]]
    return ring.sub(sg_conj, ring.mul_mont(a, s_mont[None]))


# ----------------------------------------------------------------------------


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
        return SecretKey(id=pid, data=_secret_key_core(p, s))

    def gen_secret_key_sparse(self, pid: str, hw: int) -> SecretKey:
        """Secret with exactly hw non-zero coefficients
        (GenSecretKeySparse, keygen.go:78-85)."""
        p = self.params
        s = sampling.ternary_sparse(self._next_key(), p.n, hw)
        return SecretKey(id=pid, data=_secret_key_core(p, s))

    def gen_secret_key_gaussian(self, pid: str) -> SecretKey:
        """Gaussian-distributed secret (GenSecretKeyGaussian,
        keygen.go:63-65)."""
        p = self.params
        s = sampling.gaussian(self._next_key(), p.n, sigma=p.sigma)
        return SecretKey(id=pid, data=_secret_key_core(p, s))

    def _gaussian_qp(self, *batch) -> jax.Array:
        """Gaussian error, extended to QP, NTT domain, Montgomery form."""
        p = self.params
        total = int(np.prod(batch)) if batch else 1
        e = sampling.gaussian(self._next_key(), total * p.n,
                              sigma=p.sigma).reshape(*batch, p.n)
        return _gaussian_qp_core(p, e)

    def gen_public_key(self, sk: SecretKey) -> PublicKey:
        e = self._gaussian_qp()
        return PublicKey(id=sk.id,
                         data=_public_key_core(self.params, e, sk.data))

    def gen_key_pair(self, pid: str) -> Tuple[SecretKey, PublicKey]:
        sk = self.gen_secret_key(pid)
        return sk, self.gen_public_key(sk)

    # -- switching keys -----------------------------------------------------

    def gen_switching_key(self, sk_in: SecretKey) -> SwitchingKey:
        """g * s_in + e in Montgomery+NTT: digit i carries P*s_in on the
        limbs of RNS block i (the reference's gadget: g_i =
        P * (Q/B_i) * ((Q/B_i)^{-1} mod B_i), keygen.go:301-324)."""
        p = self.params
        e = self._gaussian_qp(p.beta(p.max_level))
        return SwitchingKey(id=sk_in.id,
                            data=_switching_key_core(p, e, sk_in.data))

    def gen_relinearization_key(self, sk: SecretKey, r: SecretKey
                                ) -> RelinearizationKey:
        p = self.params
        beta = p.beta(p.max_level)
        b = _relin_b_core(p, self._gaussian_qp(beta), sk.data)
        d = _relin_d_core(p, self.gen_switching_key(sk).data, r.data)
        v = _relin_v_core(p, self.gen_switching_key(r).data, sk.data)
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
        sg = self.gen_switching_key(sk).data
        data = _rotation_key_core(p, sg, sk.data, rot_idx, gal_inv)
        return RotationKey(id=sk.id, rot_idx=rot_idx, data=data)

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
        sg = self.gen_switching_key(sk_out).data
        return ConjugationKey(id=sk.id,
                              data=_conjugation_key_core(p, sg, sk.data))
