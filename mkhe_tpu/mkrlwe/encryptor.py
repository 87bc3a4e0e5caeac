"""Single-party RLWE public-key encryption producing 2-component multi-key
ciphertexts (TPU rebuild of mkrlwe/encryptor.go:55-118):

    ct = { "0": u*pk0 + e0 + m,   id: u*pk1 + e1 }

with ternary u and gaussian e0, e1. Like the reference, both the plaintext
and the output ciphertext may independently be in coefficient or NTT
domain (encryptor.go:55-118 branches on plaintext.Value.IsNTT and
ctOut.Value["0"].IsNTT): pass pt_ntt/ct_ntt.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import sampling
from .params import Parameters
from .elements import Ciphertext
from .keys import PublicKey


@functools.partial(jax.jit, static_argnames=("level", "has_pt", "pt_ntt",
                                             "ct_ntt"))
def _encrypt_core(rp: Parameters, pk_data, pt, u_signed, e0_signed,
                  e1_signed, level, has_pt, pt_ntt=False, ct_ntt=False):
    ring = rp.ring_q_at(level)
    u = sampling.lift_signed(u_signed, ring)
    u_ntt = ring.ntt(u)
    pk0 = pk_data[0, :level + 1]
    pk1 = pk_data[1, :level + 1]
    e0 = sampling.lift_signed(e0_signed, ring)
    e1 = sampling.lift_signed(e1_signed, ring)
    if ct_ntt:
        # NTT-domain output (encryptor.go:74-93): errors are NTT'd and
        # added in the evaluation domain; a coeff-domain plaintext is
        # folded into e0 before its NTT.
        c0 = ring.mul_mont(u_ntt, pk0)
        c1 = ring.mul_mont(u_ntt, pk1)
        if has_pt and not pt_ntt:
            e0 = ring.add(e0, pt)
        c0 = ring.add(c0, ring.ntt(e0))
        c1 = ring.add(c1, ring.ntt(e1))
        if has_pt and pt_ntt:
            c0 = ring.add(c0, pt)
    else:
        # coefficient-domain output (encryptor.go:95-112)
        c0 = ring.add(ring.intt(ring.mul_mont(u_ntt, pk0)), e0)
        c1 = ring.add(ring.intt(ring.mul_mont(u_ntt, pk1)), e1)
        if has_pt:
            c0 = ring.add(c0, ring.intt(pt) if pt_ntt else pt)
    return jnp.stack([c0, c1])


class Encryptor:
    def __init__(self, params: Parameters, seed: int = 2):
        self.params = params
        self._key = jax.random.key(seed)

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def encrypt(self, plaintext: Optional[jax.Array], pk: PublicKey,
                level: Optional[int] = None, pt_ntt: bool = False,
                ct_ntt: bool = False) -> Ciphertext:
        """plaintext: (Lq_level, N) uint32 (or None for an encryption of
        zero), in NTT domain if pt_ntt. Returns a fresh 2-component
        ciphertext, in NTT domain if ct_ntt (the reference's four
        IsNTT combinations, encryptor.go:55-118)."""
        p = self.params
        if level is None:
            level = (plaintext.shape[-2] - 1 if plaintext is not None
                     else p.max_level)
        u = sampling.ternary(self._next_key(), p.n)
        e0 = sampling.gaussian(self._next_key(), p.n, sigma=p.sigma)
        e1 = sampling.gaussian(self._next_key(), p.n, sigma=p.sigma)
        pt = plaintext if plaintext is not None else jnp.zeros(
            (level + 1, p.n), jnp.uint32)
        data = _encrypt_core(p, pk.data, pt, u, e0, e1, level,
                             plaintext is not None, pt_ntt, ct_ntt)
        return Ciphertext(ids=(pk.id,), data=data)
