"""Distributed decryption (TPU rebuild of mkrlwe/decryptor.go).

PartialDecrypt is the MPC primitive: party i computes c_0 += c_i * s_i and
deletes its component; full Decrypt folds all parties' partial decryptions
(in a real deployment each party runs its own partial decrypt locally —
the process boundary of the protocol crosses here, cf. SURVEY.md §3.3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .params import Parameters
from .elements import Ciphertext
from .keys import SecretKey, SecretKeySet


@functools.partial(jax.jit, static_argnames=("level",))
def _partial_core(rp: Parameters, c0, ci, sk_data, level):
    ring = rp.ring_q_at(level)
    prod = ring.intt(ring.mul_mont(ring.ntt(ci), sk_data[:level + 1]))
    return ring.add(c0, prod)


@functools.partial(jax.jit, static_argnames=("level",))
def _full_core(rp: Parameters, data, sk_stack, level):
    """c0 + sum_i c_i * s_i in one fused pass."""
    ring = rp.ring_q_at(level)
    prods = ring.mul_mont(ring.ntt(data[1:]), sk_stack[:, :level + 1])
    total = ring.intt(prods)
    out = data[0]
    for i in range(total.shape[0]):
        out = ring.add(out, total[i])
    return out


class Decryptor:
    def __init__(self, params: Parameters):
        self.params = params

    def partial_decrypt(self, ct: Ciphertext, sk: SecretKey) -> Ciphertext:
        level = ct.level
        i = ct.ids.index(sk.id)
        c0 = _partial_core(self.params, ct.data[0], ct.data[1 + i],
                           sk.data, level)
        rest_ids = ct.ids[:i] + ct.ids[i + 1:]
        rest = jnp.concatenate(
            [c0[None], ct.data[1:1 + i], ct.data[2 + i:]], axis=0)
        return Ciphertext(ids=rest_ids, data=rest)

    def decrypt(self, ct: Ciphertext, sk_set: SecretKeySet):
        """Returns the coeff-domain plaintext polynomial (Lq, N) uint32."""
        if not ct.ids:
            return ct.data[0]
        sk_stack = jnp.stack([sk_set.get(pid).data for pid in ct.ids])
        return _full_core(self.params, ct.data, sk_stack, ct.level)
