"""Distributed decryption (TPU rebuild of mkrlwe/decryptor.go).

PartialDecrypt is the MPC primitive: party i computes c_0 += c_i * s_i and
deletes its component; full Decrypt folds all parties' partial decryptions
(in a real deployment each party runs its own partial decrypt locally —
the process boundary of the protocol crosses here, cf. SURVEY.md §3.3).
"""

from __future__ import annotations

import jax.numpy as jnp

from .params import Parameters
from .elements import Ciphertext
from .keys import SecretKey, SecretKeySet


class Decryptor:
    def __init__(self, params: Parameters):
        self.params = params

    def partial_decrypt(self, ct: Ciphertext, sk: SecretKey) -> Ciphertext:
        p = self.params
        level = ct.level
        ring = p.ring_q_at(level)
        i = ct.ids.index(sk.id)
        ci = ct.data[1 + i]
        prod = ring.intt(ring.mul_mont(ring.ntt(ci),
                                       sk.data[:level + 1]))
        c0 = ring.add(ct.data[0], prod)
        rest_ids = ct.ids[:i] + ct.ids[i + 1:]
        rest = jnp.concatenate(
            [c0[None], ct.data[1:1 + i], ct.data[2 + i:]], axis=0)
        return Ciphertext(ids=rest_ids, data=rest)

    def decrypt(self, ct: Ciphertext, sk_set: SecretKeySet):
        """Returns the coeff-domain plaintext polynomial (Lq, N) uint32."""
        cur = ct
        for pid in ct.ids:
            cur = self.partial_decrypt(cur, sk_set.get(pid))
        assert cur.ids == ()
        return cur.data[0]
