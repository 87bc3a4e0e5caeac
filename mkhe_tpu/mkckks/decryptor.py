"""CKKS decryptor: partial/full multi-key decrypt + decode
(TPU rebuild of mkckks/decryptor.go)."""

from __future__ import annotations

import numpy as np

from .. import mkrlwe
from .params import Parameters
from .elements import Ciphertext, Message
from . import encoder


class Decryptor:
    def __init__(self, params: Parameters):
        self.params = params
        self._dec = mkrlwe.Decryptor(params.rlwe)

    def partial_decrypt(self, ct: Ciphertext, sk: mkrlwe.SecretKey
                        ) -> Ciphertext:
        return Ciphertext(ct=self._dec.partial_decrypt(ct.ct, sk),
                          scale=ct.scale)

    def decrypt(self, ct: Ciphertext, sk_set: mkrlwe.SecretKeySet,
                exact: bool | None = None) -> Message:
        """Decrypt + decode. exact=None (default) lets decode pick the
        safe per-level path: exact CRT at level <= 2, where the fast
        2-limb float path cannot self-check |coeff| < q0*q1/2 (ADVICE
        r4 #1); exact=False is an explicit opt-in to the fast path."""
        p = self.params
        pt = np.asarray(self._dec.decrypt(ct.ct, sk_set))
        moduli = p.rlwe.q_moduli[:ct.level + 1]
        z = encoder.decode(pt, ct.scale, moduli, p.logn,
                           logslots=p.logslots, exact=exact)
        return Message(value=z)
