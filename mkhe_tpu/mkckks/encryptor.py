"""CKKS encryptor: canonical-embedding encode + mkrlwe public-key encrypt
(TPU rebuild of mkckks/encryptor.go)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import mkrlwe
from .params import Parameters
from .elements import Ciphertext, Message
from . import encoder


class Encryptor:
    def __init__(self, params: Parameters, seed: int = 2):
        self.params = params
        self._enc = mkrlwe.Encryptor(params.rlwe, seed=seed)

    def encode_msg(self, msg: Message, level: int | None = None,
                   scale: float | None = None) -> np.ndarray:
        """Message -> coeff-domain plaintext (Lq, N) uint32
        (EncodeMsgNew, mkckks/encryptor.go:60-64)."""
        p = self.params
        if level is None:
            level = p.max_level
        if scale is None:
            scale = p.scale
        moduli = p.rlwe.q_moduli[:level + 1]
        return encoder.encode(msg.value, scale, moduli, p.logn,
                              logslots=p.logslots)

    def encrypt_msg(self, msg: Message, pk: mkrlwe.PublicKey,
                    level: int | None = None) -> Ciphertext:
        """Encode then encrypt (EncryptMsgNew, mkckks/encryptor.go:51-58)."""
        p = self.params
        if level is None:
            level = p.max_level
        pt = jnp.asarray(self.encode_msg(msg, level))
        ct = self._enc.encrypt(pt, pk, level=level)
        return Ciphertext(ct=ct, scale=p.scale)

    def encrypt_ptxt(self, pt, pk: mkrlwe.PublicKey, scale: float
                     ) -> Ciphertext:
        ct = self._enc.encrypt(jnp.asarray(pt), pk)
        return Ciphertext(ct=ct, scale=scale)
