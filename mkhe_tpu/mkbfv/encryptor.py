"""BFV encryptor (TPU rebuild of mkbfv/encryptor.go): integer slot encode
(scaled by Q/t) + mkrlwe public-key encryption."""

from __future__ import annotations

import jax.numpy as jnp

from .. import mkrlwe
from .params import Parameters
from . import encoder


class Encryptor:
    def __init__(self, params: Parameters, seed: int = 2):
        self.params = params
        self._enc = mkrlwe.Encryptor(params.rlwe, seed=seed)

    def encrypt_msg(self, values, pk: mkrlwe.PublicKey) -> mkrlwe.Ciphertext:
        pt = jnp.asarray(encoder.encode(self.params, values))
        return self._enc.encrypt(pt, pk)
