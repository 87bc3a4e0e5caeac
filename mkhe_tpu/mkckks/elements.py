"""CKKS ciphertext (multi-key ciphertext + scale) and complex message
(TPU rebuild of mkckks/elements.go)."""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import numpy as np

from ..mkrlwe.elements import Ciphertext as RlweCiphertext


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["ct"], meta_fields=["scale"],
)
@dataclasses.dataclass(frozen=True)
class Ciphertext:
    ct: RlweCiphertext
    scale: float

    @property
    def ids(self) -> Tuple[str, ...]:
        return self.ct.ids

    @property
    def level(self) -> int:
        return self.ct.level


@dataclasses.dataclass
class Message:
    value: np.ndarray  # complex128 (slots,)


def new_message(params, values=None) -> Message:
    if values is None:
        values = np.zeros(params.slots, np.complex128)
    return Message(value=np.asarray(values, np.complex128))
