"""BFV relinearization keys (TPU rebuild of mkbfv/keys.go).

The reference stores a *pair* of mkrlwe relin keys (one per half of the
double basis R). Here the pair is fused: b and d are length-2*beta
switching-key vectors (first beta digits decompose over the Q half of R,
last beta over the QMul half), and v is the shared length-beta vector used
by the final Q-basis fixup products (mkbfv/keyswitch.go:230-250).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["b", "d", "v"], meta_fields=["id"],
)
@dataclasses.dataclass(frozen=True)
class RelinearizationKey:
    b: jax.Array  # (2*beta, Lqp, N) NTT+Mont
    d: jax.Array  # (2*beta, Lqp, N)
    v: jax.Array  # (beta, Lqp, N)
    id: str = ""


class RelinearizationKeySet:
    def __init__(self):
        self.value: Dict[str, RelinearizationKey] = {}
        self._cache = {}

    def add(self, key: RelinearizationKey):
        self.value[key.id] = key
        self._cache.clear()

    def get(self, pid: str) -> RelinearizationKey:
        return self.value[pid]

    def stacked(self, ids: Tuple[str, ...]):
        if ids not in self._cache:
            b = jnp.stack([self.value[i].b for i in ids])
            d = jnp.stack([self.value[i].d for i in ids])
            v = jnp.stack([self.value[i].v for i in ids])
            self._cache[ids] = (b, d, v)
        return self._cache[ids]
