"""Key types and per-id registries (TPU rebuild of mkrlwe/keys.go).

Storage conventions (uniform across the framework):
  - secret keys / switching keys / CRS: NTT domain, Montgomery form
  - switching keys: uint32 (beta, Lq+Lp, N)
  - public keys: (2, Lq+Lp, N) NTT+Montgomery, pk = (-a s + e, a)
Key *sets* are plain python dicts id -> key; batched evaluator ops stack
the needed subset along a party axis at trace time.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def _keyclass(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    data = [f for f in fields if f not in ("id", "rot_idx")]
    meta = [f for f in fields if f in ("id", "rot_idx")]
    return functools.partial(
        jax.tree_util.register_dataclass,
        data_fields=data, meta_fields=meta)(cls)


@_keyclass
@dataclasses.dataclass(frozen=True)
class SecretKey:
    id: str
    data: jax.Array  # (Lq+Lp, N) NTT + Montgomery


@_keyclass
@dataclasses.dataclass(frozen=True)
class PublicKey:
    id: str
    data: jax.Array  # (2, Lq+Lp, N) NTT + Montgomery


@_keyclass
@dataclasses.dataclass(frozen=True)
class SwitchingKey:
    data: jax.Array  # (beta, Lq+Lp, N) NTT + Montgomery
    id: str = ""


@_keyclass
@dataclasses.dataclass(frozen=True)
class RelinearizationKey:
    """KKLSS triple (b, d, v), each a switching-key-shaped vector
    (mkrlwe/keys.go:34-37).

    Storage convention: v is NTT+Montgomery like every other key; b and d
    are NTT + DOUBLE-Montgomery (value * 2^64 mod q) so the x/y key
    aggregation's single Montgomery reduction emits Montgomery form
    directly (keygen._relin_b_core, keyswitch._aggregate_keys)."""
    b: jax.Array
    d: jax.Array
    v: jax.Array
    id: str = ""


@_keyclass
@dataclasses.dataclass(frozen=True)
class RotationKey:
    data: jax.Array
    id: str = ""
    rot_idx: int = 0


@_keyclass
@dataclasses.dataclass(frozen=True)
class ConjugationKey:
    data: jax.Array
    id: str = ""


class KeySet:
    """Generic id -> key registry (the reference's *Set types)."""

    def __init__(self):
        self.value: Dict[str, object] = {}

    def add(self, key):
        self.value[key.id] = key

    def get(self, pid: str):
        if pid not in self.value:
            raise KeyError(f"no key for id {pid!r}")
        return self.value[pid]

    def delete(self, pid: str):
        self.value.pop(pid, None)

    def ids(self) -> Tuple[str, ...]:
        return tuple(sorted(self.value))


class SecretKeySet(KeySet):
    pass


class PublicKeySet(KeySet):
    pass


class RelinearizationKeySet(KeySet):
    def __init__(self):
        super().__init__()
        self._cache = {}

    def add(self, key):
        super().add(key)
        self._cache.clear()

    def stacked(self, ids: Tuple[str, ...]):
        """(b, d, v) stacked over ids: each (k, beta, Lqp, N). Memoized so
        repeated evaluator calls reuse the device arrays."""
        if ids not in self._cache:
            b = jnp.stack([self.value[i].b for i in ids])
            d = jnp.stack([self.value[i].d for i in ids])
            v = jnp.stack([self.value[i].v for i in ids])
            self._cache[ids] = (b, d, v)
        return self._cache[ids]


class RotationKeySet:
    def __init__(self):
        self.value: Dict[str, Dict[int, RotationKey]] = {}

    def add(self, key: RotationKey):
        self.value.setdefault(key.id, {})[key.rot_idx] = key

    def get(self, pid: str, rot_idx: int) -> RotationKey:
        return self.value[pid][rot_idx]

    def has(self, pid: str, rot_idx: int) -> bool:
        return pid in self.value and rot_idx in self.value[pid]

    def stacked(self, ids: Tuple[str, ...], rot_idx: int):
        key = (ids, rot_idx)
        cache = getattr(self, "_cache", None)
        if cache is None:
            cache = self._cache = {}
        if key not in cache:
            cache[key] = jnp.stack(
                [self.value[i][rot_idx].data for i in ids])
        return cache[key]


class ConjugationKeySet(KeySet):
    def stacked(self, ids: Tuple[str, ...]):
        return jnp.stack([self.value[i].data for i in ids])
