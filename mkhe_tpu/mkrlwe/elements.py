"""Multi-key ciphertext elements.

TPU rebuild of mkrlwe/elements.go: the reference's
`Ciphertext{Value map[string]*ring.Poly}` (a "0" slot plus one polynomial
per party) becomes a dense uint32[k+1, L, N] array with a static, sorted
tuple of party ids — per-party map loops turn into batched array ops, and
jit specializes per party-set (the party set is compile-time metadata, as
in the reference's test matrix which fixes party counts per run).

Polynomials are in coefficient domain unless stated otherwise (matching
the reference's convention for ciphertexts at rest).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .params import Parameters

U32 = jnp.uint32


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["data"],
    meta_fields=["ids"],
)
@dataclasses.dataclass(frozen=True)
class Ciphertext:
    """data[0] is the '0' component; data[1 + i] belongs to ids[i]."""
    ids: Tuple[str, ...]
    data: jax.Array  # uint32 (k+1, L, N), coefficient domain

    @property
    def level(self) -> int:
        return self.data.shape[-2] - 1

    @property
    def c0(self) -> jax.Array:
        return self.data[0]

    def party(self, pid: str) -> jax.Array:
        return self.data[1 + self.ids.index(pid)]


def new_ciphertext(params: Parameters, ids: Tuple[str, ...], level: int
                   ) -> Ciphertext:
    ids = tuple(sorted(ids))
    return Ciphertext(ids=ids, data=jnp.zeros(
        (len(ids) + 1, level + 1, params.n), U32))


def union_ids(a: Tuple[str, ...], b: Tuple[str, ...]) -> Tuple[str, ...]:
    return tuple(sorted(set(a) | set(b)))


def pad_ciphertext(ct: Ciphertext, ids: Tuple[str, ...]) -> Ciphertext:
    """Zero-pad to a superset id tuple (reference PadCiphertext,
    mkrlwe/elements.go:91-105)."""
    new_ids = union_ids(ct.ids, ids)
    if new_ids == ct.ids:
        return ct
    k1, L, n = len(new_ids) + 1, ct.data.shape[-2], ct.data.shape[-1]
    out = jnp.zeros((k1, L, n), U32)
    out = out.at[0].set(ct.data[0])
    for i, pid in enumerate(ct.ids):
        out = out.at[1 + new_ids.index(pid)].set(ct.data[1 + i])
    return Ciphertext(ids=new_ids, data=out)


def drop_level(ct: Ciphertext, levels: int) -> Ciphertext:
    """Truncate the top `levels` limbs (reference DropLevel)."""
    if levels <= 0:
        return ct
    return Ciphertext(ids=ct.ids, data=ct.data[..., :ct.level + 1 - levels, :])


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["digits"],
    meta_fields=["ids"],
)
@dataclasses.dataclass(frozen=True)
class HoistedCiphertext:
    """Cached gadget decomposition of each party polynomial, NTT domain:
    digits uint32 (k, beta, Lqp, N). Reference: HoistedCiphertext
    (mkrlwe/elements.go:5-15)."""
    ids: Tuple[str, ...]
    digits: jax.Array
