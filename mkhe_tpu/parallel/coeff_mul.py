"""Coefficient-axis-sharded multi-key multiplication.

The latency-scaling axis for a single big op: shard the coefficient
dimension N over the mesh and run the ENTIRE KKLSS mult+relin inside one
shard_map. Every step of the mult is coefficient-local — gadget
decomposition and ModDown contract over the limb axis, the digit products
and tensor terms are pointwise — EXCEPT the NTT butterflies, which the
dist_ntt.coeff_sharded() context turns into log2(C) ppermute chunk
exchanges per NTT (hypercube stage split). Total collective traffic per
mult: (#NTT calls) * log2(C) chunk exchanges over ICI; everything else
scales embarrassingly.

Complements party_mul.py (throughput axis over parties/hosts): a pod
deployment shards parties over DCN and coefficients+limbs over ICI
(SURVEY.md §5.7-5.8).

Bit-identical to mkrlwe.keyswitch.mul_and_relin (tests/test_coeff_mul.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..mkrlwe import keyswitch as ksw
from ..mkrlwe.elements import Ciphertext, union_ids
from ..mkrlwe.params import Parameters
from . import dist_ntt


def mul_and_relin_sharded(params: Parameters, ct0: Ciphertext,
                          ct1: Ciphertext, rlk_stacked, level: int,
                          mesh: Mesh, axis: str = "coeff") -> Ciphertext:
    """KKLSS mult+relin with the coefficient axis sharded over `mesh`
    axis `axis`. Drop-in equal to ksw.mul_and_relin (exact same digit
    arithmetic; the NTTs run their cross-device stages with ppermute)."""
    C = mesh.shape[axis]
    ids = union_ids(ct0.ids, ct1.ids)
    b, d, v = rlk_stacked
    u_key = params.crs_at(-1, level)

    last = lambda nd: P(*([None] * (nd - 1) + [axis]))

    def body(d0, d1, b, d, v, u_key):
        with dist_ntt.coeff_sharded(axis, C):
            out = ksw.mul_and_relin(
                params, Ciphertext(ids=ct0.ids, data=d0),
                Ciphertext(ids=ct1.ids, data=d1), (b, d, v), level,
                u_key=u_key)
        return out.data

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(last(3), last(3), last(4), last(4), last(4), last(3)),
        out_specs=last(3))
    out = fn(ct0.data[..., :level + 1, :], ct1.data[..., :level + 1, :],
             b, d, v, u_key)  # mul_and_relin level-slices keys itself
    return Ciphertext(ids=ids, data=out)
