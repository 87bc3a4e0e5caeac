"""Coefficient-axis-sharded multi-key multiplication.

The latency-scaling axis for a single big op: shard the coefficient
dimension N over the mesh and run the ENTIRE KKLSS mult+relin inside one
shard_map. Every step of the mult is coefficient-local — gadget
decomposition and ModDown contract over the limb axis, the digit products
and tensor terms are pointwise — EXCEPT the NTT butterflies, which rings
carrying `dist=(axis, C)` metadata (Ring.with_dist) turn into log2(C)
ppermute chunk exchanges per NTT (hypercube stage split). Total collective
traffic per mult: (#NTT calls) * log2(C) chunk exchanges over ICI;
everything else scales embarrassingly.

Complements party_mul.py (throughput axis over parties/hosts): a pod
deployment shards parties over DCN and coefficients+limbs over ICI
(SURVEY.md §5.7-5.8).

Bit-identical to mkrlwe.keyswitch.mul_and_relin (tests/test_coeff_mul.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..mkrlwe import keyswitch as ksw
from ..mkrlwe.elements import Ciphertext, union_ids
from ..mkrlwe.params import Parameters
from . import dist_ntt


# jitted SPMD programs, one per (params, party sets, level, mesh, axis):
# eager shard_map would dispatch every enclosed op through the SPMD
# machinery one at a time — jit(shard_map(body)) is the canonical form.
_FN_CACHE = {}


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

    key = (params.logn, params.q_moduli, params.p_moduli, params.gamma,
           params.crs_seed, ct0.ids, ct1.ids, level, mesh, axis)
    fn = _FN_CACHE.get(key)
    if fn is None:
        # rings with dist metadata: every ntt/intt inside the body runs
        # the hypercube cross-device stages (trace-visible dispatch: dist
        # is part of the Ring pytree treedef, so jit caches can't
        # cross-contaminate)
        params_d = dataclasses.replace(
            params,
            ring_q=params.ring_q.with_dist(axis, C),
            ring_p=params.ring_p.with_dist(axis, C),
            ring_qp=params.ring_qp.with_dist(axis, C))

        last = lambda nd: P(*([None] * (nd - 1) + [axis]))
        ids0, ids1 = ct0.ids, ct1.ids

        def body(d0, d1, b, d, v, u_key):
            out = ksw.mul_and_relin(
                params_d, Ciphertext(ids=ids0, data=d0),
                Ciphertext(ids=ids1, data=d1), (b, d, v), level,
                u_key=u_key)
            return out.data

        fn = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(last(3), last(3), last(4), last(4), last(4),
                      last(3)),
            out_specs=last(3)))
        _FN_CACHE[key] = fn
    out = fn(ct0.data[..., :level + 1, :], ct1.data[..., :level + 1, :],
             b, d, v, u_key)  # mul_and_relin level-slices keys itself
    return Ciphertext(ids=ids, data=out)
