"""Party-axis-sharded multi-key multiplication.

The KKLSS ciphertext grows linearly in the party count and every per-party
term of MulAndRelin is independent until the accumulations into x, y and
c0 (keyswitch.go:156-229) — exactly a psum. This module runs the
multiplication under shard_map with the party axis distributed across
devices (the cross-host axis in a pod deployment; parties ride DCN,
limb/coeff ride ICI — SURVEY.md §5.7-5.8):

  device d holds parties P_d:   dec_k, relin keys for k in P_d
  x = psum_d( sum_{k in P_d} d_k . dec_k )      (replicated after psum)
  y likewise; tensor c0 terms replicated; per-party outputs stay local;
  out_0 = tensor_00 + psum_d( sum_{k in P_d} Ext(Dec t_k, v_k) ).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mkrlwe import keyswitch as ksw
from ..mkrlwe.elements import Ciphertext, union_ids
from ..mkrlwe.params import Parameters


def _local_mul(rp: Parameters, level: int, axis: str, c0_pair, parties0,
               parties1, b, d, v, u_key):
    """shard_map body: parties0/parties1 (k_loc, L, N) are this device's
    shard of the party components; c0_pair (2, L, N) replicated."""
    ring_q = rp.ring_q_at(level)
    ring_qp = rp.ring_qp_at(level)

    dec0 = ksw.decompose(rp, parties0, level)
    dec1 = ksw.decompose(rp, parties1, level)

    x = jax.lax.psum(
        ksw._aggregate_keys(rp, dec0, ksw.slice_swk(rp, d, level), level),
        axis)
    y = jax.lax.psum(
        ksw._aggregate_keys(rp, dec1, ksw.slice_swk(rp, b, level), level),
        axis)
    x = ring_qp.to_mont(ring_qp.reduce(x))
    y = ring_qp.to_mont(ring_qp.reduce(y))

    # tensor terms (c0 ops replicated; party terms local)
    nt00 = ring_q.ntt(c0_pair[0])
    nt10 = ring_q.ntt(c0_pair[1])
    nt00m = ring_q.to_mont(nt00)
    nt10m = ring_q.to_mont(nt10)
    out0 = ring_q.intt(ring_q.mul_mont(nt10, nt00m))

    ntp0 = ring_q.ntt(parties0)
    ntp1 = ring_q.ntt(parties1)
    out_party = ring_q.intt(
        ring_q.add(ring_q.mul_mont(ntp0, nt10m[None]),
                   ring_q.mul_mont(ntp1, nt00m[None])))

    # out_k += Ext(ct1_k, x)
    z1 = ksw.external_product(rp, dec1, x, level)
    out_party = ring_q.add(out_party, z1)

    # t_k = Ext(ct0_k, y); out0 += psum Ext(Dec t_k, v_k); out_k += Ext(.., u)
    t = ksw.external_product(rp, dec0, y, level)
    dec_t = ksw.decompose(rp, t, level)
    v_local = ksw._sum_parties_ntt(rp, dec_t,
                                   ksw.slice_swk(rp, v, level), level)
    v_sum = jax.lax.psum(v_local, axis)
    out0 = ring_q.add(out0, ksw.mod_down_qp(rp, ring_qp.reduce(v_sum),
                                            level))
    zu = ksw.external_product(rp, dec_t, ksw.slice_swk(rp, u_key, level),
                              level)
    out_party = ring_q.add(out_party, zu)
    return out0, out_party


def mul_and_relin_party_sharded(rp: Parameters, ct: Ciphertext,
                                rlk_stacked, mesh: Mesh,
                                axis: str = "party") -> Ciphertext:
    """Square-case multi-key mult with the party axis sharded over `mesh`
    (requires len(ids) divisible by the axis size). Returns the same
    result as ksw.mul_and_relin up to the documented psum-before-ModDown
    rounding (<= 1 ulp)."""
    level = ct.level
    ids = ct.ids
    k = len(ids)
    nshards = mesh.shape[axis]
    assert k % nshards == 0, "party count must divide the mesh axis"
    b, d, v = rlk_stacked
    u_key = rp.crs[-1][:rp.beta(rp.max_level)]

    c0_pair = jnp.stack([ct.data[0], ct.data[0]])
    parties = ct.data[1:]

    fn = functools.partial(_local_mul, rp, level, axis)
    mapped = jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P(axis)),
        check_vma=False,
    ))
    out0, out_party = mapped(c0_pair, parties, parties, b, d, v, u_key)
    data = jnp.concatenate([out0[None], out_party], axis=0)
    return Ciphertext(ids=ids, data=data)
