"""Party-axis-sharded multi-key multiplication and rotation.

The KKLSS ciphertext grows linearly in the party count and every per-party
term of MulAndRelin (keyswitch.go:122-230) and Rotate (keyswitch.go:234-298)
is independent until the accumulations into x, y and c0 — exactly a psum.
This module runs those ops under shard_map with the party axis distributed
across devices (the cross-host axis in a pod deployment; parties ride DCN,
limb/coeff ride ICI — SURVEY.md §5.7-5.8):

  device d holds parties P_d:   dec_k, relin/rot keys for k in P_d
  x = psum_d( sum_{k in P_d} d_k . dec_k )      (replicated after psum)
  y likewise; tensor c0 terms replicated; per-party outputs stay local;
  out_0 = tensor_00 + psum_d( sum_{k in P_d} Ext(Dec t_k, v_k) ).

Covers the reference's general shapes: distinct operands (id sets unioned
by zero-padding, elements.go:91-105), hoisted operands
(keyswitch_hoisted.go:44-179), the square fast path, and RotateHoisted
(keyswitch_hoisted.go:183-247).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..mkrlwe import keyswitch as ksw
from ..mkrlwe.elements import (Ciphertext, HoistedCiphertext, pad_ciphertext,
                               union_ids)
from ..mkrlwe.params import Parameters


def _local_mul(rp: Parameters, level: int, axis: str, square: bool,
               hoisted0: bool, hoisted1: bool, c0_pair, parties0, parties1,
               dig0, dig1, b, d, v, u_key):
    """shard_map body: parties0/parties1 (k_loc, L, N) are this device's
    shard of the party components; c0_pair (2, L, N) replicated; dig0/dig1
    are this device's shard of precomputed hoisted digits (used when
    hoisted0/hoisted1, else ignored placeholders)."""
    ring_q = rp.ring_q_at(level)
    ring_qp = rp.ring_qp_at(level)

    dec0 = (ksw.slice_digits(rp, dig0, level) if hoisted0
            else ksw.decompose(rp, parties0, level))
    if square:
        dec1 = dec0
    else:
        dec1 = (ksw.slice_digits(rp, dig1, level) if hoisted1
                else ksw.decompose(rp, parties1, level))

    # _aggregate_keys returns CANONICAL Montgomery-form partials (the d/b
    # keys carry the extra Montgomery factor — see keygen._relin_b_core),
    # so the uint32 psum has headroom D*q < 2^32 for any D <= 8 shards
    # with q < 2^29 (ADVICE r3), and no to_mont pass is needed; one
    # Barrett reduce canonicalizes the psum.
    x = ring_qp.reduce(jax.lax.psum(
        ksw._aggregate_keys(rp, dec0, ksw.slice_swk(rp, d, level), level),
        axis))
    y = ring_qp.reduce(jax.lax.psum(
        ksw._aggregate_keys(rp, dec1, ksw.slice_swk(rp, b, level), level),
        axis))

    # tensor terms (c0 ops replicated; party terms local)
    nt00 = ring_q.ntt(c0_pair[0])
    nt10 = nt00 if square else ring_q.ntt(c0_pair[1])
    nt00m = ring_q.to_mont(nt00)
    nt10m = nt00m if square else ring_q.to_mont(nt10)
    out0 = ring_q.intt(ring_q.mul_mont(nt10, nt00m))

    ntp0 = ring_q.ntt(parties0)
    ntp1 = ntp0 if square else ring_q.ntt(parties1)
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


def mul_and_relin_party_sharded(
        rp: Parameters, ct0: Ciphertext, rlk_stacked, mesh: Mesh,
        axis: str = "party",
        ct1: Optional[Ciphertext] = None,
        h0: Optional[HoistedCiphertext] = None,
        h1: Optional[HoistedCiphertext] = None) -> Ciphertext:
    """Multi-key mult with the party axis sharded over `mesh`.

    General MulAndRelin[Hoisted] (keyswitch.go:122-230 /
    keyswitch_hoisted.go:44-179) under party sharding: ct1 may be omitted
    (square fast path, one decomposition), may carry a different id set
    (both operands are zero-padded to the union, as the reference's
    PadCiphertext callers do), and either operand may come with its cached
    hoisted decomposition. The union party count must divide the mesh axis
    size. Returns the same result as ksw.mul_and_relin up to the documented
    psum-before-ModDown rounding (<= 1 ulp).
    """
    level = ct0.level
    square = ct1 is None or (ct1.data is ct0.data and ct1.ids == ct0.ids)
    if square:
        ct1 = ct0
    ids = union_ids(ct0.ids, ct1.ids)
    if ids != ct0.ids or ids != ct1.ids:
        # zero-pad to the union; cached hoisted digits are operand-indexed
        # so they cannot be reused across a pad — fall back to in-shard
        # decomposition (zero polys decompose to zero digits).
        ct0 = pad_ciphertext(ct0, ids)
        ct1 = pad_ciphertext(ct1, ids)
        h0 = h1 = None
    k = len(ids)
    nshards = mesh.shape[axis]
    assert k % nshards == 0, "party count must divide the mesh axis"
    b, d, v = rlk_stacked
    u_key = rp.crs[-1][:rp.beta(rp.max_level)]

    c0_pair = jnp.stack([ct0.data[0], ct1.data[0]])
    parties0 = ct0.data[1:]
    parties1 = ct1.data[1:]
    placeholder = jnp.zeros((k, 1, 1, 1), parties0.dtype)
    dig0 = h0.digits if h0 is not None else placeholder
    dig1 = h1.digits if h1 is not None else placeholder

    fn = functools.partial(_local_mul, rp, level, axis, square,
                           h0 is not None, h1 is not None)
    mapped = jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P(axis)),
        check_vma=False,
    ))
    out0, out_party = mapped(c0_pair, parties0, parties1, dig0, dig1,
                             b, d, v, u_key)
    data = jnp.concatenate([out0[None], out_party], axis=0)
    return Ciphertext(ids=ids, data=data)


def _local_rotate(rp: Parameters, level: int, axis: str, hoisted: bool,
                  c0, parties, dig, rtk, a_crs, perm_src, perm_sign):
    """shard_map body for rotation: per-party external products local,
    c0 correction psummed, Galois permutation applied in-shard (the coeff
    axis is unsharded here)."""
    ring_q = rp.ring_q_at(level)
    ring_qp = rp.ring_qp_at(level)
    dec = (ksw.slice_digits(rp, dig, level) if hoisted
           else ksw.decompose(rp, parties, level))
    rks = ksw.slice_swk(rp, rtk, level)
    s_local = ksw._sum_parties_ntt(rp, dec, rks, level)
    s_sum = jax.lax.psum(s_local, axis)
    c0_out = ring_q.add(c0, ksw.mod_down_qp(rp, ring_qp.reduce(s_sum),
                                            level))
    ci = ksw.external_product(rp, dec, ksw.slice_swk(rp, a_crs, level),
                              level)
    out = jnp.concatenate([c0_out[None], ci], axis=0)
    g = jnp.take(out, perm_src, axis=-1)
    out = jnp.where(perm_sign[None, :] == 1, ring_q.neg(g), g)
    return out[0], out[1:]


def rotate_party_sharded(rp: Parameters, ct: Ciphertext, rot_idx: int,
                         rtk_stacked: jax.Array, mesh: Mesh,
                         axis: str = "party",
                         h: Optional[HoistedCiphertext] = None
                         ) -> Ciphertext:
    """Slot rotation with the party axis sharded over `mesh`
    (keyswitch.go:234-298 / RotateHoisted keyswitch_hoisted.go:183-247):
      out_0 = ct_0 + psum_d sum_{k in P_d} Ext(ct_k, rtk_k)
      out_k = Ext(ct_k, a_rot)                     (local)
    followed by the Galois coefficient permutation with sign fold."""
    level = ct.level
    k = len(ct.ids)
    nshards = mesh.shape[axis]
    assert k % nshards == 0, "party count must divide the mesh axis"
    while rot_idx < 0:
        rot_idx += rp.n // 2
    a_crs = rp.crs[rot_idx][:rp.beta(rp.max_level)]
    src, sign = ksw.rotation_tables(rp, rot_idx)
    placeholder = jnp.zeros((k, 1, 1, 1), ct.data.dtype)
    dig = h.digits if h is not None else placeholder

    fn = functools.partial(_local_rotate, rp, level, axis, h is not None)
    mapped = jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(), P(), P()),
        out_specs=(P(), P(axis)),
        check_vma=False,
    ))
    c0_out, ci = mapped(ct.data[0], ct.data[1:], dig, rtk_stacked,
                        a_crs, src, sign)
    return Ciphertext(ids=ct.ids,
                      data=jnp.concatenate([c0_out[None], ci], axis=0))
