"""Multi-key BFV evaluator (TPU rebuild of mkbfv/evaluator.go)."""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .. import mkrlwe
from ..mkrlwe import keyswitch as ksw
from ..mkrlwe.elements import Ciphertext, union_ids
from .params import Parameters
from .keys import RelinearizationKeySet
from . import basis as bfv_basis
from . import keyswitch as bfv_ksw


@functools.partial(jax.jit, static_argnames=())
def _mul_relin_core(bp, ct0, ct1, b, d, v):
    rp = bp.rlwe
    # lift op0 to R; rescale op1 by QMul/Q into R (evaluator.go:118-137)
    d0r = bfv_basis.mod_up_q_to_r(bp, ct0.data)
    d1r = bfv_basis.rescale_q_to_r(bp, ct1.data)
    ct0r = Ciphertext(ids=ct0.ids, data=d0r)
    ct1r = Ciphertext(ids=ct1.ids, data=d1r)
    return bfv_ksw.mul_and_relin_bfv(bp, ct0r, ct1r, (b, d, v))


@functools.partial(jax.jit, static_argnames=("ids0", "ids1"))
def _mul_relin_batched_core(bp, data0, data1, b, d, v, ids0, ids1):
    def one(d0, d1):
        ct0 = Ciphertext(ids=ids0, data=bfv_basis.mod_up_q_to_r(bp, d0))
        ct1 = Ciphertext(ids=ids1, data=bfv_basis.rescale_q_to_r(bp, d1))
        return bfv_ksw.mul_and_relin_bfv(bp, ct0, ct1, (b, d, v)).data
    return jax.vmap(one)(data0, data1)


@jax.jit
def _hoist_core(bp, ct):
    return bfv_ksw.hoist(bp, ct)


@jax.jit
def _mul_relin_hoisted_core(bp, h0, h1, b, d, v):
    ct0r = Ciphertext(ids=h0.ids, data=h0.lift)
    ct1r = Ciphertext(ids=h1.ids, data=h1.resc)
    return bfv_ksw.mul_and_relin_bfv(bp, ct0r, ct1r, (b, d, v),
                                     dec0=h0.dec_lift, dec1=h1.dec_resc)


@functools.partial(jax.jit, static_argnames=("map_a", "map_b", "op"))
def _binary_core(rp, a_data, b_data, map_a, map_b, op):
    ring = rp.ring_q
    out = []
    for ia, ib in zip(map_a, map_b):
        if ia >= 0 and ib >= 0:
            out.append(ring.add(a_data[ia], b_data[ib]) if op == "add"
                       else ring.sub(a_data[ia], b_data[ib]))
        elif ia >= 0:
            out.append(a_data[ia])
        else:
            out.append(b_data[ib] if op == "add" else ring.neg(b_data[ib]))
    return jnp.stack(out)


class Evaluator:
    def __init__(self, params: Parameters):
        self.params = params

    def _maps(self, ids, a, b):
        return (tuple([0] + [1 + a.index(i) if i in a else -1 for i in ids]),
                tuple([0] + [1 + b.index(i) if i in b else -1 for i in ids]))

    def add_new(self, ct0: Ciphertext, ct1: Ciphertext) -> Ciphertext:
        ids = union_ids(ct0.ids, ct1.ids)
        ma, mb = self._maps(ids, ct0.ids, ct1.ids)
        data = _binary_core(self.params.rlwe, ct0.data, ct1.data,
                            ma, mb, "add")
        return Ciphertext(ids=ids, data=data)

    def sub_new(self, ct0: Ciphertext, ct1: Ciphertext) -> Ciphertext:
        ids = union_ids(ct0.ids, ct1.ids)
        ma, mb = self._maps(ids, ct0.ids, ct1.ids)
        data = _binary_core(self.params.rlwe, ct0.data, ct1.data,
                            ma, mb, "sub")
        return Ciphertext(ids=ids, data=data)

    def mul_relin_new(self, ct0: Ciphertext, ct1: Ciphertext,
                      rlk_set: RelinearizationKeySet) -> Ciphertext:
        ids = union_ids(ct0.ids, ct1.ids)
        b, d, v = rlk_set.stacked(ids)
        return _mul_relin_core(self.params, ct0, ct1, b, d, v)

    def mul_relin_batched_new(self, cts0, cts1,
                              rlk_set: RelinearizationKeySet):
        """Throughput-oriented batched MulRelin: vmap B independent
        mult+relin pipelines into one XLA program (serving path; no
        reference analog — the Go library is one-op-at-a-time). Each
        batch must share its id tuple; results are bit-identical to
        per-pair mul_relin_new."""
        cts0, cts1 = list(cts0), list(cts1)
        if len(cts0) != len(cts1) or not cts0:
            raise ValueError("need equal-length non-empty batches")
        for lst in (cts0, cts1):
            if any(c.ids != lst[0].ids for c in lst):
                raise ValueError("batch must share the id tuple")
        ids = union_ids(cts0[0].ids, cts1[0].ids)
        b, d, v = rlk_set.stacked(ids)
        data0 = jnp.stack([c.data for c in cts0])
        data1 = jnp.stack([c.data for c in cts1])
        out = _mul_relin_batched_core(self.params, data0, data1, b, d, v,
                                      ids0=cts0[0].ids, ids1=cts1[0].ids)
        return [Ciphertext(ids=ids, data=out[i])
                for i in range(len(cts0))]

    def hoisted_form(self, ct: Ciphertext) -> bfv_ksw.HoistedCiphertext:
        """Precompute the double-basis lifts + gadget decompositions of
        `ct` so repeated multiplications skip them (reference caches these
        in the rlkSet pools, mkbfv/evaluator.go:118-144)."""
        return _hoist_core(self.params, ct)

    def mul_relin_hoisted_new(self, h0: bfv_ksw.HoistedCiphertext,
                              h1: bfv_ksw.HoistedCiphertext,
                              rlk_set: RelinearizationKeySet) -> Ciphertext:
        """MulAndRelinBFVHoisted (mkbfv/keyswitch_hoisted.go:39-207):
        multiply two precomputed hoisted forms."""
        ids = union_ids(h0.ids, h1.ids)
        b, d, v = rlk_set.stacked(ids)
        return _mul_relin_hoisted_core(self.params, h0, h1, b, d, v)

    def rotate_new(self, ct: Ciphertext, rot_idx: int, rtk_set
                   ) -> Ciphertext:
        p = self.params
        nh = p.n // 2
        rot_idx %= nh
        if rot_idx == 0:
            return ct
        if rot_idx in p.rlwe.crs:
            from ..mkckks.evaluator import _rotate_core, _dummy_hoisted
            rks = rtk_set.stacked(ct.ids, rot_idx)
            a = p.rlwe.crs_at(rot_idx, ct.level)
            src, sign = ksw.rotation_tables(p.rlwe, rot_idx)
            return _rotate_core(p.rlwe, ct, rks, a, src, sign,
                                _dummy_hoisted(ct), False)
        cur = ct
        k = 1
        while rot_idx > 0:
            if rot_idx % 2:
                cur = self.rotate_new(cur, k, rtk_set)
            rot_idx //= 2
            k *= 2
        return cur

    def conjugate_new(self, ct: Ciphertext, cjk_set) -> Ciphertext:
        return ksw.conjugate(self.params.rlwe, ct,
                             cjk_set.stacked(ct.ids))
