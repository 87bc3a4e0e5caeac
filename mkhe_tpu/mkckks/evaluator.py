"""Multi-key CKKS evaluator (TPU rebuild of mkckks/evaluator.go).

API mirrors the reference: add/sub with automatic id-set union and scale
alignment, MultByConst, Rescale, MulRelin (+hoisted), MulPtxt, Rotate
(+hoisted, with power-of-two decomposition fallback), Conjugate,
HoistedForm, DropLevel. Heavy cores are jitted with (ids, level, nb) as
static metadata, so each (party-set, level) pair compiles once and then
runs fully on device.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .. import mkrlwe
from ..mkrlwe import keyswitch as ksw
from ..mkrlwe.elements import Ciphertext as RCt, union_ids
from ..ops import basis
from .params import Parameters
from .elements import Ciphertext


# ----------------------------------------------------------------------------
# jitted cores (module-level so the cache is shared across evaluators)
# ----------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("map_a", "map_b"))
def _add_core(rp, a_data, b_data, map_a, map_b):
    ring = rp.ring_q_at(a_data.shape[-2] - 1)
    out = []
    for ia, ib in zip(map_a, map_b):
        if ia >= 0 and ib >= 0:
            out.append(ring.add(a_data[ia], b_data[ib]))
        elif ia >= 0:
            out.append(a_data[ia])
        else:
            out.append(b_data[ib])
    return jnp.stack(out)


@functools.partial(jax.jit, static_argnames=("map_a", "map_b"))
def _sub_core(rp, a_data, b_data, map_a, map_b):
    ring = rp.ring_q_at(a_data.shape[-2] - 1)
    out = []
    for ia, ib in zip(map_a, map_b):
        if ia >= 0 and ib >= 0:
            out.append(ring.sub(a_data[ia], b_data[ib]))
        elif ia >= 0:
            out.append(a_data[ia])
        else:
            out.append(ring.neg(b_data[ib]))
    return jnp.stack(out)


@functools.partial(jax.jit, static_argnames=("has_r", "has_i", "level"))
def _mult_const_core(rp, data, sr_mont, si_mont, has_r, has_i, level):
    """data * (sr + si*X^{N/2}) — multiplication by a scaled complex
    constant in coefficient domain; X^{N/2} is the image of i. The
    per-limb Montgomery scalars arrive as data so one graph serves all
    constants."""
    ring = rp.ring_q_at(level)
    out = None
    if has_r:
        out = ring.mul_scalar_mont(data, sr_mont)
    if has_i:
        n = data.shape[-1]
        rolled = jnp.roll(data, n // 2, axis=-1)
        idx = jnp.arange(n) < n // 2
        rolled = jnp.where(idx, ring.neg(rolled), rolled)
        term = ring.mul_scalar_mont(rolled, si_mont)
        out = term if out is None else ring.add(out, term)
    return data if out is None else out


@functools.partial(jax.jit, static_argnames=("nb",))
def _rescale_core(rp, data, nb):
    ring = rp.ring_q_at(data.shape[-2] - 1)
    return basis.div_round_by_last_moduli(data, ring, nb)


@functools.partial(jax.jit,
                   static_argnames=("ids0", "ids1", "level", "nb"))
def _mul_relin_batched_core(rp, data0, data1, b, d, v, ids0, ids1, level,
                            nb):
    def one(d0, d1):
        out = ksw.mul_and_relin(
            rp, RCt(ids=ids0, data=d0), RCt(ids=ids1, data=d1),
            (b, d, v), level).data
        if nb:
            out = basis.div_round_by_last_moduli(
                out, rp.ring_q_at(level), nb)
        return out
    return jax.vmap(one)(data0, data1)


@functools.partial(jax.jit,
                   static_argnames=("level", "use_h0", "use_h1", "square"))
def _mul_relin_core(rp, ct0, ct1, b, d, v, level, h0, h1, use_h0, use_h1,
                    square=False):
    return ksw.mul_and_relin(rp, ct0, ct1, (b, d, v), level,
                             h0 if use_h0 else None,
                             h1 if use_h1 else None, square=square)


@functools.partial(jax.jit, static_argnames=("use_h",))
def _rotate_core(rp, ct, rks, a_crs, perm_src, perm_sign, h, use_h):
    return ksw.rotate_with(rp, ct, rks, a_crs, perm_src, perm_sign,
                           h if use_h else None)


@jax.jit
def _conjugate_core(rp, ct, cks):
    return ksw.conjugate(rp, ct, cks)


@functools.partial(jax.jit, static_argnames=("rot_idxs",))
def _rotate_many_core(rp, ct, rot_idxs, rtk_multi, h):
    return ksw.rotate_hoisted_batched(rp, ct, rot_idxs, rtk_multi, h)


@functools.partial(jax.jit, static_argnames=("level",))
def _mul_relin_sum_core(rp, pairs, b, d, v, level):
    return ksw.mul_and_relin_sum(rp, pairs, (b, d, v), level)


@functools.partial(jax.jit, static_argnames=("level",))
def _mul_ptxt_core(rp, data, pt, level):
    ring = rp.ring_q_at(level)
    pm = ring.to_mont(ring.ntt(pt))
    return ring.intt(ring.mul_mont(ring.ntt(data), pm[None]))


@functools.partial(jax.jit, static_argnames=("level",))
def _hoist_core(rp, party_data, level):
    return ksw.decompose(rp, party_data, level)


# ----------------------------------------------------------------------------


def _dummy_hoisted(ct):
    """Placeholder hoisted pytree for the unused branch of _rotate_core
    (jit requires a consistent pytree structure)."""
    import jax.numpy as _jnp
    return mkrlwe.HoistedCiphertext(
        ids=ct.ids, digits=_jnp.zeros((len(ct.ids), 1, 1, 1), _jnp.uint32))


class Evaluator:
    def __init__(self, params: Parameters):
        self.params = params

    # -- helpers ------------------------------------------------------------

    def _index_maps(self, ids_out, ids_a, ids_b):
        map_a = tuple(
            [0] + [1 + ids_a.index(i) if i in ids_a else -1
                   for i in ids_out])
        map_b = tuple(
            [0] + [1 + ids_b.index(i) if i in ids_b else -1
                   for i in ids_out])
        return map_a, map_b

    def _align_levels(self, ct0: Ciphertext, ct1: Ciphertext):
        level = min(ct0.level, ct1.level)
        return self.drop_level(ct0, ct0.level - level), \
            self.drop_level(ct1, ct1.level - level), level

    def _align_scales(self, ct0: Ciphertext, ct1: Ciphertext):
        """Scale alignment via integer MultByConst (evaluateInPlace,
        mkckks/evaluator.go:200-304)."""
        s0, s1 = ct0.scale, ct1.scale
        if s1 > s0 and math.floor(s1 / s0) > 1:
            ct0 = self.mult_by_const_new(ct0, math.floor(s1 / s0))
        elif s0 > s1 and math.floor(s0 / s1) > 1:
            ct1 = self.mult_by_const_new(ct1, math.floor(s0 / s1))
        return ct0, ct1

    # -- add / sub ----------------------------------------------------------

    def add_new(self, ct0: Ciphertext, ct1: Ciphertext) -> Ciphertext:
        ct0, ct1 = self._align_scales(ct0, ct1)
        ct0, ct1, level = self._align_levels(ct0, ct1)
        ids = union_ids(ct0.ids, ct1.ids)
        map_a, map_b = self._index_maps(ids, ct0.ids, ct1.ids)
        data = _add_core(self.params.rlwe, ct0.ct.data, ct1.ct.data,
                         map_a, map_b)
        return Ciphertext(ct=RCt(ids=ids, data=data),
                          scale=max(ct0.scale, ct1.scale))

    def sub_new(self, ct0: Ciphertext, ct1: Ciphertext) -> Ciphertext:
        ct0, ct1 = self._align_scales(ct0, ct1)
        ct0, ct1, level = self._align_levels(ct0, ct1)
        ids = union_ids(ct0.ids, ct1.ids)
        map_a, map_b = self._index_maps(ids, ct0.ids, ct1.ids)
        data = _sub_core(self.params.rlwe, ct0.ct.data, ct1.ct.data,
                         map_a, map_b)
        return Ciphertext(ct=RCt(ids=ids, data=data),
                          scale=max(ct0.scale, ct1.scale))

    # -- constants ----------------------------------------------------------

    def mult_by_const_new(self, ct: Ciphertext, const) -> Ciphertext:
        """Multiply by a scalar constant (MultByConst,
        mkckks/evaluator.go:117-198). Integer-valued constants keep the
        scale; fractional ones are scaled by q_level."""
        c = complex(const)
        level = ct.level
        scale = 1.0
        if (c.real != int(c.real)) or (c.imag != int(c.imag)):
            scale = float(self.params.rlwe.q_moduli[level])
        sr = int(round(c.real * scale))
        si = int(round(c.imag * scale))
        from ..ops import modmath as mm
        moduli = self.params.rlwe.q_moduli[:level + 1]
        sr_mont = jnp.asarray([mm.to_mont_host(sr % q, q) for q in moduli],
                              jnp.uint32)
        si_mont = jnp.asarray([mm.to_mont_host(si % q, q) for q in moduli],
                              jnp.uint32)
        data = _mult_const_core(self.params.rlwe, ct.ct.data, sr_mont,
                                si_mont, sr != 0, si != 0, level)
        return Ciphertext(ct=RCt(ids=ct.ids, data=data),
                          scale=ct.scale * scale)

    # -- level / scale management ------------------------------------------

    def drop_level(self, ct: Ciphertext, levels: int) -> Ciphertext:
        if levels <= 0:
            return ct
        return Ciphertext(ct=mkrlwe.drop_level(ct.ct, levels),
                          scale=ct.scale)

    def rescale(self, ct: Ciphertext, min_scale: Optional[float] = None
                ) -> Ciphertext:
        """Divide by trailing moduli until the scale ~ min_scale
        (Rescale, mkckks/evaluator.go:359-398)."""
        if min_scale is None:
            min_scale = self.params.scale
        q = self.params.rlwe.q_moduli
        scale = ct.scale
        nb = 0
        level = ct.level
        while (level - nb >= 1
               and scale / q[level - nb] >= min_scale / 2):
            scale /= q[level - nb]
            nb += 1
        if nb == 0:
            return ct
        data = _rescale_core(self.params.rlwe, ct.ct.data, nb)
        return Ciphertext(ct=RCt(ids=ct.ids, data=data), scale=scale)

    # -- multiplication -----------------------------------------------------

    def hoisted_form(self, ct: Ciphertext) -> mkrlwe.HoistedCiphertext:
        digits = _hoist_core(self.params.rlwe, ct.ct.data[1:], ct.level)
        return mkrlwe.HoistedCiphertext(ids=ct.ids, digits=digits)

    def mul_relin_new(self, ct0: Ciphertext, ct1: Ciphertext, rlk_set
                      ) -> Ciphertext:
        if ct0 is ct1:
            h = self.hoisted_form(ct0)
            return self.mul_relin_hoisted_new(ct0, ct1, h, h, rlk_set)
        return self.mul_relin_hoisted_new(
            ct0, ct1, self.hoisted_form(ct0), self.hoisted_form(ct1),
            rlk_set)

    def mul_relin_hoisted_new(self, ct0: Ciphertext, ct1: Ciphertext,
                              h0, h1, rlk_set) -> Ciphertext:
        square = ct0 is ct1 or (ct0.ct.data is ct1.ct.data
                                and ct0.ids == ct1.ids)
        ct0a, ct1a, level = self._align_levels(ct0, ct1)
        ids = union_ids(ct0.ids, ct1.ids)
        b, d, v = rlk_set.stacked(ids)
        dummy = h0 if h0 is not None else h1
        out = _mul_relin_core(
            self.params.rlwe, ct0a.ct, ct1a.ct, b, d, v, level,
            h0 if h0 is not None else dummy,
            h1 if h1 is not None else dummy,
            h0 is not None, h1 is not None,
            square=square and (h0 is h1))
        res = Ciphertext(ct=out, scale=ct0.scale * ct1.scale)
        return self.rescale(res)

    def mul_relin_sum_new(self, pairs, rlk_set) -> Ciphertext:
        """Inner product sum_i a_i * b_i with lazy relinearization
        (ksw.mul_and_relin_sum): one deferred ModDown/t-path for the
        whole sum instead of one per term. Decrypts to the same value as
        sum of mul_relin_new results with slightly smaller noise. pairs:
        list of (ct0, ct1) or (ct0, ct1, h0, h1)."""
        pairs = [p if len(p) == 4 else (p[0], p[1], None, None)
                 for p in pairs]
        level = min(min(p[0].level, p[1].level) for p in pairs)
        scale = pairs[0][0].scale * pairs[0][1].scale
        rp = self.params.rlwe
        rpairs = []
        for c0, c1, h0, h1 in pairs:
            if c0.scale * c1.scale != scale:
                raise ValueError("pairs must share the product scale")
            c0a, c1a, lv = self._align_levels(c0, c1)
            if lv != level:  # drop to the common level
                c0a = Ciphertext(ct=RCt(
                    ids=c0a.ids, data=c0a.ct.data[..., :level + 1, :]),
                    scale=c0a.scale)
                c1a = Ciphertext(ct=RCt(
                    ids=c1a.ids, data=c1a.ct.data[..., :level + 1, :]),
                    scale=c1a.scale)
            rpairs.append((c0a.ct, c1a.ct, h0, h1))
        ids = union_ids(rpairs[0][0].ids, rpairs[0][1].ids)
        b, d, v = rlk_set.stacked(ids)
        out = _mul_relin_sum_core(rp, tuple(rpairs), b, d, v, level)
        return self.rescale(Ciphertext(ct=out, scale=scale))

    def mul_relin_batched_new(self, cts0, cts1, rlk_set):
        """Throughput-oriented batched MulRelin: vmap the whole
        mult+relin+rescale over a batch of ciphertext pairs in ONE XLA
        program. All of cts0 must share (ids, level, scale), likewise
        cts1 (the usual serving shape: many independent queries under
        the same keys). Returns a list of Ciphertexts, each bit-identical
        to mul_relin_new on the corresponding pair.

        No reference analog (the Go library is strictly one-op-at-a-time,
        mkckks/evaluator.go:416); this is the TPU-native serving path —
        batching fills the pipeline bubbles a single mult leaves on the
        VPU/MXU.
        """
        cts0, cts1 = list(cts0), list(cts1)
        if len(cts0) != len(cts1) or not cts0:
            raise ValueError("need equal-length non-empty batches")
        for lst in (cts0, cts1):
            if any(c.ids != lst[0].ids or c.level != lst[0].level
                   or c.scale != lst[0].scale for c in lst):
                raise ValueError(
                    "batch must share (ids, level, scale); mix of "
                    "shapes compiles per-group — split the batch")
        level = min(cts0[0].level, cts1[0].level)
        ids = union_ids(cts0[0].ids, cts1[0].ids)
        b, d, v = rlk_set.stacked(ids)
        # rescale amount, computed once (same scale across the batch)
        scale = cts0[0].scale * cts1[0].scale
        q = self.params.rlwe.q_moduli
        nb = 0
        while (level - nb >= 1
               and scale / q[level - nb] >= self.params.scale / 2):
            scale /= q[level - nb]
            nb += 1
        data0 = jnp.stack([c.ct.data for c in cts0])
        data1 = jnp.stack([c.ct.data for c in cts1])
        out = _mul_relin_batched_core(
            self.params.rlwe, data0, data1, b, d, v,
            ids0=cts0[0].ids, ids1=cts1[0].ids, level=level, nb=nb)
        return [Ciphertext(ct=RCt(ids=ids, data=out[i]), scale=scale)
                for i in range(len(cts0))]

    def mul_ptxt_new(self, ct: Ciphertext, pt, pt_scale: float
                     ) -> Ciphertext:
        """Multiply by an encoded plaintext (MulPtxtNew,
        mkckks/evaluator.go:465-481). pt: (Lq, N) uint32 coeff domain."""
        level = ct.level
        data = _mul_ptxt_core(self.params.rlwe, ct.ct.data,
                              pt[..., :level + 1, :], level)
        res = Ciphertext(ct=RCt(ids=ct.ids, data=data),
                         scale=ct.scale * pt_scale)
        return self.rescale(res)

    # -- rotations ----------------------------------------------------------

    def _rotate(self, ct: Ciphertext, rot_idx: int, rtk_set, h):
        """Single compiled rotation graph per (ids, level): the rotation
        index only enters through data (keys, CRS, permutation tables)."""
        rp = self.params.rlwe
        rks = rtk_set.stacked(ct.ids, rot_idx)
        a = rp.crs_at(rot_idx, ct.level)
        src, sign = ksw.rotation_tables(rp, rot_idx)
        return _rotate_core(rp, ct.ct, rks, a, src, sign,
                            h if h is not None else _dummy_hoisted(ct),
                            h is not None)

    def _normalize_rot(self, rot_idx: int) -> int:
        nh = self.params.n // 2
        return rot_idx % nh

    def rotate_new(self, ct: Ciphertext, rot_idx: int, rtk_set
                   ) -> Ciphertext:
        rot_idx = self._normalize_rot(rot_idx)
        if rot_idx == 0:
            return ct
        if rot_idx in self.params.rlwe.crs:
            out = self._rotate(ct, rot_idx, rtk_set, None)
            return Ciphertext(ct=out, scale=ct.scale)
        # power-of-two decomposition fallback (evaluator.go:516-524)
        cur = ct
        k = 1
        while rot_idx > 0:
            if rot_idx % 2:
                cur = self.rotate_new(cur, k, rtk_set)
            rot_idx //= 2
            k *= 2
        return cur

    def rotate_hoisted_new(self, ct: Ciphertext, rot_idx: int, h, rtk_set
                           ) -> Ciphertext:
        rot_idx = self._normalize_rot(rot_idx)
        if rot_idx == 0:
            return ct
        if rot_idx not in self.params.rlwe.crs:
            raise KeyError("hoisted rotation needs a precomputed CRS "
                           "(reference panics too, evaluator.go:615)")
        out = self._rotate(ct, rot_idx, rtk_set, h)
        return Ciphertext(ct=out, scale=ct.scale)

    def rotate_hoisted_many_new(self, ct: Ciphertext, rot_idxs, h,
                                rtk_set) -> list:
        """All R rotations of one hoisted ciphertext in a single batched
        compiled pass (ksw.rotate_hoisted_batched) — bit-identical to R
        rotate_hoisted_new calls. Used by the CNN's FC1 (cnn/cnn.go:42-71
        reuses one decomposition across its 8 rotations)."""
        import jax.numpy as jnp
        idxs = tuple(self._normalize_rot(r) for r in rot_idxs)
        if any(i == 0 for i in idxs):
            raise ValueError("rotation by 0 is the identity; drop it")
        for i in idxs:
            if i not in self.params.rlwe.crs:
                raise KeyError(f"no CRS for rotation {i}")
        rtk_multi = jnp.stack([rtk_set.stacked(ct.ids, i) for i in idxs])
        data = _rotate_many_core(self.params.rlwe, ct.ct, idxs, rtk_multi,
                                 h)
        return [Ciphertext(ct=mkrlwe.Ciphertext(ids=ct.ids, data=data[r]),
                           scale=ct.scale)
                for r in range(len(idxs))]

    def conjugate_new(self, ct: Ciphertext, cjk_set) -> Ciphertext:
        cks = cjk_set.stacked(ct.ids)
        out = _conjugate_core(self.params.rlwe, ct.ct, cks)
        return Ciphertext(ct=out, scale=ct.scale)
