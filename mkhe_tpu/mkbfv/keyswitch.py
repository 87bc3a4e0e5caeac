"""BFV key switching over the double basis (TPU rebuild of
mkbfv/keyswitch.go and keyswitch_hoisted.go).

The R-basis gadget decomposition yields 2*beta single-limb digits (alpha=1
broadcast fast path, like DecomposeBFV's use of the RP decomposer at
keyswitch.go:57-80); the paired switching keys are stored fused as
(2*beta, Lqp, N) so external products are a single 2*beta-term accumulate.
The tensor product runs in the NTT domain of R and is quantized by t/QMul
back to Q (keyswitch.go:191-228).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..mkrlwe import keyswitch as ksw
from ..mkrlwe.elements import Ciphertext, union_ids
from ..ops import basis as rns_basis
from .params import Parameters
from . import basis as bfv_basis


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["lift", "resc", "dec_lift", "dec_resc"],
    meta_fields=["ids"],
)
@dataclasses.dataclass(frozen=True)
class HoistedCiphertext:
    """Cached double-basis forms of a BFV ciphertext for hoisted
    multiplication (reference: the rlkSet PolyRPool1/2 + HoistPool scratch
    filled once per operand in mkbfv/evaluator.go:118-144 and consumed by
    MulAndRelinBFVHoisted, mkbfv/keyswitch_hoisted.go:39-207).

    `lift`/`dec_lift` are the operand-0 forms (ModUpQtoR + its 2*beta-digit
    NTT decomposition); `resc`/`dec_resc` are the operand-1 forms
    (Rescale by QMul/Q + decomposition). Caching both lets one hoisted
    form serve either multiplication slot, amortizing the lift, iNTT and
    base-conversion cost when a ciphertext is reused across products."""
    ids: Tuple[str, ...]
    lift: jax.Array       # (k+1, 2Lq, N) coeff-domain over R
    resc: jax.Array       # (k+1, 2Lq, N) coeff-domain over R
    dec_lift: jax.Array   # (k, 2beta, Lqp, N) NTT digits of lift[1:]
    dec_resc: jax.Array   # (k, 2beta, Lqp, N) NTT digits of resc[1:]


def hoist(params: Parameters, ct: Ciphertext) -> HoistedCiphertext:
    """Precompute both double-basis forms + decompositions of `ct`."""
    lift = bfv_basis.mod_up_q_to_r(params, ct.data)
    resc = bfv_basis.rescale_q_to_r(params, ct.data)
    return HoistedCiphertext(
        ids=ct.ids, lift=lift, resc=resc,
        dec_lift=decompose_bfv(params, lift[1:]),
        dec_resc=decompose_bfv(params, resc[1:]))


def decompose_bfv(params: Parameters, x_r: jax.Array) -> jax.Array:
    """R-basis coeff-domain (..., 2Lq, N) -> NTT digits (..., 2beta, Lqp, N),
    alpha source limbs per digit (Q-half digits first, then QMul-half)."""
    rp = params.rlwe
    ring_qp = rp.ring_qp
    # Fused mod_up + NTT on TPU; staged path elsewhere (bit-identical).
    return rns_basis.decompose_ntt(x_r, params.ring_r, ring_qp, rp.alpha)


def mul_and_relin_bfv(params: Parameters, ct0r: Ciphertext,
                      ct1r: Ciphertext,
                      rlk_stacked: Tuple[jax.Array, jax.Array, jax.Array],
                      dec0: Optional[jax.Array] = None,
                      dec1: Optional[jax.Array] = None) -> Ciphertext:
    """KKLSS multiplication in the BFV double basis
    (MulAndRelinBFV[Hoisted], keyswitch.go:116-250):

    ct0r components hold lifted values (ModUpQtoR), ct1r components hold
    QMul/Q-rescaled values; the tensor in R quantizes by t/QMul back to Q,
    and the x/y/v/u relinearization fixups run over QP exactly as in CKKS
    but with 2*beta digits.
    """
    rp = params.rlwe
    level = rp.max_level
    ring_q = rp.ring_q
    ring_r = params.ring_r
    ring_qp = rp.ring_qp

    ids0, ids1 = ct0r.ids, ct1r.ids
    ids = union_ids(ids0, ids1)

    if dec0 is None:
        dec0 = decompose_bfv(params, ct0r.data[1:])
    if dec1 is None:
        dec1 = decompose_bfv(params, ct1r.data[1:])

    b_all, d_all, v_all = rlk_stacked
    sel0 = np.array([ids.index(i) for i in ids0])
    sel1 = np.array([ids.index(i) for i in ids1])
    d_keys = d_all[sel0]
    b_keys = b_all[sel1]
    v_keys = v_all[sel0]
    u_key = rp.crs[-1][:rp.beta(level)]

    x = ksw._aggregate_keys(rp, dec0, d_keys, level)
    y = ksw._aggregate_keys(rp, dec1, b_keys, level)

    # tensor in ring R (NTT), then quantize each component by t/QMul
    nt0 = ring_r.ntt(ct0r.data)
    nt1 = ring_r.ntt(ct1r.data)
    nt0_0m = ring_r.to_mont(nt0[0])
    nt1_0m = ring_r.to_mont(nt1[0])
    tensor = [ring_r.mul_mont(nt1[0], nt0_0m)]
    for pid in ids:
        acc = None
        if pid in ids0:
            acc = ring_r.mul_mont(nt0[1 + ids0.index(pid)], nt1_0m)
        if pid in ids1:
            term = ring_r.mul_mont(nt1[1 + ids1.index(pid)], nt0_0m)
            acc = term if acc is None else ring_r.add(acc, term)
        tensor.append(acc)
    out_arr = bfv_basis.quantize(params, jnp.stack(tensor))

    # out_j += Ext(ct1r_j, x); t = Ext(ct0r_i, y) — one batched
    # iNTT+ModDown serves both (poly-wise, bit-identical)
    z1_ntt = ksw.external_product_ntt(rp, dec1, x, level, lazy=True)
    t_ntt = ksw.external_product_ntt(rp, dec0, y, level, lazy=True)
    k1 = len(ids1)
    zt = ksw.mod_down_qp(rp, jnp.concatenate([z1_ntt, t_ntt]), level)
    z1, t = zt[:k1], zt[k1:]
    out_arr = out_arr.at[1 + sel1].set(ring_q.add(out_arr[1 + sel1], z1))

    # Q-basis fixups with v_i and u, again one batched ModDown
    dec_t = ksw.decompose(rp, t, level)
    v_ntt = ksw._sum_parties_ntt(rp, dec_t, v_keys, level, lazy=True)
    zu_ntt = ksw.external_product_ntt(rp, dec_t, u_key, level, lazy=True)
    vz = ksw.mod_down_qp(
        rp, jnp.concatenate([v_ntt[None], zu_ntt]), level)
    out_arr = out_arr.at[0].set(ring_q.add(out_arr[0], vz[0]))
    out_arr = out_arr.at[1 + sel0].set(
        ring_q.add(out_arr[1 + sel0], vz[1:]))

    return Ciphertext(ids=ids, data=out_arr)
