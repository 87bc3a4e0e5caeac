"""Gadget decomposition, external products, and the KKLSS multi-key
multiply-relinearize / rotate / conjugate (TPU rebuild of
mkrlwe/keyswitch.go and keyswitch_hoisted.go).

Every per-party Go loop becomes a batched array op over a party axis; the
digit (beta) reductions run as 64-bit accumulate + one Montgomery reduction
per output limb, mirroring the reference's uint128 accumulation strategy
(basis_extension.go:582-646) in the 32-bit world.

Deviation from the reference (documented): where the reference computes
per-party ModDown(InvNTT(.)) and then sums (keyswitch.go:220-229), we sum
the NTT-domain partial products across parties first and ModDown once —
algebraically identical up to <= k half-ulp rounding differences, and it
saves k-1 InvNTT+ModDown passes. This is also the natural point to psum
partial products when the party axis is sharded across devices.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import modmath as mm
from ..ops import basis
from ..ops.ring import Ring, galois_element_rot, galois_element_conj
from .params import Parameters
from .elements import Ciphertext, HoistedCiphertext, union_ids, new_ciphertext

U32 = jnp.uint32


# ----------------------------------------------------------------------------
# Decomposition
# ----------------------------------------------------------------------------

def decompose(params: Parameters, x: jax.Array, level: int) -> jax.Array:
    """Gadget-decompose coeff-domain (..., level+1, N) polys into NTT-domain
    digits (..., beta, Lqp, N). Reference: KeySwitcher.Decompose
    (keyswitch.go:49-73)."""
    ring_q = params.ring_q_at(level)
    ring_qp = params.ring_qp_at(level)
    # Fused mod_up + NTT on TPU (one HBM pass over the digit tensor);
    # staged decompose_digits + ntt(reduce_input=True) elsewhere —
    # bit-identical either way (basis.decompose_ntt).
    return basis.decompose_ntt(x, ring_q, ring_qp, params.alpha)


def slice_swk(params: Parameters, swk: jax.Array, level: int) -> jax.Array:
    """Slice a (…, beta_max, Lq+Lp, N) switching key to the given level."""
    if level == params.max_level:
        return swk
    beta = params.beta(level)
    sel = params.qp_limb_index(level)
    return swk[..., :beta, :, :][..., sel, :]


def slice_digits(params: Parameters, digits: jax.Array, level: int
                 ) -> jax.Array:
    """Slice hoisted decomposition digits (…, beta_h, (lh+1)+Lp, N)
    computed at a higher level lh down to `level`: keep the first
    beta(level) digits and the level's Q limbs + P limbs. Valid because
    digit d only depends on source limbs [d*alpha, (d+1)*alpha) — the
    reference gets the same effect from level-bounded loops over its
    full-size hoisted buffers (keyswitch_hoisted.go:24-31)."""
    from_level = digits.shape[-2] - params.pcount - 1
    if from_level == level:
        return digits
    beta = params.beta(level)
    sel = np.concatenate([
        np.arange(level + 1),
        np.arange(from_level + 1, from_level + 1 + params.pcount)])
    return digits[..., :beta, :, :][..., sel, :]


# ----------------------------------------------------------------------------
# External products
# ----------------------------------------------------------------------------

def _accum_digits(digits: jax.Array, swk: jax.Array) -> jax.Array:
    """sum_beta digits[..., b, :, :] * swk[..., b, :, :] with 64-bit
    accumulation; returns the raw (hi, lo) pair."""
    beta = digits.shape[-3]
    shape = jnp.broadcast_shapes(digits.shape, swk.shape)
    acc = mm.mul_accum_init(shape[:-3] + shape[-2:])
    for i in range(beta):
        acc = mm.mul_accum_step(acc, digits[..., i, :, :], swk[..., i, :, :])
    return acc


def _reduce_qp(acc, ring_qp: Ring) -> jax.Array:
    hi, lo = acc
    q = ring_qp.q[:, None]
    r = mm.mont_reduce_wide(hi, lo, q, ring_qp.qinv_neg[:, None])
    return r  # lazy, < sum/2^32 + q


def external_product_ntt(params: Parameters, digits: jax.Array,
                         swk: jax.Array, level: int,
                         lazy: bool = False) -> jax.Array:
    """Inner product sum_b digits_b * swk_b, still NTT domain over QP.
    digits (..., beta, Lqp, N) plain NTT values; swk Montgomery NTT.
    Canonically reduced, or — lazy=True — LAZY: bounded by
    q + beta*q/2 for < 4q digits (fits u32; exact mod q). Lazy consumers
    (mod_down_qp's iNTT with reduce_input [< 8q], mont_mul) accept them;
    do NOT add two lazy results assuming 2q headroom."""
    ring_qp = params.ring_qp_at(level)
    r = _reduce_qp(_accum_digits(digits, swk), ring_qp)
    return r if lazy else ring_qp.reduce(r)


def mod_down_qp(params: Parameters, c_qp: jax.Array, level: int) -> jax.Array:
    """InvNTT + divide-and-round by P: (..., Lqp, N) NTT -> (..., Lq, N)
    coeff domain (the tail of ExternalProduct, keyswitch.go:112-117)."""
    ring_qp = params.ring_qp_at(level)
    lq = level + 1
    c = ring_qp.intt(c_qp, reduce_input=True)
    return basis.mod_down(c[..., :lq, :], c[..., lq:, :],
                          params.ring_q_at(level), params.ring_p)


def external_product(params: Parameters, digits: jax.Array, swk: jax.Array,
                     level: int) -> jax.Array:
    """Full external product: digits (NTT) x swk -> coeff-domain (..., Lq, N).
    Reference: KeySwitcher.ExternalProduct / ExternalProductHoisted."""
    return mod_down_qp(
        params,
        external_product_ntt(params, digits, swk, level, lazy=True),
        level)


def _aggregate_keys(params: Parameters, digits: jax.Array, keys: jax.Array,
                    level: int) -> jax.Array:
    """x_b = sum_k digits[k, b] * keys[k, b]: collapse the party axis but
    keep the digit axis (the x/y switching-key aggregation of MulAndRelin,
    keyswitch.go:156-180). digits (k, beta, Lqp, N) -> (beta, Lqp, N).

    keys are the d/b relin keys, stored in DOUBLE-Montgomery form
    (keygen._relin_b_core), so the single Montgomery reduction here emits
    the aggregate directly in Montgomery form — no to_mont pass. Output is
    CANONICAL (< q): the reduction's bound is q*(1 + k/8) for canonical
    digits (< q) and keys (< q < 2^29), so ceil(k/8) conditional
    subtractions restore [0, q). Canonical output also makes the
    cross-shard psum in parallel/party_mul.py overflow-safe (D*q < 2^32
    for D <= 8 shards)."""
    ring_qp = params.ring_qp_at(level)
    k = digits.shape[0]
    acc = mm.mul_accum_init(digits.shape[1:])
    for i in range(k):
        acc = mm.mul_accum_step(acc, digits[i], keys[i])
    q = ring_qp.q[:, None]
    r = mm.mont_reduce_wide(acc[0], acc[1], q,
                            ring_qp.qinv_neg[:, None])
    for _ in range((k + 7) // 8):
        r = mm.csub(r, q)
    return r


def _sum_parties_ntt(params: Parameters, digits: jax.Array, swks: jax.Array,
                     level: int, lazy: bool = False) -> jax.Array:
    """sum_k sum_b digits[k, b] * swk[k, b] reduced over QP, NTT domain;
    canonical, or — lazy=True, one accumulation chunk, and
    k*beta <= 56 — LAZY: bounded by q*(1 + k*beta/8) <= 8q (exact mod
    q; consumers like mod_down_qp's reduce_input iNTT absorb < 8q).
    digits (..., k, beta, Lqp, N), swks broadcastable.

    Accumulates the whole k x beta product sum in one 64-bit chain with a
    single Montgomery reduction (one pass, vs a reduce per party) —
    chunked so at most 64 partial products enter one accumulator (each
    contributes < 2^26 to the high word, mirroring the reference's
    uint128 accumulation budget in basis_extension.go:582-646)."""
    ring_qp = params.ring_qp_at(level)
    k = digits.shape[-4]
    beta = digits.shape[-3]
    per_chunk = max(1, 64 // max(beta, 1))
    out = None
    for c0 in range(0, k, per_chunk):
        c1 = min(c0 + per_chunk, k)
        shape = jnp.broadcast_shapes(digits.shape, swks.shape)
        acc = mm.mul_accum_init(shape[:-4] + shape[-2:])
        for i in range(c0, c1):
            for b_ in range(beta):
                acc = mm.mul_accum_step(
                    acc, digits[..., i, b_, :, :], swks[..., i, b_, :, :])
        r = _reduce_qp(acc, ring_qp)        # < q + n_prod*q/8 (lazy)
        # Lazy single-chunk return only when the worst-case bound
        # q*(1 + n_prod/8) stays within the iNTT input contract (< 8q,
        # see Ring.intt reduce_input), i.e. n_prod <= 56. At the
        # boundary (beta=16, k=4 -> n_prod=64) the bound is 9q, which
        # wraps uint32 for primes in (2^28.83, 2^29) that ntt_primes
        # allows (ADVICE r4 #4) — those fall through to the canonical
        # reduction. The flagship presets (n_prod = 4*14 = 56) keep the
        # lazy fast path.
        if lazy and k <= per_chunk and (c1 - c0) * beta <= 56:
            return r
        r = ring_qp.reduce(r)
        out = r if out is None else ring_qp.add(out, r)
    return out


# ----------------------------------------------------------------------------
# Hoisting
# ----------------------------------------------------------------------------

def hoisted_form(params: Parameters, ct: Ciphertext) -> HoistedCiphertext:
    """Precompute gadget decompositions of all party polys
    (Evaluator.HoistedForm, mkckks/evaluator.go:543-553)."""
    return HoistedCiphertext(
        ids=ct.ids, digits=decompose(params, ct.data[1:], ct.level))


# ----------------------------------------------------------------------------
# MulAndRelin
# ----------------------------------------------------------------------------

def mul_and_relin(params: Parameters, ct0: Ciphertext, ct1: Ciphertext,
                  rlk_stacked: Tuple[jax.Array, jax.Array, jax.Array],
                  level: int,
                  h0: Optional[HoistedCiphertext] = None,
                  h1: Optional[HoistedCiphertext] = None,
                  square: bool = False,
                  u_key: Optional[jax.Array] = None) -> Ciphertext:
    """The KKLSS multi-key multiplication with relinearization
    (keyswitch.go:122-230 / keyswitch_hoisted.go:44-179):

      x = MForm(sum_i d_i . Dec(ct0_i)),  y = MForm(sum_i b_i . Dec(ct1_i))
      out_0 = ct0_0 * ct1_0
      out_j = ct0_0 * ct1_j + ct0_j * ct1_0          (tensor terms)
      out_j += Ext(ct1_j, x)                          j in ids1
      t_i   = Ext(ct0_i, y)                           i in ids0
      out_0 += Ext(Dec(t_i), v_i);  out_i += Ext(Dec(t_i), u)
    """
    ids0, ids1 = ct0.ids, ct1.ids
    ids = union_ids(ids0, ids1)
    ring_q = params.ring_q_at(level)
    square = square or (ct0.data is ct1.data and ids0 == ids1)

    d0 = ct0.data[..., :level + 1, :]
    d1 = d0 if square else ct1.data[..., :level + 1, :]

    if (h0 is None and h1 is None and not square
            and d0.shape == d1.shape):
        # distinct operands: decompose both in ONE fused pass (one
        # Pallas launch over 2k parties instead of two over k)
        both = decompose(
            params, jnp.concatenate([d0[1:], d1[1:]]), level)
        k0 = d0.shape[0] - 1
        dec0, dec1 = both[:k0], both[k0:]
    else:
        dec0 = (slice_digits(params, h0.digits, level) if h0 is not None
                else decompose(params, d0[1:], level))
        if square and (h1 is None or h1 is h0 or h1.digits is dec0):
            dec1 = dec0
        else:
            dec1 = (slice_digits(params, h1.digits, level)
                    if h1 is not None
                    else decompose(params, d1[1:], level))

    b_all, d_all, v_all = rlk_stacked  # each (k_union, beta, Lqp, N)
    sel0 = np.array([ids.index(i) for i in ids0])
    sel1 = np.array([ids.index(i) for i in ids1])
    d_keys = slice_swk(params, d_all[sel0], level)
    b_keys = slice_swk(params, b_all[sel1], level)
    v_keys = slice_swk(params, v_all[sel0], level)
    if u_key is None:  # overridable so sharded callers can pass it as an
        u_key = params.crs_at(-1, level)  # operand rather than a constant

    ring_qp = params.ring_qp_at(level)
    x = _aggregate_keys(params, dec0, d_keys, level)
    y = _aggregate_keys(params, dec1, b_keys, level)

    # tensor terms (NTT over Q limbs only)
    nt0 = ring_q.ntt(d0)
    nt1 = nt0 if square else ring_q.ntt(d1)
    nt0_0m = ring_q.to_mont(nt0[0])
    nt1_0m = ring_q.to_mont(nt1[0])

    out = [None] * (len(ids) + 1)
    out[0] = ring_q.mul_mont(nt1[0], nt0_0m)
    for j, pid in enumerate(ids):
        acc = None
        if pid in ids0:
            acc = ring_q.mul_mont(nt0[1 + ids0.index(pid)], nt1_0m)
        if pid in ids1:
            t = ring_q.mul_mont(nt1[1 + ids1.index(pid)], nt0_0m)
            acc = t if acc is None else ring_q.add(acc, t)
        out[1 + j] = acc
    out_arr = ring_q.intt(jnp.stack(out))

    # out_j += Ext(ct1_j, x); t_i = Ext(ct0_i, y). The two external
    # products share ONE batched iNTT+ModDown pass (mod_down is
    # poly-wise, so batching is bit-identical to separate calls).
    z1_ntt = external_product_ntt(params, dec1, x, level, lazy=True)
    t_ntt = external_product_ntt(params, dec0, y, level, lazy=True)
    k1 = len(ids1)
    zt = mod_down_qp(params, jnp.concatenate([z1_ntt, t_ntt]), level)
    z1, t = zt[:k1], zt[k1:]                       # (k1|k0, Lq, N)
    out_arr = out_arr.at[1 + sel1].set(
        ring_q.add(out_arr[1 + sel1], z1))

    # out_0 += Ext(Dec t_i, v_i); out_i += Ext(Dec t_i, u) — again one
    # batched iNTT+ModDown for the v-sum and the u products.
    dec_t = decompose(params, t, level)            # (k0, beta, Lqp, N)
    v_ntt = _sum_parties_ntt(params, dec_t, v_keys, level, lazy=True)
    zu_ntt = external_product_ntt(params, dec_t, u_key, level, lazy=True)
    vz = mod_down_qp(
        params, jnp.concatenate([v_ntt[None], zu_ntt]), level)
    out_arr = out_arr.at[0].set(ring_q.add(out_arr[0], vz[0]))
    out_arr = out_arr.at[1 + sel0].set(
        ring_q.add(out_arr[1 + sel0], vz[1:]))

    return Ciphertext(ids=ids, data=out_arr)


def mul_and_relin_sum(params: Parameters, pairs, rlk_stacked, level: int,
                      u_key: Optional[jax.Array] = None) -> Ciphertext:
    """sum_i MulAndRelin(a_i, b_i) with the relinearization tail deferred
    across the whole inner product (lazy relinearization).

    pairs: sequence of (ct0, ct1, h0, h1) with IDENTICAL id sets across
    pairs (h0/h1 may be None). All accumulations happen in the NTT domain
    BEFORE the expensive conversions, so the sum costs:

      - ONE iNTT+ModDown for the z1 path (instead of P),
      - ONE ModDown + re-decomposition + v/u external products for the
        t path (instead of P) — the t re-decomposition is ~half of each
        mult's NTT work,
      - ONE iNTT of the tensor accumulator.

    The result decrypts to sum_i a_i*b_i with slightly SMALLER noise than
    the staged sum (one rounding instead of P); it is not bit-identical
    to it (same trade as the documented psum-before-ModDown deviation).
    The reference evaluates such inner products (cnn/cnn.go:10-71) as P
    independent MulRelins + adds; this is the TPU-native fused form.
    """
    ct0_0, ct1_0 = pairs[0][0], pairs[0][1]
    ids0, ids1 = ct0_0.ids, ct1_0.ids
    ids = union_ids(ids0, ids1)
    for p_ in pairs[1:]:
        if p_[0].ids != ids0 or p_[1].ids != ids1:
            raise ValueError("mul_and_relin_sum needs identical id sets "
                             "across pairs")
    ring_q = params.ring_q_at(level)
    ring_qp = params.ring_qp_at(level)
    sel0 = np.array([ids.index(i) for i in ids0])
    sel1 = np.array([ids.index(i) for i in ids1])
    b_all, d_all, v_all = rlk_stacked
    d_keys = slice_swk(params, d_all[sel0], level)
    b_keys = slice_swk(params, b_all[sel1], level)
    v_keys = slice_swk(params, v_all[sel0], level)
    if u_key is None:
        u_key = params.crs_at(-1, level)

    out_ntt = None          # (1+k, Lq, N) tensor accumulator, NTT domain
    z1_qp = None            # (k1, Lqp, N) NTT-domain z1 accumulator
    t_qp = None             # (k0, Lqp, N) NTT-domain t accumulator
    for ct0, ct1, h0, h1 in pairs:
        square = ct0.data is ct1.data
        d0 = ct0.data[..., :level + 1, :]
        d1 = d0 if square else ct1.data[..., :level + 1, :]
        dec0 = (slice_digits(params, h0.digits, level) if h0 is not None
                else decompose(params, d0[1:], level))
        if square and (h1 is None or h1 is h0):
            dec1 = dec0
        else:
            dec1 = (slice_digits(params, h1.digits, level)
                    if h1 is not None else decompose(params, d1[1:], level))

        x = _aggregate_keys(params, dec0, d_keys, level)
        y = _aggregate_keys(params, dec1, b_keys, level)

        nt0 = ring_q.ntt(d0)
        nt1 = nt0 if square else ring_q.ntt(d1)
        nt0_0m = ring_q.to_mont(nt0[0])
        nt1_0m = ring_q.to_mont(nt1[0])
        terms = [None] * (len(ids) + 1)
        terms[0] = ring_q.mul_mont(nt1[0], nt0_0m)
        for j, pid in enumerate(ids):
            acc = None
            if pid in ids0:
                acc = ring_q.mul_mont(nt0[1 + ids0.index(pid)], nt1_0m)
            if pid in ids1:
                tt = ring_q.mul_mont(nt1[1 + ids1.index(pid)], nt0_0m)
                acc = tt if acc is None else ring_q.add(acc, tt)
            terms[1 + j] = (acc if acc is not None
                            else jnp.zeros_like(terms[0]))
        tensor = jnp.stack(terms)
        out_ntt = tensor if out_ntt is None else ring_q.add(out_ntt, tensor)

        z1 = external_product_ntt(params, dec1, x, level)
        z1_qp = z1 if z1_qp is None else ring_qp.add(z1_qp, z1)
        t = external_product_ntt(params, dec0, y, level)
        t_qp = t if t_qp is None else ring_qp.add(t_qp, t)

    out_arr = ring_q.intt(out_ntt)
    z1 = mod_down_qp(params, z1_qp, level)
    out_arr = out_arr.at[1 + sel1].set(ring_q.add(out_arr[1 + sel1], z1))
    t = mod_down_qp(params, t_qp, level)           # (k0, Lq, N)
    dec_t = decompose(params, t, level)
    v_sum = mod_down_qp(
        params, _sum_parties_ntt(params, dec_t, v_keys, level, lazy=True), level)
    out_arr = out_arr.at[0].set(ring_q.add(out_arr[0], v_sum))
    zu = external_product(params, dec_t, u_key, level)
    out_arr = out_arr.at[1 + sel0].set(ring_q.add(out_arr[1 + sel0], zu))
    return Ciphertext(ids=ids, data=out_arr)


# ----------------------------------------------------------------------------
# Rotate / Conjugate
# ----------------------------------------------------------------------------

def rotate_with(params: Parameters, ct: Ciphertext, rtk_stacked: jax.Array,
                a_crs: jax.Array, perm_src: jax.Array, perm_sign: jax.Array,
                h: Optional[HoistedCiphertext] = None) -> Ciphertext:
    """Rotation core with the rotation-specific data (rotation keys, CRS,
    and the coefficient-domain Galois permutation tables) passed as
    arrays, so one compiled graph serves every rotation index."""
    level = ct.level
    ring_q = params.ring_q_at(level)
    dec = (slice_digits(params, h.digits, level) if h is not None
           else decompose(params, ct.data[1:], level))
    rks = slice_swk(params, rtk_stacked, level)

    # one batched iNTT+ModDown for the c0 correction and the k per-party
    # external products (poly-wise, bit-identical to separate calls)
    s_ntt = _sum_parties_ntt(params, dec, rks, level, lazy=True)
    ci_ntt = external_product_ntt(params, dec, a_crs, level, lazy=True)
    both = mod_down_qp(
        params, jnp.concatenate([s_ntt[None], ci_ntt]), level)
    c0 = ring_q.add(ct.data[0], both[0])
    out = jnp.concatenate([c0[None], both[1:]], axis=0)

    g = jnp.take(out, perm_src, axis=-1)
    out = jnp.where(perm_sign[None, :] == 1, ring_q.neg(g), g)
    return Ciphertext(ids=ct.ids, data=out)


def rotation_tables(params: Parameters, rot_idx: int):
    """Host-side per-rotation data for rotate_with: (gal perm_src,
    perm_sign) for the coefficient-domain map X -> X^g with sign fold
    (keyswitch.go:266-296)."""
    from ..ops.ring import _coeff_perm_host
    gal = galois_element_rot(rot_idx, params.n)
    src, sign = _coeff_perm_host(params.logn, gal)
    return jnp.asarray(src), jnp.asarray(sign)


def rotate(params: Parameters, ct: Ciphertext, rot_idx: int,
           rtk_stacked: jax.Array,
           h: Optional[HoistedCiphertext] = None) -> Ciphertext:
    """Slot rotation (keyswitch.go:234-298 / RotateHoisted):
      out_0 = ct_0 + sum_i Ext(ct_i, rtk_i);  out_i = Ext(ct_i, a_rot)
      then apply the coefficient-domain Galois map X -> X^g with sign fold.
    """
    while rot_idx < 0:
        rot_idx += params.n // 2
    a = params.crs_at(rot_idx, ct.level)
    src, sign = rotation_tables(params, rot_idx)
    return rotate_with(params, ct, rtk_stacked, a, src, sign, h)


def rotate_hoisted_batched(params: Parameters, ct: Ciphertext,
                           rot_idxs: Tuple[int, ...],
                           rtk_multi: jax.Array,
                           h: HoistedCiphertext) -> jax.Array:
    """R rotations of ONE hoisted ciphertext in a single batched pass.

    The reference amortizes the decomposition across FC1's 8 rotations via
    RotateHoisted in a Go loop (cnn/cnn.go:42-71,
    keyswitch_hoisted.go:183-247); on TPU we additionally batch the R
    external products and Galois permutations over a leading axis so one
    compiled region processes all rotations (bigger contractions, one pass
    over the shared digits).

    rtk_multi: (R, k, beta, Lqp, N) stacked rotation keys per index.
    Returns data (R, k+1, Lq, N); bit-identical to R calls of rotate().
    """
    level = ct.level
    ring_q = params.ring_q_at(level)
    dec = slice_digits(params, h.digits, level)        # (k, beta, Lqp, N)
    rks = slice_swk(params, rtk_multi, level)          # (R, k, beta, Lqp, N)
    a_multi = jnp.stack([params.crs_at(idx, level) for idx in rot_idxs])
    src = jnp.stack([rotation_tables(params, idx)[0] for idx in rot_idxs])
    sign = jnp.stack([rotation_tables(params, idx)[1] for idx in rot_idxs])

    s = _sum_parties_ntt(params, dec[None], rks, level,
                         lazy=True)                       # (R, Lqp, N)
    ci_ntt = external_product_ntt(params, dec[None], a_multi[:, None],
                                  level, lazy=True)       # (R, k, Lqp, N)
    both = mod_down_qp(
        params, jnp.concatenate([s[:, None], ci_ntt], axis=1), level)
    c0 = ring_q.add(ct.data[0][None], both[:, 0])         # (R, Lq, N)
    out = jnp.concatenate([c0[:, None], both[:, 1:]],
                          axis=1)                         # (R, k+1, Lq, N)
    g = jnp.take_along_axis(out, src[:, None, None, :], axis=-1)
    return jnp.where(sign[:, None, None, :] == 1, ring_q.neg(g), g)


def conjugate(params: Parameters, ct: Ciphertext,
              cjk_stacked: jax.Array) -> Ciphertext:
    """Conjugation (keyswitch.go:302-332): permute first, then key-switch."""
    level = ct.level
    ring_q = params.ring_q_at(level)
    gal = galois_element_conj(params.n)
    permuted = ring_q.permute_coeffs(ct.data, gal)
    dec = decompose(params, permuted[1:], level)
    cks = slice_swk(params, cjk_stacked, level)
    a = params.crs_at(-2, level)
    s_ntt = _sum_parties_ntt(params, dec, cks, level, lazy=True)
    ci_ntt = external_product_ntt(params, dec, a, level, lazy=True)
    both = mod_down_qp(
        params, jnp.concatenate([s_ntt[None], ci_ntt]), level)
    c0 = ring_q.add(permuted[0], both[0])
    return Ciphertext(ids=ct.ids,
                      data=jnp.concatenate([c0[None], both[1:]], axis=0))
