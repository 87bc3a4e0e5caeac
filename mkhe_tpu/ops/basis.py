"""Exact RNS basis extension, ModDown, gadget decomposition and rescaling.

TPU-native rebuild of the reference's FastBasisExtender/Decomposer
(mkrlwe/basis_extension.go, HPS eprint 2018/117) and of lattigo's
DivRoundByLastModulusMany:

  - mod_up: x in basis B -> x (+ small multiple-of-B slack) in basis D via
    y_i = x_i * (B/b_i)^{-1} mod b_i; out_j = sum_i y_i * (B/b_i) - v*B
    (mod d_j), with the correction v = floor(sum y_i / b_i) computed in
    float32. An off-by-one in v (probability ~2^-20 per coefficient) adds
    exactly +-B to the lifted integer, i.e. <= 1 ulp of extra noise after
    the divisions that follow — the identical trade the reference makes
    with float64 (basis_extension.go:499-517).
  - mod_down: divide-and-round by P (the key-switch rescale).
  - decompose: the KKLSS gadget digit expansion with gamma grouping; for
    alpha == 1 each digit is a single-limb broadcast (the reference's
    copy fast path, basis_extension.go:442-451).
  - div_round_by_last_moduli: CKKS rescaling (exact, integer-only).

All tables are precomputed host-side with python ints and stored as uint32
device arrays inside pytree dataclasses.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import modmath as mm
from .ring import Ring

U32 = jnp.uint32


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["qhat_inv_mont", "qhat_dst_mont", "qhat_dst",
                 "qhat_dst_sh", "vq_dst", "inv_b_f32"],
    meta_fields=["src_moduli", "dst_moduli"],
)
@dataclasses.dataclass(frozen=True)
class ModUpTables:
    """Tables for exact base conversion from src basis B to dst basis D."""
    src_moduli: Tuple[int, ...]
    dst_moduli: Tuple[int, ...]
    qhat_inv_mont: jax.Array   # (Ls,)  (B/b_i)^{-1} mod b_i, Montgomery
    qhat_dst_mont: jax.Array   # (Ls, Ld)  B/b_i mod d_j, Montgomery
    qhat_dst: jax.Array        # (Ls, Ld)  B/b_i mod d_j, plain
    qhat_dst_sh: jax.Array     # (Ls, Ld)  Shoup companions of qhat_dst
    vq_dst: jax.Array          # (Ld, Ls+1)  v*B mod d_j for v = 0..Ls
    inv_b_f32: jax.Array       # (Ls,) float32 1/b_i


@functools.lru_cache(maxsize=None)
def mod_up_tables(src: Tuple[int, ...], dst: Tuple[int, ...]) -> ModUpTables:
    B = 1
    for b in src:
        B *= b
    ls, ld = len(src), len(dst)
    qhat_inv = np.empty(ls, np.uint32)
    qhat_dst = np.empty((ls, ld), np.uint32)
    qhat_plain = np.empty((ls, ld), np.uint32)
    qhat_sh = np.empty((ls, ld), np.uint32)
    for i, bi in enumerate(src):
        bhat = B // bi
        qhat_inv[i] = mm.to_mont_host(pow(bhat % bi, -1, bi), bi)
        for j, dj in enumerate(dst):
            qhat_dst[i, j] = mm.to_mont_host(bhat % dj, dj)
            qhat_plain[i, j] = bhat % dj
            qhat_sh[i, j] = mm.shoup_host(bhat % dj, dj)
    vq = np.empty((ld, ls + 1), np.uint32)
    for j, dj in enumerate(dst):
        for v in range(ls + 1):
            vq[j, v] = (v * B) % dj
    # NOTE: tables are cached as numpy arrays (not jnp) so that a first
    # call from inside a jit trace does not cache tracers; jnp ops consume
    # them as constants.
    return ModUpTables(
        src_moduli=src, dst_moduli=dst,
        qhat_inv_mont=qhat_inv,
        qhat_dst_mont=qhat_dst,
        qhat_dst=qhat_plain,
        qhat_dst_sh=qhat_sh,
        vq_dst=vq,
        inv_b_f32=(1.0 / np.array(src, np.float64)).astype(np.float32))


def mod_up(x, src_ring: Ring, dst_ring: Ring, tables: ModUpTables,
           lazy: bool = False) -> jax.Array:
    """Convert (..., Ls, N) in basis src to (..., Ld, N) in basis dst.

    Output is canonical in [0, d_j), or — with lazy=True — in [0, 4 d_j)
    (skips the canonicalizing Barrett; same value mod d_j). Lazy is the
    fast path for consumers that absorb lazy inputs exactly: the forward
    NTT twist and mont_mul both accept any u32, so the Barrett pass would
    be pure waste. The lifted integer equals the input representative in
    [0, B) up to a rare +-B (see module docstring).
    """
    ls = len(tables.src_moduli)
    sq = src_ring.q[:, None]
    sqinv = src_ring.qinv_neg[:, None]
    # y_i = x_i * (B/b_i)^{-1} mod b_i  (canonical)
    y = mm.mont_mul(x, tables.qhat_inv_mont[:, None], sq, sqinv)
    # correction v = floor(sum y_i / b_i), float32
    vf = jnp.sum(y.astype(jnp.float32) * tables.inv_b_f32[:, None],
                 axis=-2)
    v = jnp.floor(vf).astype(jnp.int32)
    v = jnp.clip(v, 0, ls)
    dq = dst_ring.q[:, None]
    q4 = dq * jnp.uint32(4)
    if ls == 2:
        # Shoup fast path (the alpha=2 decompose hot path, and the Lp=2
        # ModDown extension): the two per-(i, j) constants ride as
        # plain+Shoup tables, so each output is two sloppy Shoup
        # multiplies (< 4q each, sum < 8q < 2^32) and one csub back to
        # < 4q — instead of the 64-bit accumulate + Montgomery reduce.
        # Exact mod q either way.
        c0 = tables.qhat_dst[0][:, None]
        c0s = tables.qhat_dst_sh[0][:, None]
        c1 = tables.qhat_dst[1][:, None]
        c1s = tables.qhat_dst_sh[1][:, None]
        r = mm.csub(
            mm.shoup_mul_sloppy(y[..., 0:1, :], c0, c0s & mm.MASK16,
                                c0s >> 16, dq)
            + mm.shoup_mul_sloppy(y[..., 1:2, :], c1, c1s & mm.MASK16,
                                  c1s >> 16, dq), q4)             # < 4q
    else:
        # acc_j = sum_i y_i * (B/b_i mod d_j), 64-bit, Montgomery-reduced
        out_shape = (*y.shape[:-2], len(tables.dst_moduli), y.shape[-1])
        acc = mm.mul_accum_init(out_shape)
        for i in range(ls):
            acc = mm.mul_accum_step(acc, y[..., i:i + 1, :],
                                    tables.qhat_dst_mont[i][:, None])
        r = mm.mont_reduce_wide(acc[0], acc[1], dq,
                                dst_ring.qinv_neg[:, None])       # < 2q
    # r < 4q. Subtract v*B mod d_j; v only takes ls+1 values: a
    # where-chain keeps this on the VPU instead of a per-coefficient
    # dynamic gather (slow on TPU); bit-identical to the table lookup.
    vq = jnp.asarray(tables.vq_dst)  # (Ld, Ls+1)
    ve = v[..., None, :]             # broadcast over the dst limb axis
    corr = jnp.zeros_like(r)
    for vi in range(1, ls + 1):
        corr = jnp.where(ve == vi, vq[:, vi][:, None], corr)
    if lazy:
        # r + (2q - corr) < 6q; one csub restores the documented < 4q
        # contract (mod_down's lazy difference depends on it).
        return mm.csub(r + (dq * jnp.uint32(2) - corr), q4)       # < 4q
    r = mm.barrett_reduce(r, dq, dst_ring.bar[:, None])
    return mm.sub_mod(r, corr, dq)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["pinv_mont"],
    meta_fields=["q_moduli", "p_moduli"],
)
@dataclasses.dataclass(frozen=True)
class ModDownTables:
    q_moduli: Tuple[int, ...]
    p_moduli: Tuple[int, ...]
    pinv_mont: jax.Array  # (Lq,)  P^{-1} mod q_j, Montgomery form


@functools.lru_cache(maxsize=None)
def mod_down_tables(qm: Tuple[int, ...], pm: Tuple[int, ...]) -> ModDownTables:
    P = 1
    for p in pm:
        P *= p
    pinv = np.array([mm.to_mont_host(pow(P % q, -1, q), q) for q in qm],
                    np.uint32)
    return ModDownTables(q_moduli=qm, p_moduli=pm, pinv_mont=pinv)


def mod_down(xq, xp, ring_q: Ring, ring_p: Ring) -> jax.Array:
    """Divide-and-round by P: (xq, xp) in basis QP -> round(x/P) in basis Q.

    Mirrors FastBasisExtender.ModDownQPtoQ (basis_extension.go:192-232):
    out = (xq - ModUp_PtoQ(xp)) * P^{-1} mod q. The rounding error is the
    centered representative of (x mod P), magnitude <= P/2 -> |err| <= 1/2
    plus the rare mod_up slack.
    """
    t_up = mod_up_tables(ring_p.moduli, ring_q.moduli)
    t_dn = mod_down_tables(ring_q.moduli, ring_p.moduli)
    conv = mod_up(xp, ring_p, ring_q, t_up, lazy=True)     # < 4q
    # lazy difference: xq + (4q - conv) === xq - conv (mod q), < 5q; the
    # Montgomery multiply below accepts any u32 first operand, so no
    # canonicalization pass is needed. Output identical to the canonical
    # chain (exact mod q, canonicalized by mont_mul).
    diff = xq + (ring_q.q[:, None] * jnp.uint32(4) - conv)
    return ring_q.mul_scalar_mont(diff, t_dn.pinv_mont)


# ----------------------------------------------------------------------------
# Gadget decomposition (KKLSS / RNS-CRT gadget with gamma grouping)
# ----------------------------------------------------------------------------

def decompose_digits(x, ring_q: Ring, ring_qp: Ring, alpha: int
                     ) -> jax.Array:
    """Decompose (..., Lq, N) coeff-domain poly into gadget digits
    (..., beta, Lqp, N), beta = ceil(Lq/alpha), each digit reduced into the
    full QP basis, coefficient domain (caller NTTs them).

    For alpha == 1 (the configuration used by all CKKS/BFV parameter sets
    here, matching gamma s.t. PCount/gamma == 1 in the reference's
    params.Alpha()), digit d is the raw limb-d residue broadcast to every
    target limb — the reference's copy fast path
    (basis_extension.go:442-451); values may exceed the target modulus and
    are reduced lazily downstream.
    """
    lq = x.shape[-2]
    beta = -(-lq // alpha)
    if alpha == 1:
        digits = jnp.broadcast_to(
            x[..., :, None, :],
            (*x.shape[:-2], lq, len(ring_qp.moduli), x.shape[-1]))
        return digits
    outs = []
    for d in range(beta):
        lo, hi = d * alpha, min((d + 1) * alpha, lq)
        src = ring_q.take(lo, hi)
        t = mod_up_tables(ring_q.moduli[lo:hi], ring_qp.moduli)
        # lazy (< 4q) digits: the caller NTTs them with reduce_input=True,
        # which the Pallas forward path absorbs for free (sloppy twist).
        outs.append(mod_up(x[..., lo:hi, :], src, ring_qp, t, lazy=True))
    return jnp.stack(outs, axis=-3)


def decompose_ntt(x, src_ring: Ring, dst_ring: Ring, alpha: int
                  ) -> jax.Array:
    """Gadget decomposition + forward NTT into the dst basis: coeff-domain
    (..., Ls, N) -> canonical NTT-domain digits (..., beta, Ld, N).

    Negative result (r4, kept as the single dispatch seam): a Pallas
    kernel fusing the digit mod_up into the forward-NTT prologue (one HBM
    pass over the digit tensor instead of three) measured ~10% SLOWER
    than this staged form at PN15/PN14 shapes — the NTT kernel is
    ALU-bound (~1 us/limb) with HBM slack, so the saved round trip buys
    nothing while the prologue's ~30 VPU ops/element serialize against
    the butterflies; XLA's standalone elementwise mod_up pass is
    effectively free. See BENCH_NOTES r4."""
    digits = decompose_digits(x, src_ring, dst_ring, alpha)
    return dst_ring.ntt(digits, reduce_input=True)


# ----------------------------------------------------------------------------
# CKKS rescaling: exact divide-and-round by the last nb moduli
# ----------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _rescale_consts(moduli: Tuple[int, ...], nb: int):
    """For each of the nb dropped limbs (from the top), precompute
    (half mod q_j for remaining j, half mod q_last, q_last^{-1} mont)."""
    steps = []
    mods = list(moduli)
    for _ in range(nb):
        ql = mods[-1]
        mods = mods[:-1]
        half = ql >> 1
        half_rem = np.array([half % q for q in mods], np.uint32)
        qlinv = np.array([mm.to_mont_host(pow(ql % q, -1, q), q)
                          for q in mods], np.uint32)
        steps.append((np.uint32(half), half_rem, qlinv))
    return steps


def div_round_by_last_moduli(x, ring_q: Ring, nb: int):
    """round(x / (q_{L-nb+1} * ... * q_L)) on (..., L, N) coeff-domain polys.
    Returns (..., L-nb, N). Equivalent of lattigo's
    DivRoundByLastModulusManyLvl used by Rescale (mkckks/evaluator.go:388).
    """
    steps = _rescale_consts(ring_q.moduli, nb)
    cur = x
    mods = ring_q
    for half, half_rem, qlinv in steps:
        L = cur.shape[-2]
        last_q = np.uint32(mods.moduli[L - 1])
        last = cur[..., L - 1, :]
        # x~ = x + half (integer add, done per-limb)
        last_t = mm.add_mod(last, half, last_q)
        rem_ring = mods.take(0, L - 1)
        rest = mm.add_mod(cur[..., :L - 1, :], half_rem[:, None],
                          rem_ring.q[:, None])
        # r = x~ mod q_last, reduced into each remaining limb
        r = mm.barrett_reduce(last_t[..., None, :], rem_ring.q[:, None],
                              rem_ring.bar[:, None])
        diff = mm.sub_mod(rest, r, rem_ring.q[:, None])
        cur = mm.mont_mul(diff, qlinv[:, None], rem_ring.q[:, None],
                          rem_ring.qinv_neg[:, None])
        mods = rem_ring
    return cur
