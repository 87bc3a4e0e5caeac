"""Exact uint32 modular arithmetic, vectorized for the TPU VPU.

The TPU vector unit is a native 32-bit machine with no 64-bit integer
multiply, so every 32x32 -> 64-bit product is built from 16-bit half-words
(four exact u32 products + carry chains). All functions below are pure jnp,
shape-polymorphic, and run identically on CPU (tests) and TPU (bench).

Invariants used throughout the framework:
  - moduli q < 2**29 (ops/primes.py), canonical residues in [0, q)
  - "Montgomery form" of x is x * 2**32 mod q; mont_mul(a, b_mont) returns
    a*b mod q given any a < 2**32 and b_mont < q (lazy-tolerant first arg,
    mirroring lattigo's MRed contract used all over the reference, e.g.
    mkrlwe/basis_extension.go:220-227)
  - "Shoup form" of a constant w is floor(w * 2**32 / q); shoup_mul accepts
    any a < 2**32 and returns a*w mod q in [0, 2q) (lazy) or [0, q).

Reference parity: this module plays the role of lattigo's ring modular
arithmetic (ring.MRed/MForm/InvMForm/BRed/CRed), cited in SURVEY.md §2.2.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

U32 = jnp.uint32
MASK16 = np.uint32(0xFFFF)


# ----------------------------------------------------------------------------
# 64-bit building blocks from 16-bit halves
# ----------------------------------------------------------------------------

def mul32_wide(a, b):
    """Full 64-bit product of two uint32 arrays, as (hi, lo) uint32 pair."""
    a = a.astype(U32)
    b = b.astype(U32)
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    # mid = lh + hl can overflow u32; track the carry explicitly.
    mid = lh + hl
    mid_carry = (mid < lh).astype(U32)
    lo = ll + (mid << 16)
    lo_carry = (lo < ll).astype(U32)
    hi = hh + (mid >> 16) + (mid_carry << 16) + lo_carry
    return hi, lo


def mul32_hi(a, b):
    """High 32 bits of the 64-bit product (same cost as mul32_wide)."""
    return mul32_wide(a, b)[0]


def add64(hi, lo, hi2, lo2):
    """(hi,lo) + (hi2,lo2) as 64-bit values in u32 pairs (wrap mod 2**64)."""
    lo_out = lo + lo2
    carry = (lo_out < lo).astype(U32)
    hi_out = hi + hi2 + carry
    return hi_out, lo_out


# ----------------------------------------------------------------------------
# Host-side constant helpers (python ints)
# ----------------------------------------------------------------------------

def mont_constants(q: int):
    """Returns (qinv_neg, r2) with qinv_neg = -q^{-1} mod 2^32 and
    r2 = 2^64 mod q (for converting to Montgomery form via mont_mul)."""
    qinv = pow(q, -1, 1 << 32)
    qinv_neg = ((1 << 32) - qinv) & 0xFFFFFFFF
    r2 = (1 << 64) % q
    return qinv_neg, r2


def to_mont_host(x: int, q: int) -> int:
    return (x << 32) % q


def shoup_host(w: int, q: int) -> int:
    """Shoup precomputation floor(w * 2^32 / q) for w in [0, q)."""
    return (w << 32) // q


def barrett_constant(q: int) -> int:
    """floor(2^32 / q) for the single-word Barrett reduction."""
    return (1 << 32) // q


# ----------------------------------------------------------------------------
# Modular primitives (q, qinv, ... broadcastable uint32 arrays)
# ----------------------------------------------------------------------------

def csub(a, q):
    """Conditional subtract: a - q if a >= q else a (one reduction step)."""
    return jnp.where(a >= q, a - q, a)


def add_mod(a, b, q):
    """(a + b) mod q for canonical inputs in [0, q)."""
    return csub(a + b, q)


def sub_mod(a, b, q):
    """(a - b) mod q for canonical inputs in [0, q)."""
    return csub(a + q - b, q)


def neg_mod(a, q):
    """-a mod q for canonical input in [0, q)."""
    return jnp.where(a == 0, a, q - a)


def mont_reduce_wide(hi, lo, q, qinv_neg):
    """REDC of a 64-bit value (hi,lo): returns value * 2^-32 mod q, < 2q.

    Requires hi < q * (1 - eps) head-room: exact condition hi + q <= 2^32 - 1,
    true for all products of (a < 2^32) * (b < q < 2^29).
    """
    m = lo * qinv_neg  # mod 2^32
    mq_hi, mq_lo = mul32_wide(m, q)
    # lo + mq_lo ≡ 0 (mod 2^32): carry is 1 unless both halves were zero.
    carry = (lo != 0).astype(U32)
    return hi + mq_hi + carry


def mont_mul(a, b, q, qinv_neg):
    """a * b * 2^-32 mod q, result in [0, q). b typically in Montgomery form.

    Accepts any a < 2^32 (lazy), b < q.
    """
    hi, lo = mul32_wide(a, b)
    return csub(mont_reduce_wide(hi, lo, q, qinv_neg), q)


def mont_mul_lazy(a, b, q, qinv_neg):
    """Like mont_mul but returns a value in [0, 2q)."""
    hi, lo = mul32_wide(a, b)
    return mont_reduce_wide(hi, lo, q, qinv_neg)


def shoup_mul_lazy(a, w, w_shoup, q):
    """a * w mod q in [0, 2q), for any a < 2^32, fixed constant w < q.

    w_shoup = floor(w * 2^32 / q). The classic Shoup trick: one mulhi + two
    low multiplies. Used for NTT twiddles and other fixed constants.
    """
    t = mul32_hi(a, w_shoup)
    return a * w - t * q  # computed mod 2^32; mathematically in [0, 2q)


def shoup_mul(a, w, w_shoup, q):
    return csub(shoup_mul_lazy(a, w, w_shoup, q), q)


def shoup_split(w_shoup):
    """16-bit halves of a Shoup constant table (for shoup_mul_sloppy)."""
    return w_shoup & MASK16, w_shoup >> 16


def shoup_mul_sloppy(a, w, w_sh0, w_sh1, q):
    """a * w mod q in [0, 4q), for any a < 2^32 and constant w < q.

    Like shoup_mul_lazy but the quotient estimate drops the low-word
    carry chain of the exact 32-bit mulhi:
        t' = a1*w1 + (a1*w0 >> 16) + (a0*w1 >> 16)
    underestimates the exact floor(a * w_sh / 2^32) by at most 2 (the
    dropped fractional parts sum to < 3 * 2^16), so the remainder picks
    up at most 2q: r = a*w - t'*q in [0, 2q + 2q). With q < 2^29 the
    result fits uint32 exactly; values are exact mod q, so lazy chains
    built on it stay bit-identical after a final reduction. Saves ~7 VPU
    ops per multiply vs the exact mulhi — the NTT butterfly hot path.
    """
    a0 = a & MASK16
    a1 = a >> 16
    t = a1 * w_sh1 + ((a1 * w_sh0) >> 16) + ((a0 * w_sh1) >> 16)
    return a * w - t * q  # mod 2^32; true value < 4q < 2^31


def barrett_reduce(a, q, b_const):
    """Reduce any a < 2^32 to [0, q): a - floor(a * b_const / 2^32) * q
    with b_const = floor(2^32/q), then up to two conditional subtracts."""
    t = mul32_hi(a, b_const)
    r = a - t * q
    return csub(csub(r, q), q)


def to_mont(a, q, qinv_neg, r2):
    """Convert canonical a to Montgomery form: a * 2^32 mod q."""
    return mont_mul(a, r2, q, qinv_neg)


def from_mont(a, q, qinv_neg):
    """Convert Montgomery-form a (< 2^32, lazy ok) back to canonical."""
    return csub(mont_reduce_wide(jnp.zeros_like(a), a, q, qinv_neg), q)


# ----------------------------------------------------------------------------
# 64-bit accumulate + single reduction (the external-product inner loop)
# ----------------------------------------------------------------------------

def mul_accum_init(shape):
    z = jnp.zeros(shape, dtype=U32)
    return z, z


def mul_accum_step(acc, a, b):
    """acc += a*b as an exact 64-bit (hi,lo) pair. Safe for up to 64 terms
    with a < 2^31, b < 2^29 (hi parts < 2^26 each)."""
    hi, lo = acc
    phi, plo = mul32_wide(a, b)
    return add64(hi, lo, phi, plo)


def mul_accum_reduce(acc, q, qinv_neg):
    """Montgomery-reduce the 64-bit accumulator: sum * 2^-32 mod q, < 2q.

    Mirrors the reference's 128-bit accumulate + lazy reduce in multSum
    (mkrlwe/basis_extension.go:582-646), scaled down to the 32-bit world.
    """
    hi, lo = acc
    return mont_reduce_wide(hi, lo, q, qinv_neg)
