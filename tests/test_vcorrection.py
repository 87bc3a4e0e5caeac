"""Stress tests for the float32 HPS v-correction (VERDICT r3 #3).

basis.mod_up computes the base-extension correction v = floor(sum y_i/b_i)
in float32 (the reference uses float64, basis_extension.go:499-517). The
documented contract: an off-by-one in v (probability ~2^-20 per
coefficient on random inputs) shifts the lifted integer by exactly +-B —
never anything else — and the divide-and-round consumers (mod_down,
rescale, BFV quantize) absorb a +-B shift as <= 1 ulp of rounding noise.

These tests machine-check both halves at flagship limb widths and N:

  1. an EXACT uint64 reference of the same mod_up (integer v) runs next
     to the float32 path on ADVERSARIAL coefficients crafted so
     sum y_i/b_i lands within float32 ulp of an integer from both sides
     (maximum off-by-one likelihood): every deviation must be exactly
     +-B mod d_j, and the off-by-one rate on random inputs must stay
     far below the adversarial rate;
  2. mod_down on inputs whose conversion carries forced off-by-ones must
     stay within 1 of the exact rounded quotient.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mkhe_tpu.ops import basis, modmath as mm
from mkhe_tpu.ops.ring import Ring
from mkhe_tpu.ops.primes import ntt_primes

LOGN = 15  # flagship lane count: rounding events scale with N


@pytest.fixture(scope="module")
def rings():
    q = ntt_primes(LOGN, 27.0, 2)      # one flagship-width digit pair
    dst = ntt_primes(LOGN, 28.4, 4)    # extension targets
    return (Ring.create(tuple(q), LOGN), Ring.create(tuple(dst), LOGN))


def _exact_mod_up_u64(y, src, dst):
    """Exact integer base extension of canonical y (2, N): lifts
    x = CRT(y) in [0, B) and reduces into each dst modulus. u64-exact."""
    b0, b1 = int(src[0]), int(src[1])
    B = b0 * b1
    y0 = y[0].astype(object)
    y1 = y[1].astype(object)
    lifted = (y0 * (B // b0) + y1 * (B // b1)) % B
    out = np.empty((len(dst), y.shape[1]), np.uint32)
    for j, dj in enumerate(dst):
        out[j] = (lifted % int(dj)).astype(np.uint32)
    return out, lifted


def _float_path_residues(y, src_ring, dst_ring):
    """Run the production float32-corrected mod_up on PRE-COMPUTED y
    values (skip the qhat_inv multiply by inverting it on the inputs)."""
    t = basis.mod_up_tables(src_ring.moduli, dst_ring.moduli)
    # choose x such that mod_up's internal y equals our y: x_i = y_i *
    # qhat_i mod b_i (mod_up computes y_i = x_i * qhat_inv_i)
    x = np.empty_like(y)
    for i, bi in enumerate(src_ring.moduli):
        bhat = (int(np.prod([int(b) for b in src_ring.moduli])) // bi)
        x[i] = ((y[i].astype(object) * (bhat % bi)) % bi).astype(np.uint32)
    r = basis.mod_up(jnp.asarray(x), src_ring, dst_ring, t)
    return np.asarray(r)


def _adversarial_pairs(src, n, rng):
    """(2, n) canonical pairs with sum y0/b0 + y1/b1 within float32 ulp
    of an integer, approached from both sides."""
    b0, b1 = int(src[0]), int(src[1])
    y0 = rng.integers(1, b0, n, dtype=np.int64)
    # y1 ~ b1 * (1 - y0/b0) puts the sum right at 1; jitter +-2 lands on
    # both sides of the boundary
    target = np.round(b1 * (1.0 - y0.astype(np.float64) / b0)).astype(
        np.int64)
    jitter = rng.integers(-2, 3, n)
    y1 = np.clip(target + jitter, 0, b1 - 1)
    return np.stack([y0.astype(np.uint32), y1.astype(np.uint32)])


def test_off_by_one_is_exactly_plus_minus_B(rings):
    src_ring, dst_ring = rings
    rng = np.random.default_rng(3)
    n = src_ring.n
    y = _adversarial_pairs(src_ring.moduli, n, rng)
    got = _float_path_residues(y, src_ring, dst_ring)
    want, lifted = _exact_mod_up_u64(y, src_ring.moduli, dst_ring.moduli)
    B = int(src_ring.moduli[0]) * int(src_ring.moduli[1])
    n_events = 0
    for j, dj in enumerate(dst_ring.moduli):
        dj = int(dj)
        diff = (got[j].astype(np.int64) - want[j].astype(np.int64)) % dj
        bad = diff != 0
        # every deviation must be exactly -B or +B mod d_j
        allowed = {(-B) % dj, B % dj}
        assert set(np.unique(diff[bad]).tolist()) <= allowed, \
            "off-by-one produced a shift other than +-B"
        n_events = max(n_events, int(bad.sum()))
    # adversarial inputs MUST trigger events (otherwise the test is
    # vacuous) — boundary sums flip with probability ~1/2 per crafted pair
    assert n_events > n // 100, f"adversarial set too weak: {n_events}"


def test_random_off_by_one_rate(rings):
    src_ring, dst_ring = rings
    rng = np.random.default_rng(4)
    n = src_ring.n
    reps = 8                      # 8 * 2^15 = 2^18 coefficients
    events = 0
    for _ in range(reps):
        y = np.stack([
            rng.integers(0, int(src_ring.moduli[0]), n).astype(np.uint32),
            rng.integers(0, int(src_ring.moduli[1]), n).astype(np.uint32)])
        got = _float_path_residues(y, src_ring, dst_ring)
        want, _ = _exact_mod_up_u64(y, src_ring.moduli, dst_ring.moduli)
        events += int((got[0] != want[0]).sum())
    # documented rate ~2^-20/coefficient; assert a loose 2^-13 ceiling
    # (64 events in 2^18 samples) so a regression to float16-grade
    # precision or a dropped clip would fail loudly
    assert events <= 64, f"off-by-one rate too high: {events} / 2^18"


def test_mod_down_absorbs_off_by_one(rings):
    """Divide-and-round by P with adversarial P-part: the result must be
    within 1 of the exact rounded quotient for every coefficient."""
    src_ring, dst_ring = rings          # src = "P" (2 limbs), dst = "Q"
    rng = np.random.default_rng(5)
    n = src_ring.n
    P = int(src_ring.moduli[0]) * int(src_ring.moduli[1])
    yp = _adversarial_pairs(src_ring.moduli, n, rng)
    # build xq = (value * P + xp_lift) mod q for a known integer quotient
    value = rng.integers(0, 1 << 40, n).astype(object)
    _, xp_lift = _exact_mod_up_u64(yp, src_ring.moduli, dst_ring.moduli)
    # mod_up consumes y = x * qhat_inv; reuse the inversion trick
    xp = np.empty_like(yp)
    for i, bi in enumerate(src_ring.moduli):
        bhat = P // int(bi)
        xp[i] = ((yp[i].astype(object) * (bhat % int(bi))) % int(bi)
                 ).astype(np.uint32)
    full = value * P + xp_lift
    xq = np.empty((len(dst_ring.moduli), n), np.uint32)
    for j, dj in enumerate(dst_ring.moduli):
        xq[j] = (full % int(dj)).astype(np.uint32)
    got = np.asarray(basis.mod_down(jnp.asarray(xq), jnp.asarray(xp),
                                    dst_ring, src_ring))
    # exact rounded quotient: round(full / P) = value + round(xp_lift/P)
    want = value + (xp_lift + P // 2) // P
    for j, dj in enumerate(dst_ring.moduli):
        dj = int(dj)
        diff = (got[j].astype(np.int64) - np.array(
            [int(w) % dj for w in want], np.int64)) % dj
        bad = (diff != 0) & (diff != 1) & (diff != dj - 1)
        assert not bad.any(), \
            f"mod_down deviated by more than 1 ulp on limb {j}"
