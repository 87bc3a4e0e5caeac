"""NTT correctness: roundtrip, negacyclic convolution, and automorphisms,
validated against exact python-int models."""

import numpy as np
import jax.numpy as jnp

from mkhe_tpu.ops.ring import (Ring, galois_element_rot, galois_element_conj)
from mkhe_tpu.ops.primes import ntt_primes

rng = np.random.default_rng(1)


def _ring(logn=8, nlimbs=3, bits=28.7):
    return Ring.create(ntt_primes(logn, bits, nlimbs), logn)


def _rand_poly(ring, *batch):
    qs = np.array(ring.moduli, dtype=np.uint64)
    x = rng.integers(0, 1 << 60, size=(*batch, ring.nlimbs, ring.n))
    return (x % qs[:, None]).astype(np.uint32)


def test_ntt_roundtrip():
    ring = _ring()
    a = _rand_poly(ring, 2)
    back = np.asarray(ring.intt(ring.ntt(jnp.asarray(a))))
    np.testing.assert_array_equal(back, a)


def test_ntt_matches_direct_evaluation():
    """Slot j of the NTT holds p(psi^(2*brv(j)+1)) for each limb."""
    logn = 4
    ring = _ring(logn=logn, nlimbs=2)
    n = ring.n
    a = _rand_poly(ring)
    got = np.asarray(ring.ntt(jnp.asarray(a)))
    from mkhe_tpu.ops.primes import primitive_root_2n, bit_reverse
    for li, q in enumerate(ring.moduli):
        psi = primitive_root_2n(q, logn)
        for j in range(n):
            e = 2 * bit_reverse(j, logn) + 1
            root = pow(psi, e, q)
            want = sum(int(a[li, i]) * pow(root, i, q) for i in range(n)) % q
            assert got[li, j] == want


def test_negacyclic_convolution():
    """NTT pointwise product == negacyclic (mod X^N+1) polynomial product."""
    ring = _ring(logn=6, nlimbs=2)
    n = ring.n
    a = _rand_poly(ring)
    b = _rand_poly(ring)
    an = ring.ntt(jnp.asarray(a))
    bn = ring.to_mont(ring.ntt(jnp.asarray(b)))
    cn = ring.mul_mont(an, bn)
    got = np.asarray(ring.intt(cn))
    for li, q in enumerate(ring.moduli):
        want = np.zeros(n, dtype=object)
        for i in range(n):
            for j in range(n):
                k = i + j
                s = 1 if k < n else -1
                want[k % n] += s * int(a[li, i]) * int(b[li, j])
        want = np.mod(want, q).astype(np.uint64)
        np.testing.assert_array_equal(got[li].astype(np.uint64), want)


def test_automorphism_coeff_vs_ntt():
    """Coefficient-domain permutation and NTT-domain permutation agree."""
    ring = _ring(logn=7, nlimbs=2)
    n = ring.n
    a = jnp.asarray(_rand_poly(ring))
    for gal in (galois_element_rot(3, n), galois_element_conj(n), 5):
        via_coeff = ring.ntt(ring.permute_coeffs(a, gal))
        via_ntt = ring.permute_ntt(ring.ntt(a), gal)
        np.testing.assert_array_equal(np.asarray(via_coeff),
                                      np.asarray(via_ntt))


def test_lazy_input_reduction():
    ring = _ring(logn=6, nlimbs=2)
    a = _rand_poly(ring)
    lazy = a.astype(np.uint64) + np.array(ring.moduli, np.uint64)[:, None]
    out1 = np.asarray(ring.ntt(jnp.asarray(a)))
    out2 = np.asarray(ring.ntt(jnp.asarray(lazy.astype(np.uint32)),
                               reduce_input=True))
    np.testing.assert_array_equal(out1, out2)


def test_mxu_tail_apply_exact():
    """The int8-digit MXU tail map (ntt_pallas._tail_apply) equals the
    direct simulation of the 7 small-h butterfly stages over Z_q, for
    lazy (< 2q) and arbitrary u32 inputs."""
    import numpy as np
    import jax.numpy as jnp
    from mkhe_tpu.ops.ring import Ring
    from mkhe_tpu.ops.primes import ntt_primes
    from mkhe_tpu.ops import ntt_pallas

    logn = 11
    n = 1 << logn
    moduli = ntt_primes(logn, 28.9, 3)
    ring = Ring.create(moduli, logn)
    rng = np.random.default_rng(8)
    x = rng.integers(0, 1 << 32, (2, 3, n), np.uint64).astype(np.uint32)

    def simulate(xrow, q, wpack_row, inverse):
        # exact numpy replay of the tail stages on each 128-lane block
        offs = {}
        off = 0
        for s in range(1, logn + 1):
            offs[n >> s] = off
            off += n >> s
        blocks = xrow.reshape(-1, 128).astype(np.uint64)
        lane = np.arange(128)
        hs = [1, 2, 4, 8, 16, 32, 64] if inverse else [64, 32, 16, 8, 4, 2, 1]
        a = blocks % q
        for h in hs:
            first = (lane & h) == 0
            tw = (np.tile(wpack_row[offs[h]:offs[h] + h], 128 // h)
                  .astype(np.uint64) if h > 1 else np.ones(128, np.uint64))
            p = np.roll(a, -h, axis=1)
            mn = np.roll(a, h, axis=1)
            if inverse:
                operand = np.where(first[None], p, a)
                v = operand * tw[None] % q
                a = np.where(first[None], (a + v) % q, (mn + q - v) % q)
            else:
                top = (a + p) % q
                bot = ((mn + q - a) % q) * tw[None] % q
                a = np.where(first[None], top, bot)
        return a.reshape(-1).astype(np.uint32)

    for inverse in (False, True):
        tm = ring.tail_inv if inverse else ring.tail_fwd
        got = np.asarray(ntt_pallas._tail_apply(
            jnp.asarray(x), tm, ring.tail_pow, ring.q, ring.qinv_neg))
        for bi in range(2):
            for li, q in enumerate(moduli):
                want = simulate(x[bi, li],
                                np.uint64(q),
                                np.asarray(ring.iwpack[li] if inverse
                                           else ring.wpack[li]),
                                inverse)
                np.testing.assert_array_equal(got[bi, li], want,
                                              err_msg=f"inv={inverse} "
                                                      f"limb={li}")
