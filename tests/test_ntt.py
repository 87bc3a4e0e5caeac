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
