"""Coefficient-sharded NTT (parallel/dist_ntt.py) is bit-identical to the
single-device ring NTT on the virtual 8-device mesh, for forward/inverse,
several mesh splits, and a limb+coeff 2D mesh."""

import numpy as np
import pytest
import jax
from jax.sharding import Mesh

from mkhe_tpu.ops.primes import ntt_primes
from mkhe_tpu.ops.ring import Ring
from mkhe_tpu.parallel import dist_ntt

LOGN = 10


@pytest.fixture(scope="module")
def ring():
    return Ring.create(ntt_primes(LOGN, 26.5, 4), LOGN)


@pytest.fixture(scope="module")
def data(ring):
    rng = np.random.default_rng(5)
    q = np.asarray(ring.q)
    x = rng.integers(0, 2 ** 32, size=(3, len(q), 1 << LOGN),
                     dtype=np.uint64)
    return (x % q[None, :, None]).astype(np.uint32)


@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_forward_bit_identical(ring, data, ndev):
    mesh = Mesh(np.array(jax.devices()[:ndev]).reshape(ndev), ("coeff",))
    want = np.asarray(ring.ntt(data))
    got = np.asarray(dist_ntt.ntt_sharded(ring, data, mesh))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ndev", [2, 8])
def test_inverse_bit_identical(ring, data, ndev):
    mesh = Mesh(np.array(jax.devices()[:ndev]).reshape(ndev), ("coeff",))
    nt = ring.ntt(data)
    want = np.asarray(ring.intt(nt))
    got = np.asarray(dist_ntt.ntt_sharded(ring, nt, mesh, inverse=True))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(want, data)  # roundtrip sanity


def test_2d_mesh_limb_and_coeff(ring, data):
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                ("rns", "coeff"))
    want = np.asarray(ring.ntt(data))
    got = np.asarray(dist_ntt.ntt_sharded(ring, data, mesh,
                                          limb_axis="rns"))
    np.testing.assert_array_equal(got, want)
    nt = ring.ntt(data)
    got_i = np.asarray(dist_ntt.ntt_sharded(ring, nt, mesh, inverse=True,
                                            limb_axis="rns"))
    np.testing.assert_array_equal(got_i, np.asarray(ring.intt(nt)))


def test_under_jit(ring, data):
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("coeff",))
    fn = jax.jit(lambda x: dist_ntt.ntt_sharded(ring, x, mesh))
    np.testing.assert_array_equal(np.asarray(fn(data)),
                                  np.asarray(ring.ntt(data)))
