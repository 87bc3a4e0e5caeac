"""Native C++ exact-CRT data plane (mkhe_tpu/native) vs the pure-python
reference implementation (utils/crt.py): exact agreement for BFV scaling
and noise bits, <= 1 ulp for the centered-double conversion."""

import numpy as np
import pytest

from mkhe_tpu import native
from mkhe_tpu.utils import crt
from mkhe_tpu.ops.primes import ntt_primes

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")

rng = np.random.default_rng(11)


def _random_limbs(L, n):
    moduli = ntt_primes(10, 28.9, L)
    q = np.array(moduli, np.uint64)
    x = (rng.integers(0, 2 ** 63, (L, n), np.uint64)
         % q[:, None]).astype(np.uint32)
    return moduli, x


@pytest.mark.parametrize("L", [1, 2, 3, 14, 28])
def test_center_double_matches_python(L):
    moduli, x = _random_limbs(L, 512)
    got = native.crt_center_double(x, moduli)
    want = crt.crt_center(x, moduli)
    wantf = np.array([float(v) for v in want])
    np.testing.assert_allclose(got, wantf, rtol=1e-15)


@pytest.mark.parametrize("L", [2, 5, 14])
def test_bfv_decode_scale_exact(L):
    t = 65537
    moduli, x = _random_limbs(L, 512)
    Q = 1
    for m in moduli:
        Q *= m
    c = crt.crt_reconstruct(x, moduli)
    want = np.array([int((t * int(v) + Q // 2) // Q) % t for v in c],
                    np.uint32)
    got = native.bfv_decode_scale(x, moduli, t)
    np.testing.assert_array_equal(got, want)


def test_max_bits_matches_python():
    moduli, x = _random_limbs(6, 512)
    want = crt.log2_max_abs(crt.crt_center(x, moduli))
    got = native.crt_max_bits(x, moduli)
    assert float(got) == want


def test_edge_values():
    """All-zero and Q-1 (= -1 centered) coefficients."""
    moduli = ntt_primes(10, 28.9, 4)
    L = len(moduli)
    zeros = np.zeros((L, 8), np.uint32)
    np.testing.assert_array_equal(
        native.crt_center_double(zeros, moduli), np.zeros(8))
    minus1 = np.stack([np.full(8, m - 1, np.uint32) for m in moduli])
    np.testing.assert_array_equal(
        native.crt_center_double(minus1, moduli), np.full(8, -1.0))
    assert native.crt_max_bits(minus1, moduli) == 1
    assert native.crt_max_bits(zeros, moduli) == 0
