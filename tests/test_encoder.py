"""CKKS encoder/decoder unit tests (pure numpy — fast).

Covers the round-2 advisor fixes: the 2-limb CRT decode fast path must
serve ordinary (negative-coefficient) plaintexts without falling back to
the big-int CRT, the self-check must still catch genuinely oversized
magnitudes, and sparse packing must reject too-long inputs."""

import numpy as np
import pytest

from mkhe_tpu.mkckks import encoder
from mkhe_tpu.utils import crt
from mkhe_tpu.ops.primes import ntt_primes

LOGN = 10
MODULI = ntt_primes(LOGN, 28.9, 5)
SCALE = 2.0 ** 40

rng = np.random.default_rng(3)


def _roundtrip(vals, **kw):
    poly = encoder.encode(vals, SCALE, MODULI, LOGN, **kw)
    return encoder.decode(poly, SCALE, MODULI, LOGN, **kw)


def test_roundtrip():
    vals = rng.uniform(-1, 1, 1 << (LOGN - 1)) \
        + 1j * rng.uniform(-1, 1, 1 << (LOGN - 1))
    out = _roundtrip(vals)
    np.testing.assert_allclose(out, vals, atol=1e-8)


def test_decode_fast_path_handles_negatives(monkeypatch):
    """Small-magnitude decode must NOT fall back to the python big-int
    CRT (r1 advisor medium: the uncentered self-check rejected every
    negative coefficient, making decode O(N) python at logN=15)."""
    vals = rng.uniform(-1, 1, 1 << (LOGN - 1)).astype(np.complex128)
    poly = encoder.encode(vals, SCALE, MODULI, LOGN)

    def boom(*a, **k):
        raise AssertionError("decode fell back to exact CRT")

    monkeypatch.setattr(crt, "crt_center", boom)
    monkeypatch.setattr(encoder, "_center_float", boom)
    out = encoder.decode(poly, SCALE, MODULI, LOGN)
    np.testing.assert_allclose(out[: vals.size], vals, atol=1e-8)


def test_decode_self_check_catches_large_values():
    """Values above q0*q1/2 must take the exact path and still decode
    correctly (the post-MultByConst pre-Rescale magnitude regime)."""
    big_scale = float(MODULI[0]) * float(MODULI[1]) * 4.0
    vals = rng.uniform(0.5, 1.0, 1 << (LOGN - 1)).astype(np.complex128)
    poly = encoder.encode(vals, big_scale, MODULI, LOGN)
    out = encoder.decode(poly, big_scale, MODULI, LOGN)
    np.testing.assert_allclose(out, vals, atol=1e-6)


def test_sparse_packing_roundtrip():
    logslots = LOGN - 3
    vals = rng.uniform(-1, 1, 1 << logslots).astype(np.complex128)
    out = _roundtrip(vals, logslots=logslots)
    assert out.shape[0] == 1 << logslots
    np.testing.assert_allclose(out, vals, atol=1e-8)


def test_sparse_packing_rejects_too_many_values():
    logslots = LOGN - 3
    vals = np.ones((1 << logslots) + 1, np.complex128)
    with pytest.raises(ValueError, match="too many values"):
        encoder.encode(vals, SCALE, MODULI, LOGN, logslots=logslots)
