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


def test_params_from_literal_json(tmp_path):
    """Reference-style ParametersLiteral JSON override (the -params flag,
    mkrlwe/mkrlwe_test.go:18,56-60): moduli map to u32 limb pairs with
    preserved sizes, and the resulting params encrypt/decrypt."""
    import json
    import math
    import numpy as np
    from mkhe_tpu import mkrlwe, mkckks

    doc = {"LogN": 9, "LogSlots": 8, "Scale": 2.0 ** 40,
           "Q": [57.8, 40.0, 40.0], "P": [56.8], "Gamma": 2}
    path = tmp_path / "params.json"
    path.write_text(json.dumps(doc))
    params = mkckks.from_literal(str(path))
    assert params.logn == 9 and params.slots == 256
    # per-modulus sizes preserved within 0.2%
    lq = list(params.rlwe.q_moduli)
    assert abs(math.log2(lq[0] * lq[1]) - 57.8) < 0.1
    assert abs(math.log2(lq[2] * lq[3]) - 40.0) < 0.1
    kgen = mkrlwe.KeyGenerator(params.rlwe, seed=61)
    sk, pk = kgen.gen_key_pair("u0")
    sks = mkrlwe.SecretKeySet(); sks.add(sk)
    enc = mkckks.Encryptor(params, seed=62)
    dec = mkckks.Decryptor(params)
    rng = np.random.default_rng(5)
    m = rng.uniform(-1, 1, params.slots) + 1j * rng.uniform(-1, 1, params.slots)
    out = dec.decrypt(enc.encrypt_msg(mkckks.Message(value=m), pk), sks)
    err = np.max(np.abs(out.value - m))
    assert math.log2(max(err, 1e-300)) <= -math.log2(params.scale) + params.logslots + 8
