"""Property tests for the uint32 modular arithmetic layer against exact
python-int arithmetic (the reference validates the analogous lattigo layer
implicitly through noise bounds; we test the primitives directly)."""

import numpy as np
import jax.numpy as jnp

from mkhe_tpu.ops import modmath as mm
from mkhe_tpu.ops.primes import ntt_primes

rng = np.random.default_rng(0)


def _rand_u32(n, hi=1 << 32):
    return rng.integers(0, hi, size=n, dtype=np.uint64).astype(np.uint32)


def test_mul32_wide():
    a = _rand_u32(4096)
    b = _rand_u32(4096)
    hi, lo = mm.mul32_wide(jnp.asarray(a), jnp.asarray(b))
    got = (np.asarray(hi).astype(np.uint64) << 32) | np.asarray(lo)
    want = a.astype(np.uint64) * b.astype(np.uint64)
    np.testing.assert_array_equal(got, want)


def test_mont_mul_exact():
    for q in ntt_primes(12, 28.7, 3):
        qinv_neg, r2 = mm.mont_constants(q)
        a = _rand_u32(4096)  # lazy: any u32
        b = (_rand_u32(4096) % q).astype(np.uint32)
        b_mont = (b.astype(object) * (1 << 32) % q).astype(np.uint32)
        got = mm.mont_mul(jnp.asarray(a), jnp.asarray(b_mont),
                          np.uint32(q), np.uint32(qinv_neg))
        want = (a.astype(np.uint64) * b % q).astype(np.uint32)
        np.testing.assert_array_equal(np.asarray(got), want)


def test_shoup_mul_exact():
    q = ntt_primes(12, 28.7, 1)[0]
    w = int(_rand_u32(1)[0] % q)
    w_sh = mm.shoup_host(w, q)
    a = _rand_u32(4096)
    got = mm.shoup_mul(jnp.asarray(a), np.uint32(w), np.uint32(w_sh),
                       np.uint32(q))
    want = (a.astype(np.uint64) * w % q).astype(np.uint32)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_barrett_reduce():
    q = ntt_primes(12, 28.7, 1)[0]
    b = mm.barrett_constant(q)
    a = _rand_u32(4096)
    got = mm.barrett_reduce(jnp.asarray(a), np.uint32(q), np.uint32(b))
    np.testing.assert_array_equal(np.asarray(got), a % q)


def test_mont_accumulate():
    """The external-product inner loop: 56-term 64-bit accumulate + single
    Montgomery reduction stays exact (BFV logN=15 worst case is 2*28=56
    digits, cf. mkbfv/keyswitch.go DecomposeBFV)."""
    q = ntt_primes(12, 28.9, 1)[0]
    qinv_neg, _ = mm.mont_constants(q)
    k = 56
    a = rng.integers(0, 1 << 29, size=(k, 512), dtype=np.uint64)
    b = rng.integers(0, q, size=(k, 512), dtype=np.uint64)
    acc = mm.mul_accum_init((512,))
    for i in range(k):
        acc = mm.mul_accum_step(acc, jnp.asarray(a[i], jnp.uint32),
                                jnp.asarray(b[i], jnp.uint32))
    got = mm.mul_accum_reduce(acc, np.uint32(q), np.uint32(qinv_neg))
    got = np.asarray(got).astype(np.uint64) % q
    rinv = pow(1 << 32, -1, q)
    want = (a.astype(object) * b.astype(object)).sum(axis=0) * rinv % q
    np.testing.assert_array_equal(got, want.astype(np.uint64))


def test_to_from_mont_roundtrip():
    q = ntt_primes(12, 28.7, 1)[0]
    qinv_neg, r2 = mm.mont_constants(q)
    a = (_rand_u32(1024) % q).astype(np.uint32)
    m = mm.to_mont(jnp.asarray(a), np.uint32(q), np.uint32(qinv_neg),
                   np.uint32(r2))
    back = mm.from_mont(m, np.uint32(q), np.uint32(qinv_neg))
    np.testing.assert_array_equal(np.asarray(back), a)


def test_security_estimator():
    """HE-standard budgets: the framework's presets stay within the
    128-bit ternary caps their names claim (PN15QP880 <= 881 etc.)."""
    from mkhe_tpu.utils import security
    from mkhe_tpu import mkckks

    assert security.max_logqp(15, 128) == 881
    assert security.max_logqp(14, 128) == 438
    # preset budgets via the prime-selection half only (select_moduli):
    # building full presets (rings + CRS) is seconds of pure overhead
    q, p = mkckks.params.select_moduli(15, q0_bits=28.9, level_bits=27.0,
                                       levels=13, p_bits=28.4, p_count=4)
    lvl, total = security.check_security(15, q, p)
    assert lvl >= 128 and total <= 881
    q, p = mkckks.params.select_moduli(14, q0_bits=28.9, level_bits=26.0,
                                       levels=5, p_bits=28.4, p_count=4)
    lvl, total = security.check_security(14, q, p)
    assert lvl >= 128 and total <= 438
    import pytest
    with pytest.raises(ValueError):
        security.check_security(10, [2**28 - 57] * 4, minimum=128)
