"""alpha=2 gadget configuration (p_count=4, gamma=2 -> two-limb digits,
the faithful analog of the reference's PCount=2/gamma=2): end-to-end
mult+relin and rotation correctness."""

import numpy as np
import pytest

from mkhe_tpu import mkrlwe, mkckks

rng = np.random.default_rng(12)


@pytest.fixture(scope="module")
def ctx():
    params = mkckks.new_parameters(
        9, 8, q0_bits=28.9, level_bits=20.0, levels=3, scale=2.0 ** 40,
        p_bits=28.0, p_count=4)
    assert params.rlwe.alpha == 2
    kgen = mkrlwe.KeyGenerator(params.rlwe, seed=71)
    sk_set = mkrlwe.SecretKeySet()
    pk_set = mkrlwe.PublicKeySet()
    rlk_set = mkrlwe.RelinearizationKeySet()
    rtk_set = mkrlwe.RotationKeySet()
    for uid in ("user0", "user1"):
        sk, pk = kgen.gen_key_pair(uid)
        r = kgen.gen_secret_key(uid)
        sk_set.add(sk)
        pk_set.add(pk)
        rlk_set.add(kgen.gen_relinearization_key(sk, r))
        rtk_set.add(kgen.gen_rotation_key(4, sk))
    enc = mkckks.Encryptor(params, seed=72)
    dec = mkckks.Decryptor(params)
    ev = mkckks.Evaluator(params)
    return dict(params=params, sk=sk_set, pk=pk_set, rlk=rlk_set,
                rtk=rtk_set, enc=enc, dec=dec, ev=ev)


def _msg(params, lo, hi):
    return mkckks.Message(
        value=rng.uniform(lo, hi, params.slots)
        + 1j * rng.uniform(lo, hi, params.slots))


def test_mul_relin_alpha2(ctx):
    params, ev = ctx["params"], ctx["ev"]
    m1 = _msg(params, -0.5, 0.5)
    m2 = _msg(params, -0.5, 0.5)
    ct1 = ctx["enc"].encrypt_msg(m1, ctx["pk"].get("user0"))
    ct2 = ctx["enc"].encrypt_msg(m2, ctx["pk"].get("user1"))
    out = ctx["dec"].decrypt(ev.mul_relin_new(ct1, ct2, ctx["rlk"]),
                             ctx["sk"])
    err = np.max(np.abs(out.value - m1.value * m2.value))
    import math
    assert math.log2(max(err, 1e-300)) <= \
        -math.log2(params.scale) + params.logslots + 12


def test_second_level_mult_alpha2(ctx):
    """Mult at a dropped level exercises odd/partial digit blocks."""
    params, ev = ctx["params"], ctx["ev"]
    m = _msg(params, -0.6, 0.6)
    ct = ctx["enc"].encrypt_msg(m, ctx["pk"].get("user0"))
    ct2 = ev.mul_relin_new(ct, ct, ctx["rlk"])
    ct4 = ev.mul_relin_new(ct2, ct2, ctx["rlk"])
    out = ctx["dec"].decrypt(ct4, ctx["sk"])
    err = np.max(np.abs(out.value - m.value ** 4))
    import math
    assert math.log2(max(err, 1e-300)) <= \
        -math.log2(params.scale) + params.logslots + 14


def test_rotate_alpha2(ctx):
    params, ev = ctx["params"], ctx["ev"]
    m = _msg(params, -0.5, 0.5)
    ct = ctx["enc"].encrypt_msg(m, ctx["pk"].get("user0"))
    out = ctx["dec"].decrypt(ev.rotate_new(ct, 4, ctx["rtk"]), ctx["sk"])
    err = np.max(np.abs(out.value - np.roll(m.value, -4)))
    import math
    assert math.log2(max(err, 1e-300)) <= \
        -math.log2(params.scale) + params.logslots + 11


def test_alpha4_rejected():
    """alpha=4 digits (~2^98) with P ~2^112 violate the KKLSS P >~ B^2
    requirement (the t-path is key-switched twice; noise scales as B^2/P)
    — parameter construction must reject it."""
    import pytest
    with pytest.raises(ValueError, match="digit too large"):
        mkckks.new_parameters(
            9, 8, q0_bits=28.9, level_bits=20.0, levels=3,
            scale=2.0 ** 40, p_bits=28.0, p_count=4, gamma=1)


def test_alpha4_noise_demonstrated():
    """Demonstrate (not just assert) the guard's claim: with alpha=4
    digits (B ~ 2^98) and P ~ 2^112, B^2/P ~ 2^84 >> q of t-path noise
    destroys the plaintext — the same pipeline that succeeds at alpha=2
    (test_mul_relin_alpha2) decrypts garbage at alpha=4. Reference
    machinery being generalized: basis_extension.go:368-535."""
    params = mkckks.new_parameters(
        9, 8, q0_bits=28.9, level_bits=20.0, levels=3,
        scale=2.0 ** 40, p_bits=28.0, p_count=4, gamma=1,
        unsafe_skip_noise_guard=True)
    assert params.rlwe.alpha == 4
    kgen = mkrlwe.KeyGenerator(params.rlwe, seed=71)
    sk_set = mkrlwe.SecretKeySet()
    rlk_set = mkrlwe.RelinearizationKeySet()
    pks = {}
    for uid in ("user0", "user1"):
        sk, pk = kgen.gen_key_pair(uid)
        sk_set.add(sk)
        rlk_set.add(kgen.gen_relinearization_key(
            sk, kgen.gen_secret_key(uid)))
        pks[uid] = pk
    enc = mkckks.Encryptor(params, seed=72)
    dec = mkckks.Decryptor(params)
    ev = mkckks.Evaluator(params)
    m0 = _msg(params, 0.2, 0.5)
    m1 = _msg(params, 0.2, 0.5)
    ct0 = enc.encrypt_msg(m0, pks["user0"])
    ct1 = enc.encrypt_msg(m1, pks["user1"])
    out = dec.decrypt(ev.mul_relin_new(ct0, ct1, rlk_set), sk_set,
                      exact=True)
    err = float(np.max(np.abs(np.asarray(out.value) - m0.value * m1.value)))
    # the product's magnitude is < 0.25; a correct mult would be within
    # 2^-20 of it. Noise B^2/P blows it up by tens of bits.
    assert err > 1e3, f"alpha=4 noise unexpectedly small: {err}"
