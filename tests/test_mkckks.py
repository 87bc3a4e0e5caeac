"""Multi-key CKKS end-to-end tests (port of mkckks/mkckks_test.go):
enc/dec roundtrip precision, add/sub, mult+relin with party counts 2 and 4,
rescale via constant mult, rotation, conjugation. Precision asserts follow
the reference bounds: log2|delta| <= -log2(scale) + logSlots + {8, 11, 12}.
"""

import math

import numpy as np
import pytest

from mkhe_tpu import mkrlwe, mkckks

rng = np.random.default_rng(3)

LOGN = 10
SCALE = 2.0 ** 40


@pytest.fixture(scope="module")
def params():
    return mkckks.new_parameters(
        LOGN, LOGN - 1, q0_bits=28.9, level_bits=20.0, levels=4,
        scale=SCALE, p_bits=28.4)


@pytest.fixture(scope="module")
def ctx(params):
    users = [f"user{i}" for i in range(4)]
    kgen = mkrlwe.KeyGenerator(params.rlwe, seed=21)
    sk_set = mkrlwe.SecretKeySet()
    pk_set = mkrlwe.PublicKeySet()
    rlk_set = mkrlwe.RelinearizationKeySet()
    rtk_set = mkrlwe.RotationKeySet()
    cjk_set = mkrlwe.ConjugationKeySet()
    for uid in users:
        sk, pk = kgen.gen_key_pair(uid)
        r = kgen.gen_secret_key(uid)
        sk_set.add(sk)
        pk_set.add(pk)
        rlk_set.add(kgen.gen_relinearization_key(sk, r))
        cjk_set.add(kgen.gen_conjugation_key(sk))
        kgen.gen_default_rotation_keys(sk, rtk_set)
    enc = mkckks.Encryptor(params, seed=22)
    dec = mkckks.Decryptor(params)
    ev = mkckks.Evaluator(params)
    return dict(users=users, kgen=kgen, sk=sk_set, pk=pk_set, rlk=rlk_set,
                rtk=rtk_set, cjk=cjk_set, enc=enc, dec=dec, ev=ev)


def _rand_msg(params, lo, hi):
    s = params.slots
    re = rng.uniform(lo, hi, s)
    im = rng.uniform(lo, hi, s)
    return mkckks.Message(value=re + 1j * im)


def _assert_close(params, got, want, slack):
    bound = -math.log2(params.scale) + params.logslots + slack
    delta = np.abs(got - want)
    worst = float(np.max(delta))
    assert worst > 0 or True
    assert np.log2(max(worst, 1e-300)) <= bound, \
        f"log2|delta| = {np.log2(worst):.2f} > {bound:.2f}"


def test_encode_decode_roundtrip(params):
    msg = _rand_msg(params, -1, 1)
    pt = mkckks.encoder.encode(msg.value, params.scale,
                               params.rlwe.q_moduli, params.logn)
    back = mkckks.encoder.decode(pt, params.scale, params.rlwe.q_moduli,
                                 params.logn)
    _assert_close(params, back, msg.value, 6)


def test_enc_and_dec(params, ctx):
    for uid in ctx["users"]:
        msg = _rand_msg(params, -1, 1)
        ct = ctx["enc"].encrypt_msg(msg, ctx["pk"].get(uid))
        out = ctx["dec"].decrypt(ct, ctx["sk"])
        _assert_close(params, out.value, msg.value, 8)


def test_add_sub(params, ctx):
    m1 = _rand_msg(params, -1, 1)
    m2 = _rand_msg(params, -1, 1)
    ct1 = ctx["enc"].encrypt_msg(m1, ctx["pk"].get("user0"))
    ct2 = ctx["enc"].encrypt_msg(m2, ctx["pk"].get("user1"))
    ev = ctx["ev"]
    out_add = ctx["dec"].decrypt(ev.add_new(ct1, ct2), ctx["sk"])
    out_sub = ctx["dec"].decrypt(ev.sub_new(ct1, ct2), ctx["sk"])
    _assert_close(params, out_add.value, m1.value + m2.value, 8)
    _assert_close(params, out_sub.value, m1.value - m2.value, 8)


@pytest.mark.parametrize("num_users", [2, 4])
def test_mul_relin(params, ctx, num_users):
    """testEvaluatorMul (mkckks_test.go:320-362): sum of per-user fresh
    ciphertexts, squared, bound slack 12."""
    users = ctx["users"][:num_users]
    ev = ctx["ev"]
    msgs, cts = [], []
    for uid in users:
        m = _rand_msg(params, 0.1 / num_users, 1.0 / num_users)
        msgs.append(m)
        cts.append(ctx["enc"].encrypt_msg(m, ctx["pk"].get(uid)))
    ct = cts[0]
    want = msgs[0].value.copy()
    for m, c in zip(msgs[1:], cts[1:]):
        ct = ev.add_new(ct, c)
        want = want + m.value
    want = want * want
    ct_res = ev.mul_relin_new(ct, ct, ctx["rlk"])
    out = ctx["dec"].decrypt(ct_res, ctx["sk"])
    _assert_close(params, out.value, want, 12)


def test_mul_relin_distinct_operands(params, ctx):
    """Mult of ciphertexts with different id sets (union relin path)."""
    ev = ctx["ev"]
    m1 = _rand_msg(params, -0.5, 0.5)
    m2 = _rand_msg(params, -0.5, 0.5)
    ct1 = ctx["enc"].encrypt_msg(m1, ctx["pk"].get("user0"))
    ct2 = ctx["enc"].encrypt_msg(m2, ctx["pk"].get("user1"))
    out = ctx["dec"].decrypt(ev.mul_relin_new(ct1, ct2, ctx["rlk"]),
                             ctx["sk"])
    _assert_close(params, out.value, m1.value * m2.value, 12)


def test_mul_relin_batched(params, ctx):
    """mul_relin_batched_new (vmapped serving path) is bit-identical to
    per-pair mul_relin_new, including the rescale."""
    ev = ctx["ev"]
    cts0, cts1 = [], []
    for _ in range(3):
        m0 = _rand_msg(params, -0.5, 0.5)
        m1 = _rand_msg(params, -0.5, 0.5)
        cts0.append(ctx["enc"].encrypt_msg(m0, ctx["pk"].get("user0")))
        cts1.append(ctx["enc"].encrypt_msg(m1, ctx["pk"].get("user1")))
    got = ev.mul_relin_batched_new(cts0, cts1, ctx["rlk"])
    for g, c0, c1 in zip(got, cts0, cts1):
        want = ev.mul_relin_new(c0, c1, ctx["rlk"])
        assert g.scale == want.scale and g.ids == want.ids
        np.testing.assert_array_equal(np.asarray(g.ct.data),
                                      np.asarray(want.ct.data))


def test_rescale_via_const(params, ctx):
    """testEvaluatorRescale: multiply by q_level, rescale, compare."""
    ev = ctx["ev"]
    m = _rand_msg(params, -1, 1)
    ct = ctx["enc"].encrypt_msg(m, ctx["pk"].get("user0"))
    constant = params.rlwe.q_moduli[ct.level]
    ct2 = ev.mult_by_const_new(ct, int(constant))
    ct2 = mkckks.Ciphertext(ct=ct2.ct, scale=ct2.scale * float(constant))
    ct2 = ev.rescale(ct2, params.scale)
    out = ctx["dec"].decrypt(ct2, ctx["sk"])
    _assert_close(params, out.value, m.value, 8)


def test_mul_ptxt(params, ctx):
    ev = ctx["ev"]
    m1 = _rand_msg(params, -1, 1)
    m2 = _rand_msg(params, -1, 1)
    ct = ctx["enc"].encrypt_msg(m1, ctx["pk"].get("user0"))
    pt = ctx["enc"].encode_msg(mkckks.Message(value=m2.value), ct.level)
    out = ctx["dec"].decrypt(
        ev.mul_ptxt_new(ct, pt, params.scale), ctx["sk"])
    _assert_close(params, out.value, m1.value * m2.value, 12)


@pytest.mark.parametrize("num_users", [2])
def test_rotate(params, ctx, num_users):
    """testEvaluatorRot: random rotation via power-of-two decomposition."""
    ev = ctx["ev"]
    users = ctx["users"][:num_users]
    msgs, cts = [], []
    for uid in users:
        m = _rand_msg(params, 0.5 / num_users, 1.0 / num_users)
        msgs.append(m)
        cts.append(ctx["enc"].encrypt_msg(m, ctx["pk"].get(uid)))
    ct = cts[0]
    want = msgs[0].value.copy()
    for m, c in zip(msgs[1:], cts[1:]):
        ct = ev.add_new(ct, c)
        want = want + m.value
    rot = int(rng.integers(1, params.slots))
    out = ctx["dec"].decrypt(ev.rotate_new(ct, rot, ctx["rtk"]), ctx["sk"])
    _assert_close(params, out.value, np.roll(want, -rot), 11)


def test_rotate_hoisted(params, ctx):
    ev = ctx["ev"]
    m = _rand_msg(params, -0.5, 0.5)
    ct = ctx["enc"].encrypt_msg(m, ctx["pk"].get("user0"))
    h = ev.hoisted_form(ct)
    rot = 8
    out = ctx["dec"].decrypt(
        ev.rotate_hoisted_new(ct, rot, h, ctx["rtk"]), ctx["sk"])
    _assert_close(params, out.value, np.roll(m.value, -rot), 11)


def test_conjugate(params, ctx):
    ev = ctx["ev"]
    m = _rand_msg(params, -0.5, 0.5)
    ct = ctx["enc"].encrypt_msg(m, ctx["pk"].get("user0"))
    out = ctx["dec"].decrypt(ev.conjugate_new(ct, ctx["cjk"]), ctx["sk"])
    _assert_close(params, out.value, np.conj(m.value), 11)


def test_square_then_square(params, ctx):
    """Two consecutive mults exercise rescale + level descent."""
    ev = ctx["ev"]
    m = _rand_msg(params, -0.7, 0.7)
    ct = ctx["enc"].encrypt_msg(m, ctx["pk"].get("user0"))
    ct2 = ev.mul_relin_new(ct, ct, ctx["rlk"])
    ct4 = ev.mul_relin_new(ct2, ct2, ctx["rlk"])
    out = ctx["dec"].decrypt(ct4, ctx["sk"])
    _assert_close(params, out.value, m.value ** 4, 14)


def test_mul_hoisted_one_sided(params, ctx):
    """Hoisted mult with only one operand pre-decomposed (the reference's
    MulRelinHoistedNew(ct, ct, hoisted, nil, ...) pattern,
    mkckks_test.go:540)."""
    ev = ctx["ev"]
    m = _rand_msg(params, -0.5, 0.5)
    ct = ctx["enc"].encrypt_msg(m, ctx["pk"].get("user0"))
    h = ev.hoisted_form(ct)
    out = ctx["dec"].decrypt(
        ev.mul_relin_hoisted_new(ct, ct, h, None, ctx["rlk"]), ctx["sk"])
    _assert_close(params, out.value, m.value * m.value, 12)


def test_eight_party_mult_and_rotate(params):
    """8-party evaluation (BASELINE config 4's party count, scaled down to
    the CPU test ring): add across 8 users, square, rotate."""
    users = [f"p{i}" for i in range(8)]
    kgen = mkrlwe.KeyGenerator(params.rlwe, seed=23)
    sk_set = mkrlwe.SecretKeySet()
    rlk_set = mkrlwe.RelinearizationKeySet()
    rtk_set = mkrlwe.RotationKeySet()
    pks = {}
    for uid in users:
        sk, pk = kgen.gen_key_pair(uid)
        sk_set.add(sk)
        rlk_set.add(kgen.gen_relinearization_key(
            sk, kgen.gen_secret_key(uid)))
        rtk_set.add(kgen.gen_rotation_key(2, sk))
        pks[uid] = pk
    enc = mkckks.Encryptor(params, seed=24)
    dec = mkckks.Decryptor(params)
    ev = mkckks.Evaluator(params)
    ct = None
    want = np.zeros(params.slots, np.complex128)
    for uid in users:
        m = _rand_msg(params, 0.05 / 8, 0.9 / 8)
        c = enc.encrypt_msg(m, pks[uid])
        ct = c if ct is None else ev.add_new(ct, c)
        want = want + m.value
    ct = ev.mul_relin_new(ct, ct, rlk_set)   # 8-party relin
    ct = ev.rotate_new(ct, 2, rtk_set)       # 8-party rotation
    out = dec.decrypt(ct, sk_set)
    _assert_close(params, out.value, np.roll(want * want, -2), 13)


def test_sparse_packing():
    """logSlots < logN-1 (lattigo sparse layout): values are encoded in
    the X^gap subring and replicated across the full slot vector, so
    rotations act modulo 2^logslots and mult/decode work unchanged."""
    import math as _math
    p = mkckks.new_parameters(LOGN, LOGN - 3, q0_bits=28.9,
                              level_bits=20.0, levels=4, scale=SCALE,
                              p_bits=28.4)
    kgen = mkrlwe.KeyGenerator(p.rlwe, seed=41)
    sks, pks = mkrlwe.SecretKeySet(), {}
    rlk = mkrlwe.RelinearizationKeySet()
    rtk = mkrlwe.RotationKeySet()
    for uid in ("a", "b"):
        sk, pk = kgen.gen_key_pair(uid)
        sks.add(sk); pks[uid] = pk
        rlk.add(kgen.gen_relinearization_key(sk, kgen.gen_secret_key(uid)))
        kgen.gen_default_rotation_keys(sk, rtk)
    enc, dec, ev = (mkckks.Encryptor(p, seed=42), mkckks.Decryptor(p),
                    mkckks.Evaluator(p))
    s = p.slots
    assert s == (1 << LOGN) // 8
    m1 = _rand_msg(p, -1, 1)
    m2 = _rand_msg(p, -1, 1)
    ct1 = enc.encrypt_msg(m1, pks["a"])
    ct2 = enc.encrypt_msg(m2, pks["b"])

    out = dec.decrypt(ct1, sks)
    assert out.value.shape == (s,)
    _assert_close(p, out.value, m1.value, 8)

    prod = dec.decrypt(ev.mul_relin_new(ct1, ct2, rlk), sks)
    _assert_close(p, prod.value, m1.value * m2.value, 12)

    # rotation wraps modulo the sparse slot count (replication invariant)
    rot = dec.decrypt(ev.rotate_new(ct1, 1, rtk), sks)
    _assert_close(p, rot.value, np.roll(m1.value, -1), 11)
    rot2 = dec.decrypt(ev.rotate_new(ct1, s // 2, rtk), sks)
    _assert_close(p, rot2.value, np.roll(m1.value, -(s // 2)), 11)


def test_mult_by_fractional_const(params, ctx):
    """Fractional constants scale by q_level (MultByConst,
    mkckks/evaluator.go:117-198); before Rescale the coefficients exceed
    the decoder's fast 2-limb CRT range, exercising its exact-CRT
    fallback (regression: used to decode garbage)."""
    m = _rand_msg(params, -1, 1)
    ct = ctx["enc"].encrypt_msg(m, ctx["pk"].get("user0"))
    for c in (0.7, 0.7 - 1.3j):
        out = ctx["dec"].decrypt(ctx["ev"].mult_by_const_new(ct, c),
                                 ctx["sk"])
        _assert_close(params, out.value, m.value * c, 11)
        # and after rescale (back in fast-CRT range)
        rs = ctx["ev"].rescale(ctx["ev"].mult_by_const_new(ct, c))
        out2 = ctx["dec"].decrypt(rs, ctx["sk"])
        _assert_close(params, out2.value, m.value * c, 11)


def test_rotate_hoisted_many_bit_identical(params, ctx):
    """Batched multi-rotation (one compiled pass over stacked keys) is
    bit-identical to sequential hoisted rotations."""
    m = _rand_msg(params, -1, 1)
    ev = ctx["ev"]
    ct1 = ctx["enc"].encrypt_msg(m, ctx["pk"].get("user0"))
    ct2 = ctx["enc"].encrypt_msg(_rand_msg(params, -1, 1),
                                 ctx["pk"].get("user1"))
    ct = ev.add_new(ct1, ct2)
    h = ev.hoisted_form(ct)
    idxs = [1, 4, 16]
    batched = ev.rotate_hoisted_many_new(ct, idxs, h, ctx["rtk"])
    for idx, got in zip(idxs, batched):
        ref = ev.rotate_hoisted_new(ct, idx, h, ctx["rtk"])
        np.testing.assert_array_equal(np.asarray(got.ct.data),
                                      np.asarray(ref.ct.data))
        assert got.scale == ref.scale


def test_mul_relin_sum_lazy_inner_product(params, ctx):
    """mul_relin_sum_new (lazy relinearization across an inner product)
    decrypts to the same value as the staged sum of mul_relins, within
    the rounding of its single deferred ModDown."""
    ev = ctx["ev"]
    pairs, want = [], 0
    a_msgs = [_rand_msg(params, -0.5, 0.5) for _ in range(3)]
    b_msgs = [_rand_msg(params, -0.5, 0.5) for _ in range(3)]
    for ma, mb in zip(a_msgs, b_msgs):
        ca = ctx["enc"].encrypt_msg(ma, ctx["pk"].get("user0"))
        cb = ctx["enc"].encrypt_msg(mb, ctx["pk"].get("user1"))
        h_a = ev.hoisted_form(ca)
        pairs.append((ca, cb, h_a, None))
        want = want + ma.value * mb.value
    lazy = ev.mul_relin_sum_new(pairs, ctx["rlk"])
    staged = None
    for ca, cb, ha, _ in pairs:
        t = ev.mul_relin_hoisted_new(ca, cb, ha, None, ctx["rlk"])
        staged = t if staged is None else ev.add_new(staged, t)
    out_lazy = ctx["dec"].decrypt(lazy, ctx["sk"])
    out_staged = ctx["dec"].decrypt(staged, ctx["sk"])
    # both match the plaintext product sum within the mult bound
    _assert_close(params, out_lazy.value, want, 12)
    _assert_close(params, out_staged.value, want, 12)
    # and each other even tighter (only ModDown rounding differs)
    delta = np.max(np.abs(out_lazy.value - out_staged.value))
    bound = -math.log2(params.scale) + params.logslots + 6
    assert np.log2(max(delta, 1e-300)) <= bound
