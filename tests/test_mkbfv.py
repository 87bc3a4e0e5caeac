"""Multi-key BFV tests (port of mkbfv/mkbfv_test.go): EXACT equality of
decrypted int64 vectors for enc/dec, add, sub, and mult+relin
(require.Equal(int64(0), delta) at mkbfv_test.go:301,337,372,412)."""

import numpy as np
import pytest

from mkhe_tpu import mkrlwe, mkbfv

rng = np.random.default_rng(4)

LOGN = 9
T = 65537


@pytest.fixture(scope="module")
def params():
    from mkhe_tpu.ops.primes import ntt_primes
    q = ntt_primes(LOGN, 26.5, 5)
    qmul = ntt_primes(LOGN, 26.5, 5, skip=5)
    p = ntt_primes(LOGN, 28.4, 2)
    return mkbfv.new_parameters(LOGN, q, qmul, p, t=T)


@pytest.fixture(scope="module")
def ctx(params):
    users = ["user0", "user1", "user2", "user3"]
    kgen = mkbfv.KeyGenerator(params, seed=31)
    sk_set = mkrlwe.SecretKeySet()
    pk_set = mkrlwe.PublicKeySet()
    rlk_set = mkbfv.RelinearizationKeySet()
    rtk_set = mkrlwe.RotationKeySet()
    for uid in users:
        sk, pk = kgen.gen_key_pair(uid)
        r = kgen.gen_secret_key(uid)
        sk_set.add(sk)
        pk_set.add(pk)
        rlk_set.add(kgen.gen_relinearization_key_bfv(sk, r))
        rtk_set.add(kgen.gen_rotation_key(1, sk))
    enc = mkbfv.Encryptor(params, seed=32)
    dec = mkbfv.Decryptor(params)
    ev = mkbfv.Evaluator(params)
    return dict(users=users, sk=sk_set, pk=pk_set, rlk=rlk_set,
                rtk=rtk_set, enc=enc, dec=dec, ev=ev)


def _rand_msg(params):
    return rng.integers(-(T // 2) + 1, T // 2, size=params.n,
                        dtype=np.int64)


def _cmod(x):
    r = np.mod(x, T)
    return np.where(r > T // 2, r - T, r)


def test_enc_dec(params, ctx):
    for uid in ctx["users"][:2]:
        m = _rand_msg(params)
        ct = ctx["enc"].encrypt_msg(m, ctx["pk"].get(uid))
        out = ctx["dec"].decrypt(ct, ctx["sk"])
        np.testing.assert_array_equal(out, _cmod(m))


def test_add_sub(params, ctx):
    m1, m2 = _rand_msg(params), _rand_msg(params)
    ct1 = ctx["enc"].encrypt_msg(m1, ctx["pk"].get("user0"))
    ct2 = ctx["enc"].encrypt_msg(m2, ctx["pk"].get("user1"))
    out_a = ctx["dec"].decrypt(ctx["ev"].add_new(ct1, ct2), ctx["sk"])
    out_s = ctx["dec"].decrypt(ctx["ev"].sub_new(ct1, ct2), ctx["sk"])
    np.testing.assert_array_equal(out_a, _cmod(m1 + m2))
    np.testing.assert_array_equal(out_s, _cmod(m1 - m2))


@pytest.mark.parametrize("num_users", [2, 4])
def test_mul_relin_exact(params, ctx, num_users):
    users = ctx["users"][:num_users]
    ev = ctx["ev"]
    ct = None
    want = np.zeros(params.n, np.int64)
    for uid in users:
        m = _rand_msg(params)
        c = ctx["enc"].encrypt_msg(m, ctx["pk"].get(uid))
        ct = c if ct is None else ev.add_new(ct, c)
        want = want + m
    res = ev.mul_relin_new(ct, ct, ctx["rlk"])
    out = ctx["dec"].decrypt(res, ctx["sk"])
    np.testing.assert_array_equal(out, _cmod(want * want))


def test_mul_relin_distinct(params, ctx):
    ev = ctx["ev"]
    m1, m2 = _rand_msg(params), _rand_msg(params)
    ct1 = ctx["enc"].encrypt_msg(m1, ctx["pk"].get("user0"))
    ct2 = ctx["enc"].encrypt_msg(m2, ctx["pk"].get("user1"))
    out = ctx["dec"].decrypt(ev.mul_relin_new(ct1, ct2, ctx["rlk"]),
                             ctx["sk"])
    np.testing.assert_array_equal(out, _cmod(m1 * m2))



@pytest.mark.skipif(not __import__("os").environ.get("RUN_SLOW"),
                    reason="BFV batched mult: RUN_SLOW tier (batched path covered default by the CKKS batched test)")
def test_mul_relin_batched(params, ctx):
    """Batched (vmapped) mult is bit-identical to per-pair mul_relin_new."""
    ev = ctx["ev"]
    cts0, cts1 = [], []
    for _ in range(3):
        cts0.append(ctx["enc"].encrypt_msg(_rand_msg(params),
                                           ctx["pk"].get("user0")))
        cts1.append(ctx["enc"].encrypt_msg(_rand_msg(params),
                                           ctx["pk"].get("user1")))
    got = ev.mul_relin_batched_new(cts0, cts1, ctx["rlk"])
    for g, c0, c1 in zip(got, cts0, cts1):
        want = ev.mul_relin_new(c0, c1, ctx["rlk"])
        assert g.ids == want.ids
        np.testing.assert_array_equal(np.asarray(g.data),
                                      np.asarray(want.data))


def test_rotate(params, ctx):
    ev = ctx["ev"]
    m = _rand_msg(params)
    ct = ctx["enc"].encrypt_msg(m, ctx["pk"].get("user0"))
    out = ctx["dec"].decrypt(ev.rotate_new(ct, 1, ctx["rtk"]), ctx["sk"])
    # slot layout: two rows of N/2, rotation moves columns within rows
    nh = params.n // 2
    want = np.concatenate([np.roll(_cmod(m)[:nh], -1),
                           np.roll(_cmod(m)[nh:], -1)])
    np.testing.assert_array_equal(out, want)


def test_mul_relin_exact_alpha2():
    """BFV with alpha=2 digits (p_count=4): exact 2-party mult."""
    from mkhe_tpu.ops.primes import ntt_primes
    q = ntt_primes(LOGN, 26.5, 6, skip=10)
    qmul = ntt_primes(LOGN, 26.5, 6, skip=16)
    p = ntt_primes(LOGN, 28.0, 4)
    params = mkbfv.new_parameters(LOGN, q, qmul, p, t=T)
    assert params.rlwe.alpha == 2
    kgen = mkbfv.KeyGenerator(params, seed=33)
    sk_set = mkrlwe.SecretKeySet()
    rlk_set = mkbfv.RelinearizationKeySet()
    pks = {}
    for uid in ("a", "b"):
        sk, pk = kgen.gen_key_pair(uid)
        r = kgen.gen_secret_key(uid)
        sk_set.add(sk)
        rlk_set.add(kgen.gen_relinearization_key_bfv(sk, r))
        pks[uid] = pk
    enc = mkbfv.Encryptor(params, seed=34)
    dec = mkbfv.Decryptor(params)
    ev = mkbfv.Evaluator(params)
    m1, m2 = _rand_msg(params), _rand_msg(params)
    ct1 = enc.encrypt_msg(m1, pks["a"])
    ct2 = enc.encrypt_msg(m2, pks["b"])
    out = dec.decrypt(ev.mul_relin_new(ct1, ct2, rlk_set), sk_set)
    np.testing.assert_array_equal(out, _cmod(m1 * m2))



@pytest.mark.skipif(not __import__("os").environ.get("RUN_SLOW"),
                    reason="BFV conjugation: RUN_SLOW tier (keyswitch machinery covered by default rotate/mult tests; CKKS conjugation stays default)")
def test_conjugate(params, ctx):
    """BFV conjugation = row swap in the 2x(N/2) slot matrix."""
    kgen = mkbfv.KeyGenerator(params, seed=35)
    # conjugation keys must come from the same secret keys as ctx
    # (regen with same kgen seed 31 would desync; use fresh parties)
    sk_set = mkrlwe.SecretKeySet()
    cjk_set = mkrlwe.ConjugationKeySet()
    pks = {}
    for uid in ("x", "y"):
        sk, pk = kgen.gen_key_pair(uid)
        sk_set.add(sk)
        cjk_set.add(kgen.gen_conjugation_key(sk))
        pks[uid] = pk
    enc = mkbfv.Encryptor(params, seed=36)
    dec = mkbfv.Decryptor(params)
    ev = mkbfv.Evaluator(params)
    m = _rand_msg(params)
    ct = enc.encrypt_msg(m, pks["x"])
    out = dec.decrypt(ev.conjugate_new(ct, cjk_set), sk_set)
    nh = params.n // 2
    want = np.concatenate([_cmod(m)[nh:], _cmod(m)[:nh]])
    np.testing.assert_array_equal(out, want)


def test_mul_relin_hoisted(params, ctx):
    """Hoisted BFV mult (cached double-basis decompositions,
    mkbfv/keyswitch_hoisted.go:39-207) is bit-identical to the plain
    path, and one hoisted form serves several products."""
    ev = ctx["ev"]
    m1, m2, m3 = _rand_msg(params), _rand_msg(params), _rand_msg(params)
    ct1 = ctx["enc"].encrypt_msg(m1, ctx["pk"].get("user0"))
    ct2 = ctx["enc"].encrypt_msg(m2, ctx["pk"].get("user1"))
    ct3 = ctx["enc"].encrypt_msg(m3, ctx["pk"].get("user2"))
    h1, h2, h3 = (ev.hoisted_form(c) for c in (ct1, ct2, ct3))

    plain = ev.mul_relin_new(ct1, ct2, ctx["rlk"])
    hoisted = ev.mul_relin_hoisted_new(h1, h2, ctx["rlk"])
    np.testing.assert_array_equal(np.asarray(plain.data),
                                  np.asarray(hoisted.data))

    # reuse h1 in a second product (the point of hoisting)
    out = ctx["dec"].decrypt(ev.mul_relin_hoisted_new(h1, h3, ctx["rlk"]),
                             ctx["sk"])
    np.testing.assert_array_equal(out, _cmod(m1 * m3))
