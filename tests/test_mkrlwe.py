"""Multi-key RLWE property tests with analytic noise bounds — the port of
the reference's mkrlwe/mkrlwe_test.go strategy: every primitive is checked
by algebraically cancelling the secret and measuring the residual noise
(log2 of the sum of |coefficients|, cf. log2OfInnerSum, mkrlwe_test.go:92).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mkhe_tpu import mkrlwe
from mkhe_tpu.mkrlwe import keyswitch as ksw
from mkhe_tpu.ops.primes import ntt_primes
from mkhe_tpu.utils import crt

LOGN = 9
SIGMA = 3.2

_flagship = pytest.param(
    "flagship",
    marks=pytest.mark.skipif(
        not __import__("os").environ.get("RUN_SLOW"),
        reason="logN=14 flagship-scale property runs (minutes on CPU); "
               "RUN_SLOW=1 reruns every identity in this module at the "
               "reference's default test scale (mkrlwe_test.go:39) — "
               "VERDICT r4 #9"))


@pytest.fixture(scope="module", params=["default", _flagship])
def params(request):
    if request.param == "flagship":
        # the reference's logN=14 default test shape: a full flagship
        # limb ladder (28 q limbs) + 4 P limbs, same sigma
        q = ntt_primes(14, 27.0, 28)
        p = ntt_primes(14, 28.4, 4)
        return mkrlwe.new_parameters(14, q, p, gamma=2, sigma=SIGMA)
    q = ntt_primes(LOGN, 28.6, 6)
    p = ntt_primes(LOGN, 28.9, 2)
    return mkrlwe.new_parameters(LOGN, q, p, gamma=2, sigma=SIGMA)


@pytest.fixture(scope="module")
def kgen(params):
    return mkrlwe.KeyGenerator(params, seed=7)


def _inner_sum_log2(poly_u32, moduli):
    centered = crt.crt_center(np.asarray(poly_u32), moduli)
    s = sum(abs(int(v)) for v in centered)
    return float(int(s).bit_length())


def _qp_split(params, arr):
    lq = params.qcount
    return arr[..., :lq, :], arr[..., lq:, :]


def test_gen_key_pair(params, kgen):
    """|| pk0 + s*pk1 || <= N * 6sigma  (testGenKeyPair, :157-181)."""
    sk, pk = kgen.gen_key_pair("user")
    ring = params.ring_qp
    resid = ring.intt(ring.from_mont(
        ring.add(pk.data[0], ring.mul_mont(pk.data[1], sk.data))))
    bound = float((int(6 * SIGMA) * params.n).bit_length())
    rq, rp = _qp_split(params, np.asarray(resid))
    assert _inner_sum_log2(rq, params.q_moduli) <= bound
    assert _inner_sum_log2(rp, params.p_moduli) <= bound


def test_switching_key_gadget_identity(params, kgen):
    """sum_i swk_i - P*s is small (testSwitchKeyGen, :234-285)."""
    sk = kgen.gen_secret_key("user")
    swk = kgen.gen_switching_key(sk)
    ring = params.ring_qp
    beta = params.beta(params.max_level)
    # P*s over QP: P*s == 0 mod p_j, P mod q_j * s mod q_j
    ps_q = params.ring_q.mul_scalar_mont(sk.data[:params.qcount],
                                         params.pmodq_mont)
    ps = jnp.concatenate(
        [ps_q, jnp.zeros((params.pcount, params.n), jnp.uint32)], axis=0)
    total = ps
    for i in range(beta):
        total = ring.sub(total, swk.data[i])
    resid = ring.intt(ring.from_mont(total))
    bound = float((int(6 * SIGMA) * params.n * beta).bit_length())
    rq, rp = _qp_split(params, np.asarray(resid))
    assert _inner_sum_log2(rq, params.q_moduli) <= bound
    assert _inner_sum_log2(rp, params.p_moduli) <= bound


def test_relin_key_identities(params, kgen):
    """b = -sa+e, d = -ra+gs+e, v = -su-gr-e (testRelinKeyGen, :287-360)."""
    s = kgen.gen_secret_key("user")
    r = kgen.gen_secret_key("user")
    rlk = kgen.gen_relinearization_key(s, r)
    ring = params.ring_qp
    beta = params.beta(params.max_level)
    a = params.crs[0][:beta]
    u = params.crs[-1][:beta]
    sg = kgen.gen_switching_key(s).data
    rg = kgen.gen_switching_key(r).data
    bound = (6 + params.logn)  # reference uses 5+logN with sigma-sized residuals;
    # our residuals include two independent gaussians (swk resampled) -> +1

    def check(resid):
        resid = np.asarray(ring.intt(ring.from_mont(resid)))
        for i in range(beta):
            rq, rp = _qp_split(params, resid[i])
            assert _inner_sum_log2(rq, params.q_moduli) <= bound
            assert _inner_sum_log2(rp, params.p_moduli) <= bound

    # b/d are stored in DOUBLE-Montgomery form (keys.py); strip the extra
    # factor once before checking the algebraic identities.
    b_std = ring.from_mont(rlk.b)
    d_std = ring.from_mont(rlk.d)
    check(ring.add(b_std, ring.mul_mont(a, s.data[None])))
    # d + ra - sg = e - e' (sg has fresh error)
    check(ring.sub(ring.add(d_std, ring.mul_mont(a, r.data[None])), sg))
    # v + su + rg = -e - e'
    check(ring.add(ring.add(rlk.v, ring.mul_mont(u, s.data[None])), rg))


def test_encrypt_decrypt_noise(params, kgen):
    """c0 + c1*s = m + small (testEncryptor/testDecryptor, :183-232,362)."""
    sk, pk = kgen.gen_key_pair("user1")
    enc = mkrlwe.Encryptor(params, seed=11)
    dec = mkrlwe.Decryptor(params)
    sk_set = mkrlwe.SecretKeySet()
    sk_set.add(sk)
    ct = enc.encrypt(None, pk)  # encryption of zero
    pt = dec.decrypt(ct, sk_set)
    assert _inner_sum_log2(np.asarray(pt), params.q_moduli) <= 9 + params.logn


def test_two_party_decrypt(params, kgen):
    """Combined 2-party ciphertext decrypts with both keys
    (testDecryptor multikey case, :408-452)."""
    sk1, pk1 = kgen.gen_key_pair("user1")
    sk2, pk2 = kgen.gen_key_pair("user2")
    enc = mkrlwe.Encryptor(params, seed=12)
    dec = mkrlwe.Decryptor(params)
    sk_set = mkrlwe.SecretKeySet()
    sk_set.add(sk1)
    sk_set.add(sk2)
    ct1 = enc.encrypt(None, pk1)
    ct2 = enc.encrypt(None, pk2)
    ring = params.ring_q
    data = jnp.stack([ring.add(ct1.data[0], ct2.data[0]),
                      ct1.data[1], ct2.data[1]])
    ct = mkrlwe.Ciphertext(ids=("user1", "user2"), data=data)
    pt = dec.decrypt(ct, sk_set)
    assert _inner_sum_log2(np.asarray(pt), params.q_moduli) <= 10 + params.logn


def test_external_product(params, kgen):
    """Ext(c, swk(s)) ~= c*s (testExternalProduct, :456-505)."""
    sk, pk = kgen.gen_key_pair("user1")
    enc = mkrlwe.Encryptor(params, seed=13)
    ct = enc.encrypt(None, pk)
    swk = kgen.gen_switching_key(sk)
    level = ct.level
    ring = params.ring_q

    dec_digits = ksw.decompose(params, ct.data[0], level)
    got = ksw.external_product(params, dec_digits, swk.data, level)
    want = ring.intt(ring.mul_mont(ring.ntt(ct.data[0]),
                                   sk.data[:level + 1]))
    resid = np.asarray(ring.sub(got, want))
    assert _inner_sum_log2(resid, params.q_moduli) <= 10 + params.logn



@pytest.mark.skipif(not __import__("os").environ.get("RUN_SLOW"),
                    reason="low-level digit-domain walkthrough: RUN_SLOW tier (external products covered default by test_external_product)")
def test_external_product_low_level(params, kgen):
    """Same identity at a reduced level (level slicing paths)."""
    sk, pk = kgen.gen_key_pair("user1")
    enc = mkrlwe.Encryptor(params, seed=14)
    level = 3
    ct = enc.encrypt(None, pk, level=level)
    swk = kgen.gen_switching_key(sk)
    ring = params.ring_q_at(level)
    dec_digits = ksw.decompose(params, ct.data[0], level)
    got = ksw.external_product(
        params, dec_digits, ksw.slice_swk(params, swk.data, level), level)
    want = ring.intt(ring.mul_mont(ring.ntt(ct.data[0]),
                                   sk.data[:level + 1]))
    resid = np.asarray(ring.sub(got, want))
    assert _inner_sum_log2(resid, params.q_moduli[:level + 1]) <= 10 + params.logn


def test_sparse_and_gaussian_secrets(params, kgen):
    """GenSecretKeySparse / GenSecretKeyGaussian variants encrypt/decrypt
    correctly (keygen.go:63-85)."""
    for sk in (kgen.gen_secret_key_sparse("s1", 64),
               kgen.gen_secret_key_gaussian("s2")):
        pk = kgen.gen_public_key(sk)
        enc = mkrlwe.Encryptor(params, seed=17)
        dec = mkrlwe.Decryptor(params)
        sk_set = mkrlwe.SecretKeySet()
        sk_set.add(sk)
        ct = enc.encrypt(None, pk)
        pt = dec.decrypt(ct, sk_set)
        assert _inner_sum_log2(np.asarray(pt), params.q_moduli) <= 11 + params.logn


def test_pad_ciphertext_and_idset(params):
    """pad_ciphertext zero-pads to the id union (elements.go:91-105);
    IDSet union/intersection semantics (idset.go)."""
    from mkhe_tpu.mkrlwe import (new_ciphertext, pad_ciphertext, union_ids,
                                 IDSet)
    from mkhe_tpu.mkrlwe.elements import Ciphertext

    ct = new_ciphertext(params, ("alice",), level=1)
    ct = Ciphertext(ids=ct.ids, data=ct.data.at[1].set(7))
    padded = pad_ciphertext(ct, ("bob", "carol"))
    assert padded.ids == ("alice", "bob", "carol")
    assert padded.data.shape[0] == 4
    np.testing.assert_array_equal(np.asarray(padded.party("alice")),
                                  np.asarray(ct.party("alice")))
    assert not np.asarray(padded.party("bob")).any()
    assert union_ids(("b", "a"), ("a", "c")) == ("a", "b", "c")
    s = IDSet(("alice", "bob"))
    t = IDSet(("bob", "carol"))
    assert sorted(s.union(t).value) == ["alice", "bob", "carol"]
    assert sorted(s.intersection(t).value) == ["bob"]
    assert s.has("alice") and not s.has("carol")
    with pytest.raises(ValueError):
        IDSet(("0",))


def test_encrypt_domains(params, kgen):
    """All four plaintext/ciphertext NTT-domain combinations decrypt to
    the same message up to fresh-encryption noise (encryptor.go:55-118)."""
    import jax.numpy as jnp
    rng_l = np.random.default_rng(77)
    sk, pk = kgen.gen_key_pair("user9")
    dec = mkrlwe.Decryptor(params)
    sk_set = mkrlwe.SecretKeySet()
    sk_set.add(sk)
    ring = params.ring_q
    # a plaintext with large coefficients so noise is relatively tiny
    msg = rng_l.integers(0, 1 << 24, params.ring_q.n, dtype=np.uint32)
    pt = jnp.broadcast_to(jnp.asarray(msg),
                          (len(params.q_moduli), params.ring_q.n))
    pt = ring.reduce(pt)
    pt_ntt = ring.ntt(pt)
    outs = []
    for ptv, pn in ((pt, False), (pt_ntt, True)):
        for cn in (False, True):
            enc = mkrlwe.Encryptor(params, seed=13)  # same randomness
            ct = enc.encrypt(ptv, pk, pt_ntt=pn, ct_ntt=cn)
            data = ct.data
            if cn:  # decryptor expects coeff-domain ciphertexts
                data = ring.intt(data)
            out = dec.decrypt(mkrlwe.Ciphertext(ids=ct.ids, data=data),
                              sk_set)
            outs.append(np.asarray(out))
    # identical randomness => identical ciphertext up to domain: all four
    # decryptions are bit-equal
    for o in outs[1:]:
        np.testing.assert_array_equal(o, outs[0])
    # and the decryption equals the plaintext up to fresh noise
    diff = ring.sub(jnp.asarray(outs[0]), pt)
    assert _inner_sum_log2(np.asarray(diff), params.q_moduli) <= 9 + params.logn
