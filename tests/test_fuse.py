"""mkhe_tpu.fuse: whole-pipeline fusion is bit-identical to staged
execution for CKKS (mult+rotate+conjugate+add) and BFV (mult+add)."""

import numpy as np
import pytest

from mkhe_tpu import fuse, mkbfv, mkckks, mkrlwe

rng = np.random.default_rng(11)

LOGN = 10


@pytest.fixture(scope="module")
def ckks_ctx():
    params = mkckks.new_parameters(
        LOGN, LOGN - 1, q0_bits=28.9, level_bits=20.0, levels=4,
        scale=2.0 ** 40, p_bits=28.4)
    kgen = mkrlwe.KeyGenerator(params.rlwe, seed=31)
    sk_set = mkrlwe.SecretKeySet()
    pk_set = mkrlwe.PublicKeySet()
    rlk = mkrlwe.RelinearizationKeySet()
    rtk = mkrlwe.RotationKeySet()
    cjk = mkrlwe.ConjugationKeySet()
    for uid in ("alice", "bob"):
        sk, pk = kgen.gen_key_pair(uid)
        sk_set.add(sk)
        pk_set.add(pk)
        rlk.add(kgen.gen_relinearization_key(sk, kgen.gen_secret_key(uid)))
        cjk.add(kgen.gen_conjugation_key(sk))
        kgen.gen_default_rotation_keys(sk, rtk)
    enc = mkckks.Encryptor(params, seed=32)
    return dict(params=params, sk=sk_set, pk=pk_set, rlk=rlk, rtk=rtk,
                cjk=cjk, enc=enc, ev=mkckks.Evaluator(params))


def _msg(params):
    s = params.slots
    return mkckks.Message(
        value=rng.uniform(-0.5, 0.5, s) + 1j * rng.uniform(-0.5, 0.5, s))


def test_fused_ckks_pipeline_bit_identical(ckks_ctx):
    c = ckks_ctx
    params, ev = c["params"], c["ev"]
    ct_a = c["enc"].encrypt_msg(_msg(params), c["pk"].get("alice"))
    ct_b = c["enc"].encrypt_msg(_msg(params), c["pk"].get("bob"))

    def pipe(ev, keys, ct_a, ct_b):
        prod = ev.mul_relin_new(ct_a, ct_b, keys.rlk)
        rot = ev.rotate_new(prod, 3, keys.rtk)   # pow2 fallback: 1 + 2
        conj = ev.conjugate_new(rot, keys.cjk)
        return ev.add_new(conj, prod)

    fn, args = fuse.fuse(params, pipe, (ct_a, ct_b), rlk_set=c["rlk"],
                         rtk_set=c["rtk"], cjk_set=c["cjk"])
    fused = fn(*args)

    staged = pipe(ev, type("K", (), dict(rlk=c["rlk"], rtk=c["rtk"],
                                         cjk=c["cjk"]))(), ct_a, ct_b)
    assert fused.scale == staged.scale and fused.ids == staged.ids
    np.testing.assert_array_equal(np.asarray(fused.ct.data),
                                  np.asarray(staged.ct.data))

    # the compiled program is reusable with fresh inputs
    ct_a2 = c["enc"].encrypt_msg(_msg(params), c["pk"].get("alice"))
    ct_b2 = c["enc"].encrypt_msg(_msg(params), c["pk"].get("bob"))
    fused2 = fn(args[0], args[1], (ct_a2, ct_b2))
    staged2 = pipe(ev, type("K", (), dict(rlk=c["rlk"], rtk=c["rtk"],
                                          cjk=c["cjk"]))(), ct_a2, ct_b2)
    np.testing.assert_array_equal(np.asarray(fused2.ct.data),
                                  np.asarray(staged2.ct.data))



@pytest.mark.skipif(not __import__("os").environ.get("RUN_SLOW"),
                    reason="BFV fused pipeline: RUN_SLOW tier (fuse machinery covered default by the CKKS fused pipeline test)")
def test_fused_bfv_pipeline_bit_identical():
    from mkhe_tpu.ops.primes import ntt_primes
    logn = 9
    params = mkbfv.new_parameters(
        logn, ntt_primes(logn, 26.5, 5), ntt_primes(logn, 26.5, 5, skip=5),
        ntt_primes(logn, 28.4, 2), t=65537)
    kgen = mkbfv.KeyGenerator(params, seed=33)
    pk_set = mkrlwe.PublicKeySet()
    rlk = mkbfv.RelinearizationKeySet()
    for uid in ("alice", "bob"):
        sk, pk = kgen.gen_key_pair(uid)
        pk_set.add(pk)
        rlk.add(kgen.gen_relinearization_key_bfv(
            sk, kgen.gen_secret_key(uid)))
    enc = mkbfv.Encryptor(params, seed=34)
    ev = mkbfv.Evaluator(params)

    m1 = rng.integers(0, 65537, params.n)
    m2 = rng.integers(0, 65537, params.n)
    ct1 = enc.encrypt_msg(m1, pk_set.get("alice"))
    ct2 = enc.encrypt_msg(m2, pk_set.get("bob"))

    def pipe(ev, keys, ct1, ct2):
        return ev.add_new(ev.mul_relin_new(ct1, ct2, keys.rlk), ct1)

    fn, args = fuse.fuse(params, pipe, (ct1, ct2), rlk_set=rlk)
    fused = fn(*args)
    staged = pipe(ev, type("K", (), dict(rlk=rlk))(), ct1, ct2)
    assert fused.ids == staged.ids
    np.testing.assert_array_equal(np.asarray(fused.data),
                                  np.asarray(staged.data))
