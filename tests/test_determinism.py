"""Determinism tests (SURVEY.md §5.2: the reference relies on Go's single
thread; the TPU analog is jit-level bitwise reproducibility — same inputs,
same compiled graph, identical uint32 outputs across runs)."""

import numpy as np
import jax.numpy as jnp

from mkhe_tpu import mkrlwe, mkckks
from mkhe_tpu.mkrlwe import keyswitch as ksw


def test_mul_relin_bitwise_deterministic():
    params = mkckks.new_parameters(
        9, 8, q0_bits=28.9, level_bits=20.0, levels=2, scale=2.0 ** 40,
        p_bits=28.4)
    kgen = mkrlwe.KeyGenerator(params.rlwe, seed=81)
    rlk = mkrlwe.RelinearizationKeySet()
    pks = {}
    for uid in ("u0", "u1"):
        sk, pk = kgen.gen_key_pair(uid)
        rlk.add(kgen.gen_relinearization_key(sk, kgen.gen_secret_key(uid)))
        pks[uid] = pk
    enc = mkckks.Encryptor(params, seed=82)
    ev = mkckks.Evaluator(params)
    m = mkckks.Message(value=np.full(params.slots, 0.5 + 0.25j))
    ct = ev.add_new(enc.encrypt_msg(m, pks["u0"]),
                    enc.encrypt_msg(m, pks["u1"]))
    out1 = ev.mul_relin_new(ct, ct, rlk)
    out2 = ev.mul_relin_new(ct, ct, rlk)
    np.testing.assert_array_equal(np.asarray(out1.ct.data),
                                  np.asarray(out2.ct.data))


def test_keygen_reproducible_from_seed():
    params = mkckks.new_parameters(
        8, 7, q0_bits=28.9, level_bits=20.0, levels=2, scale=2.0 ** 40,
        p_bits=28.4)
    k1 = mkrlwe.KeyGenerator(params.rlwe, seed=99).gen_secret_key("a")
    k2 = mkrlwe.KeyGenerator(params.rlwe, seed=99).gen_secret_key("a")
    np.testing.assert_array_equal(np.asarray(k1.data), np.asarray(k2.data))


def test_crs_deterministic_across_param_instances():
    """Two independently built Parameters agree on the CRS — the contract
    a real multi-party deployment needs (unlike the reference, which draws
    CRS from a process-local PRNG, params.go:28-33)."""
    mk = lambda: mkckks.new_parameters(
        8, 7, q0_bits=28.9, level_bits=20.0, levels=2, scale=2.0 ** 40,
        p_bits=28.4)
    p1, p2 = mk(), mk()
    np.testing.assert_array_equal(np.asarray(p1.rlwe.crs[0]),
                                  np.asarray(p2.rlwe.crs[0]))
