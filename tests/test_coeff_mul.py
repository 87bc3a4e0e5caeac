"""Coefficient-sharded mult (parallel/coeff_mul.py) is bit-identical to
the single-device mul_and_relin on the virtual 8-device mesh."""

import numpy as np
import pytest
import jax
from jax.sharding import Mesh

from mkhe_tpu import mkrlwe, mkckks
from mkhe_tpu.mkrlwe import keyswitch as ksw
from mkhe_tpu.mkckks.evaluator import _mul_relin_core
from mkhe_tpu.parallel import coeff_mul

rng = np.random.default_rng(9)

# Small shapes: the sharded mult compiles the FULL KKLSS graph under SPMD
# partitioning, which is minutes of XLA CPU compile at logN=10/5 levels
# (the code paths — cross-device NTT stages, slice_swk, beta(level) — are
# shape-independent, so logN=8/3 levels covers the same logic).
LOGN = 8


@pytest.fixture(scope="module")
def ctx():
    params = mkckks.new_parameters(
        LOGN, LOGN - 1, q0_bits=28.9, level_bits=20.0, levels=2,
        scale=2.0 ** 40, p_bits=28.4)
    kgen = mkrlwe.KeyGenerator(params.rlwe, seed=51)
    pk_set = mkrlwe.PublicKeySet()
    rlk = mkrlwe.RelinearizationKeySet()
    for uid in ("alice", "bob"):
        sk, pk = kgen.gen_key_pair(uid)
        pk_set.add(pk)
        rlk.add(kgen.gen_relinearization_key(sk, kgen.gen_secret_key(uid)))
    enc = mkckks.Encryptor(params, seed=52)
    return dict(params=params, pk=pk_set, rlk=rlk, enc=enc)


def _msg(params):
    s = params.slots
    return mkckks.Message(value=rng.uniform(-0.5, 0.5, s))


@pytest.mark.parametrize("ndev", [2, 8])
def test_coeff_sharded_mult_bit_identical(ctx, ndev):
    if ndev == 8 and not __import__("os").environ.get("RUN_SLOW"):
        import pytest
        pytest.skip("C=8 variant is RUN_SLOW (C=2 covers the machinery; "
                    "8-dev coeff sharding is certified by the driver's "
                    "dryrun_multichip)")
    params = ctx["params"]
    ct0 = ctx["enc"].encrypt_msg(_msg(params), ctx["pk"].get("alice"))
    ct1 = ctx["enc"].encrypt_msg(_msg(params), ctx["pk"].get("bob"))
    ids = ("alice", "bob")
    stacked = ctx["rlk"].stacked(ids)
    level = ct0.level

    b, d, v = stacked
    want = _mul_relin_core(params.rlwe, ct0.ct, ct1.ct, b, d, v, level,
                           None, None, False, False)

    mesh = Mesh(np.array(jax.devices()[:ndev]).reshape(ndev), ("coeff",))
    got = coeff_mul.mul_and_relin_sharded(
        params.rlwe, ct0.ct, ct1.ct, stacked, level, mesh)

    assert got.ids == want.ids
    np.testing.assert_array_equal(np.asarray(got.data),
                                  np.asarray(want.data))


@pytest.mark.skipif(not __import__("os").environ.get("RUN_SLOW"),
                    reason="level-sliced variant of the bit-identity test "
                           "above; RUN_SLOW tier (compile-heavy on CPU)")
def test_coeff_sharded_mult_lower_level(ctx):
    """Level-sliced operands (hits slice_swk + beta(level) paths)."""
    params = ctx["params"]
    ev = mkckks.Evaluator(params)
    ct0 = ctx["enc"].encrypt_msg(_msg(params), ctx["pk"].get("alice"))
    ct1 = ctx["enc"].encrypt_msg(_msg(params), ctx["pk"].get("bob"))
    ct0 = ev.drop_level(ct0, 1)
    ct1 = ev.drop_level(ct1, 1)
    level = ct0.level
    stacked = ctx["rlk"].stacked(("alice", "bob"))

    b, d, v = stacked
    want = _mul_relin_core(params.rlwe, ct0.ct, ct1.ct, b, d, v, level,
                           None, None, False, False)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("coeff",))
    got = coeff_mul.mul_and_relin_sharded(
        params.rlwe, ct0.ct, ct1.ct, stacked, level, mesh)
    np.testing.assert_array_equal(np.asarray(got.data),
                                  np.asarray(want.data))
