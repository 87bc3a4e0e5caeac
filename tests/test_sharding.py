"""Multi-device sharding tests on the virtual 8-device CPU mesh: the full
multi-key evaluation step compiles and runs with ciphertexts and key
material sharded over ('rns', 'coeff'), and produces bit-identical results
to the unsharded path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mkhe_tpu import mkrlwe, mkckks, parallel
from mkhe_tpu.mkrlwe import keyswitch as ksw


@pytest.fixture(scope="module")
def ctx():
    params = mkckks.new_parameters(
        9, 8, q0_bits=28.9, level_bits=20.0, levels=3, scale=2.0 ** 40,
        p_bits=28.4)
    kgen = mkrlwe.KeyGenerator(params.rlwe, seed=51)
    sk_set = mkrlwe.SecretKeySet()
    pk_set = mkrlwe.PublicKeySet()
    rlk_set = mkrlwe.RelinearizationKeySet()
    for uid in ("user0", "user1"):
        sk, pk = kgen.gen_key_pair(uid)
        r = kgen.gen_secret_key(uid)
        sk_set.add(sk)
        pk_set.add(pk)
        rlk_set.add(kgen.gen_relinearization_key(sk, r))
    enc = mkckks.Encryptor(params, seed=52)
    ev = mkckks.Evaluator(params)
    rng = np.random.default_rng(8)
    ct = None
    for uid in ("user0", "user1"):
        m = mkckks.Message(value=rng.uniform(-0.5, 0.5, params.slots)
                           + 1j * rng.uniform(-0.5, 0.5, params.slots))
        c = enc.encrypt_msg(m, pk_set.get(uid))
        ct = c if ct is None else ev.add_new(ct, c)
    return dict(params=params, rlk=rlk_set, sk=sk_set, ct=ct, ev=ev)


def test_devices_available():
    assert len(jax.devices()) >= 8, \
        "conftest must provide 8 virtual CPU devices"



@pytest.mark.skipif(not __import__("os").environ.get("RUN_SLOW"),
                    reason="GSPMD full-mult bit-identity: compile-heavy on CPU; RUN_SLOW tier (GSPMD NTT coverage stays default via test_sharded_ntt_matches, and the driver dry-runs this path in __graft_entry__)")
def test_sharded_mul_matches_unsharded(ctx):
    params, ct, rlk = ctx["params"], ctx["ct"], ctx["rlk"]
    level = ct.level
    b, d, v = rlk.stacked(ct.ids)

    # unsharded result
    ref = ksw.mul_and_relin(params.rlwe, ct.ct, ct.ct, (b, d, v), level)

    mesh = parallel.make_mesh(8, rns=2)
    ct_sh = parallel.shard_ciphertext(ct, mesh)
    b2, d2, v2 = parallel.shard_rlk_stacked((b, d, v), mesh)

    @jax.jit
    def step(data, b, d, v):
        import dataclasses
        c = dataclasses.replace(ct.ct, data=data)
        return ksw.mul_and_relin(params.rlwe, c, c, (b, d, v), level).data

    with mesh:
        out = step(ct_sh.ct.data, b2, d2, v2)
        out.block_until_ready()
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref.data))


def test_sharded_ntt_matches(ctx):
    params = ctx["params"]
    ring = params.rlwe.ring_q
    rng = np.random.default_rng(9)
    x = (rng.integers(0, 1 << 60, (4, ring.nlimbs, ring.n), dtype=np.uint64)
         % np.array(ring.moduli, np.uint64)[:, None]).astype(np.uint32)
    ref = np.asarray(ring.ntt(jnp.asarray(x)))
    mesh = parallel.make_mesh(8, rns=2)
    from jax.sharding import NamedSharding, PartitionSpec as P
    xs = jax.device_put(jnp.asarray(x),
                        NamedSharding(mesh, P(None, "rns", "coeff")))
    with mesh:
        out = jax.jit(ring.ntt)(xs)
        out.block_until_ready()
    np.testing.assert_array_equal(np.asarray(out), ref)
