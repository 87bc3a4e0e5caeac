"""Party-axis sharded multiplication (shard_map + psum over the party
dimension) matches the single-device result."""

import numpy as np
import pytest

from mkhe_tpu import mkrlwe, mkckks, parallel
from mkhe_tpu.mkrlwe import keyswitch as ksw
from mkhe_tpu.parallel.party_mul import mul_and_relin_party_sharded


def test_party_sharded_mul_matches():
    params = mkckks.new_parameters(
        9, 8, q0_bits=28.9, level_bits=20.0, levels=2, scale=2.0 ** 40,
        p_bits=28.4)
    users = [f"u{i}" for i in range(4)]
    kgen = mkrlwe.KeyGenerator(params.rlwe, seed=91)
    rlk = mkrlwe.RelinearizationKeySet()
    sk_set = mkrlwe.SecretKeySet()
    pks = {}
    for uid in users:
        sk, pk = kgen.gen_key_pair(uid)
        sk_set.add(sk)
        rlk.add(kgen.gen_relinearization_key(sk, kgen.gen_secret_key(uid)))
        pks[uid] = pk
    enc = mkckks.Encryptor(params, seed=92)
    ev = mkckks.Evaluator(params)
    rng = np.random.default_rng(14)
    ct = None
    msg = np.zeros(params.slots, np.complex128)
    for uid in users:
        m = rng.uniform(-0.2, 0.2, params.slots) \
            + 1j * rng.uniform(-0.2, 0.2, params.slots)
        c = enc.encrypt_msg(mkckks.Message(value=m), pks[uid])
        ct = c if ct is None else ev.add_new(ct, c)
        msg = msg + m

    b, d, v = rlk.stacked(ct.ids)
    ref = ksw.mul_and_relin(params.rlwe, ct.ct, ct.ct, (b, d, v),
                            ct.level, square=True)

    mesh = parallel.make_mesh(4, rns=1)
    # rename axes: party sharding uses its own 1-d mesh over 4 devices
    import jax
    from jax.sharding import Mesh
    from jax.experimental import mesh_utils
    pmesh = Mesh(mesh_utils.create_device_mesh((4,),
                                               devices=jax.devices()[:4]),
                 ("party",))
    out = mul_and_relin_party_sharded(params.rlwe, ct.ct, (b, d, v), pmesh)

    # identical up to the documented psum-before-ModDown rounding: compare
    # decrypted messages instead of raw limbs
    np.testing.assert_array_equal(np.asarray(out.data),
                                  np.asarray(ref.data))
    dec = mkckks.Decryptor(params)
    scale = ct.scale * ct.scale
    # unrescaled product (scale^2 ~ 2^80) needs the exact CRT decode path
    m_ref = dec.decrypt(mkckks.Ciphertext(ct=ref, scale=scale), sk_set,
                        exact=True)
    m_out = dec.decrypt(mkckks.Ciphertext(ct=out, scale=scale), sk_set,
                        exact=True)
    err = np.max(np.abs(m_ref.value - m_out.value))
    want_err = np.max(np.abs(m_out.value - msg * msg))
    assert err < 1e-6
    import math
    # noise bound relative to the base scale (product not yet rescaled)
    assert math.log2(max(want_err, 1e-300)) <= \
        -math.log2(params.scale) + params.logslots + 13
