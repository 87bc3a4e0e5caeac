"""Checkpoint/serialization roundtrip tests (TPU-build subsystem; the
reference has none, SURVEY.md §5.4)."""

import numpy as np
import pytest

from mkhe_tpu import mkrlwe, mkckks
from mkhe_tpu.utils import serialize


def test_key_and_ct_roundtrip(tmp_path):
    params = mkckks.new_parameters(
        8, 7, q0_bits=28.9, level_bits=20.0, levels=2, scale=2.0 ** 40,
        p_bits=28.4)
    kgen = mkrlwe.KeyGenerator(params.rlwe, seed=61)
    sk, pk = kgen.gen_key_pair("alice")
    rlk = kgen.gen_relinearization_key(sk, kgen.gen_secret_key("alice"))
    rtk = kgen.gen_rotation_key(1, sk)
    enc = mkckks.Encryptor(params, seed=62)
    msg = mkckks.Message(value=np.ones(params.slots, np.complex128))
    ct = enc.encrypt_msg(msg, pk)

    p = tmp_path / "sk.npz"
    serialize.save_secret_key(str(p), sk)
    sk2 = serialize.load_secret_key(str(p))
    assert sk2.id == "alice"
    np.testing.assert_array_equal(np.asarray(sk2.data),
                                  np.asarray(sk.data))

    p = tmp_path / "rlk.npz"
    serialize.save_relin_key(str(p), rlk)
    rlk2 = serialize.load_relin_key(str(p))
    for a, b in ((rlk.b, rlk2.b), (rlk.d, rlk2.d), (rlk.v, rlk2.v)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    p = tmp_path / "rtk.npz"
    serialize.save_rotation_key(str(p), rtk)
    rtk2 = serialize.load_rotation_key(str(p))
    assert rtk2.rot_idx == 1
    np.testing.assert_array_equal(np.asarray(rtk2.data),
                                  np.asarray(rtk.data))

    p = tmp_path / "ct.npz"
    serialize.save_ciphertext(str(p), ct.ct, scale=ct.scale)
    ct2, scale = serialize.load_ciphertext(str(p))
    assert ct2.ids == ct.ids and scale == ct.scale
    np.testing.assert_array_equal(np.asarray(ct2.data),
                                  np.asarray(ct.ct.data))

    # loaded keys decrypt the loaded ciphertext
    sk_set = mkrlwe.SecretKeySet()
    sk_set.add(sk2)
    dec = mkckks.Decryptor(params)
    out = dec.decrypt(mkckks.Ciphertext(ct=ct2, scale=scale), sk_set)
    assert np.max(np.abs(out.value - msg.value)) < 1e-6
