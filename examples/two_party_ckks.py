"""Two-party multi-key CKKS walkthrough.

Alice and Bob each hold their own secret key; ciphertexts encrypted under
either key can be combined homomorphically, and decryption requires BOTH
parties' partial decryptions (the MPC deployment shape of
mkrlwe.Decryptor.PartialDecrypt).

Run: python examples/two_party_ckks.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from mkhe_tpu import mkrlwe, mkckks


def main():
    # small demo parameters (use mkckks.PN15QP880() for production scale)
    params = mkckks.new_parameters(
        12, 11, q0_bits=28.9, level_bits=26.0, levels=3, scale=2.0 ** 52,
        p_bits=28.4, p_count=4)

    kgen = mkrlwe.KeyGenerator(params.rlwe)
    sk_set = mkrlwe.SecretKeySet()
    pk_set = mkrlwe.PublicKeySet()
    rlk_set = mkrlwe.RelinearizationKeySet()
    rtk_set = mkrlwe.RotationKeySet()
    for who in ("alice", "bob"):
        sk, pk = kgen.gen_key_pair(who)
        sk_set.add(sk)
        pk_set.add(pk)
        rlk_set.add(kgen.gen_relinearization_key(
            sk, kgen.gen_secret_key(who)))
        rtk_set.add(kgen.gen_rotation_key(1, sk))

    enc = mkckks.Encryptor(params)
    dec = mkckks.Decryptor(params)
    ev = mkckks.Evaluator(params)

    rng = np.random.default_rng(0)
    za = rng.uniform(-1, 1, params.slots)
    zb = rng.uniform(-1, 1, params.slots)

    ct_a = enc.encrypt_msg(mkckks.Message(value=za), pk_set.get("alice"))
    ct_b = enc.encrypt_msg(mkckks.Message(value=zb), pk_set.get("bob"))

    # homomorphic (za + zb) * za, then rotate left by 1 — timed per op
    # with honest host-fetch synchronization (utils/profiling.Timer)
    from mkhe_tpu.utils.profiling import Timer
    timer = Timer()
    with timer.region("add"):
        ct_sum = ev.add_new(ct_a, ct_b)      # 2-party ciphertext
    with timer.region("mul_relin", sync_out=None) as _:
        ct_prod = ev.mul_relin_new(ct_sum, ct_a, rlk_set)
    with timer.region("rotate"):
        ct_rot = ev.rotate_new(ct_prod, 1, rtk_set)

    # distributed decryption: alice partially decrypts, then bob
    partial = dec.partial_decrypt(ct_rot, sk_set.get("alice"))
    partial = dec.partial_decrypt(partial, sk_set.get("bob"))
    out = dec.decrypt(partial, sk_set)  # no ids left; returns message

    want = np.roll((za + zb) * za, -1)
    err = np.max(np.abs(out.value.real - want))
    print(timer.summary())
    print(f"slots={params.slots}  max |err| = {err:.2e}")
    assert err < 1e-6
    print("two-party encrypted computation verified")


if __name__ == "__main__":
    main()
