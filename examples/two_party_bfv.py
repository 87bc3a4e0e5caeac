"""Two-party multi-key BFV walkthrough (exact integer arithmetic mod T).

Alice and Bob each hold their own secret key; ciphertexts encrypted under
either key combine homomorphically with EXACT results mod T=65537, and
decryption requires both parties' shares (reference behavior:
mkbfv/mkbfv_test.go multi-user mult, require.Equal exactness).

Run: python examples/two_party_bfv.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from mkhe_tpu import mkrlwe, mkbfv
from mkhe_tpu.ops.primes import ntt_primes


T = 65537


def main():
    # small demo parameters (double RNS basis R = Q * QMul, per
    # mkbfv/params.go:36-81 of the reference)
    logn = 10
    q = ntt_primes(logn, 26.5, 5)
    qmul = ntt_primes(logn, 26.5, 5, skip=5)
    p = ntt_primes(logn, 28.4, 2)
    params = mkbfv.new_parameters(logn, q, qmul, p, t=T)

    kgen = mkbfv.KeyGenerator(params, seed=11)
    sk_set = mkrlwe.SecretKeySet()
    pk_set = mkrlwe.PublicKeySet()
    rlk_set = mkbfv.RelinearizationKeySet()
    for uid in ("alice", "bob"):
        sk, pk = kgen.gen_key_pair(uid)
        sk_set.add(sk)
        pk_set.add(pk)
        rlk_set.add(kgen.gen_relinearization_key_bfv(
            sk, kgen.gen_secret_key(uid)))

    enc = mkbfv.Encryptor(params, seed=12)
    dec = mkbfv.Decryptor(params)
    ev = mkbfv.Evaluator(params)

    rng = np.random.default_rng(0)
    ma = rng.integers(-100, 100, size=params.n, dtype=np.int64)
    mb = rng.integers(-100, 100, size=params.n, dtype=np.int64)

    ct_a = enc.encrypt_msg(ma, pk_set.get("alice"))
    ct_b = enc.encrypt_msg(mb, pk_set.get("bob"))

    # homomorphic ops across the two keys: the result is a 2-party ct
    ct_sum = ev.add_new(ct_a, ct_b)
    ct_prod = ev.mul_relin_new(ct_a, ct_b, rlk_set)

    def cmod(x):
        r = np.mod(x, T)
        return np.where(r > T // 2, r - T, r)

    out_sum = dec.decrypt(ct_sum, sk_set)
    out_prod = dec.decrypt(ct_prod, sk_set)

    assert np.array_equal(out_sum, cmod(ma + mb)), "sum mismatch"
    assert np.array_equal(out_prod, cmod(ma * mb)), "product mismatch"
    print(f"2-party BFV: sum and product EXACT mod {T} "
          f"on all {params.n} slots")
    print("first 8 slots:", "a =", ma[:8], "| b =", mb[:8])
    print("               a*b =", out_prod[:8])


if __name__ == "__main__":
    main()
