"""Serving-throughput benchmark: batched (vmapped) MKCKKS MulRelin.

A single 4-party logN=15 mult leaves pipeline bubbles on the chip; the
batched path (Evaluator.mul_relin_batched_new — no reference analog, the
Go library is one-op-at-a-time) vmaps B independent mult+relin+rescale
pipelines into one XLA program. This measures mults/sec at several batch
sizes vs the B=1 latency path.

Env: BENCH_PARTIES (default 4), BENCH_LOGN (default 15),
BENCH_BATCHES (default "1,2,4").
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_mkhe"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from mkhe_tpu import mkrlwe, mkckks
    from _timing import chained_ckks_mul_ms, chained_ckks_mul_batched_ms

    parties = int(os.environ.get("BENCH_PARTIES", "4"))
    logn = int(os.environ.get("BENCH_LOGN", "15"))
    batches = [int(x) for x in
               os.environ.get("BENCH_BATCHES", "1,2,4").split(",")]

    params = mkckks.PN15QP880() if logn == 15 else mkckks.PN14QP439()
    kgen = mkrlwe.KeyGenerator(params.rlwe, seed=5)
    rlk = mkrlwe.RelinearizationKeySet()
    pks = {}
    for i in range(parties):
        uid = f"user{i}"
        sk, pk = kgen.gen_key_pair(uid)
        rlk.add(kgen.gen_relinearization_key(sk, kgen.gen_secret_key(uid)))
        pks[uid] = pk
    enc = mkckks.Encryptor(params, seed=6)
    ev = mkckks.Evaluator(params)
    rng = np.random.default_rng(0)
    ct = None
    for i in range(parties):
        m = mkckks.Message(value=rng.uniform(
            0.1 / parties, 1.0 / parties, params.slots))
        c = enc.encrypt_msg(m, pks[f"user{i}"])
        ct = c if ct is None else ev.add_new(ct, c)

    base_ms = chained_ckks_mul_ms(params, ct, rlk)
    print(json.dumps({
        "metric": f"mkckks_mulrelin_logn{logn}_{parties}party",
        "value": round(base_ms, 2), "unit": "ms"}), flush=True)
    for b in batches:
        if b == 1:
            continue
        ms = chained_ckks_mul_batched_ms(params, ct, rlk, b)
        print(json.dumps({
            "metric": f"mkckks_mulrelin_batched{b}_per_mult",
            "value": round(ms / b, 2), "unit": "ms",
            "throughput_mults_per_sec": round(1000.0 * b / ms, 1),
            "speedup_vs_b1": round(base_ms / (ms / b), 2)}), flush=True)


if __name__ == "__main__":
    main()
