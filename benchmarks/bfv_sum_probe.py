"""Settle the MKBFV PN15 2-party MulRelin time with the sum-feedback
chained protocol (the estimator-independent method that pinned the CKKS
headline: every element of every iteration feeds the next inputs, so no
slicing; slope over k cancels dispatch/fetch)."""

import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mkhe_tpu import mkrlwe, mkbfv


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_mkhe"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    params = mkbfv.PN15QP880()
    kgen = mkbfv.KeyGenerator(params, seed=5)
    rlk = mkbfv.RelinearizationKeySet()
    pks = {}
    for i in range(2):
        uid = f"user{i}"
        sk, pk = kgen.gen_key_pair(uid)
        rlk.add(kgen.gen_relinearization_key_bfv(
            sk, kgen.gen_secret_key(uid)))
        pks[uid] = pk
    enc = mkbfv.Encryptor(params, seed=6)
    ev = mkbfv.Evaluator(params)
    rng = np.random.default_rng(0)
    ct = None
    for i in range(2):
        m = rng.integers(0, params.t, params.n, dtype=np.int64)
        c = enc.encrypt_msg(m, pks[f"user{i}"])
        ct = c if ct is None else ev.add_new(ct, c)

    from mkhe_tpu.mkbfv import keyswitch as bksw
    import dataclasses
    rct = ct
    b, d, v = rlk.stacked(rct.ids)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chained(data0, b_, d_, v_, k):
        cur = data0
        w = jnp.uint32(0)
        for _ in range(k):
            c = dataclasses.replace(rct, data=cur)
            lift = bksw.bfv_basis.mod_up_q_to_r(params, c.data)
            resc = bksw.bfv_basis.rescale_q_to_r(params, c.data)
            out = bksw.mul_and_relin_bfv(
                params, dataclasses.replace(c, data=lift),
                dataclasses.replace(c, data=resc), (b_, d_, v_))
            w = jnp.sum(out.data, dtype=jnp.uint32)
            cur = data0 ^ w
        return w

    args = (rct.data, b, d, v)
    iters = 6
    _ = int(chained(*args, 1))
    _ = int(chained(*args, iters))
    t1s, tks = [], []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = int(chained(*args, 1))
        t1s.append((time.perf_counter() - t0) * 1e3)
        t0 = time.perf_counter()
        _ = int(chained(*args, iters))
        tks.append((time.perf_counter() - t0) * 1e3)
    slope = (min(tks) - min(t1s)) / (iters - 1)
    print(f"t1s={[round(x,1) for x in t1s]}")
    print(f"tks={[round(x,1) for x in tks]}")
    print(f"bfv mulrelin (incl. lift+rescale) sum-feedback slope: "
          f"{slope:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
