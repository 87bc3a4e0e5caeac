"""MulAndRelin cost attribution probe (run on the real TPU chip).

Times the individual stages of the 4-party logN=15 KKLSS mult+relin
(the headline benchmark) in isolation with the chained fori_loop
protocol, so optimization effort goes where the time is. Stages follow
mkrlwe/keyswitch.py mul_and_relin.
"""

import functools
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from benchmarks._timing import slope_time_ms
from mkhe_tpu import mkrlwe, mkckks
from mkhe_tpu.mkrlwe import keyswitch as ksw
from mkhe_tpu.ops import basis

PARTIES = int(os.environ.get("PROBE_PARTIES", "4"))
PRESET = os.environ.get("PROBE_PRESET", "PN15QP880")


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_mkhe"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    params = getattr(mkckks, PRESET)()
    rp = params.rlwe
    kgen = mkrlwe.KeyGenerator(rp, seed=5)
    rlk = mkrlwe.RelinearizationKeySet()
    pks = {}
    for i in range(PARTIES):
        uid = f"user{i}"
        sk, pk = kgen.gen_key_pair(uid)
        rlk.add(kgen.gen_relinearization_key(sk, kgen.gen_secret_key(uid)))
        pks[uid] = pk
    enc = mkckks.Encryptor(params, seed=6)
    rng = np.random.default_rng(0)
    ct = None
    ev = mkckks.Evaluator(params)
    for i in range(PARTIES):
        msg = mkckks.Message(value=rng.uniform(0.1, 0.5, params.slots))
        c = enc.encrypt_msg(msg, pks[f"user{i}"])
        ct = c if ct is None else ev.add_new(ct, c)

    level = ct.level
    ids = ct.ids
    b, d, v = rlk.stacked(ids)
    data = ct.ct.data
    ring_q = rp.ring_q_at(level)
    ring_qp = rp.ring_qp_at(level)
    lq = level + 1

    print(f"probe: {PARTIES}-party {PRESET} logN={params.logn}, Lq={lq}, "
          f"Lp={rp.pcount}, beta={rp.beta(level)}, alpha={rp.alpha}",
          flush=True)

    d_keys = ksw.slice_swk(rp, d, level)
    v_keys = ksw.slice_swk(rp, v, level)
    u_key = rp.crs_at(-1, level)

    @jax.jit
    def setup(data):
        dec0 = ksw.decompose(rp, data[1:, :lq], level)
        x = ksw._aggregate_keys(rp, dec0, d_keys, level)
        xqp = ksw.external_product_ntt(rp, dec0, x, level)
        return dec0, x, xqp

    dec0, x, xqp = jax.block_until_ready(setup(data))
    print("setup done", flush=True)

    def probe(name, step, arg, k2=32, consts=()):
        # pass key material as jit ARGUMENTS, not closure constants —
        # embedded constants blow past the relay's compile-request size
        # limit (HTTP 413) at PN15QP880 key shapes.
        def run_fn(a, kk, *cs):
            def body(i, cur):
                r = step(cur, *cs)
                return cur ^ r.ravel()[0].astype(cur.dtype)
            return jax.lax.fori_loop(0, kk, body, a).ravel()[0]
        run = jax.jit(run_fn)
        ms = min(slope_time_ms(lambda k: run(arg, k, *consts), 2, k2)
                 for _ in range(3))
        print(f"{name:44s} {ms:8.3f} ms", flush=True)
        return ms

    from mkhe_tpu.mkrlwe.elements import Ciphertext

    def full(cur, b_, d_, v_):
        c = Ciphertext(ids=ids, data=cur)
        out = ksw.mul_and_relin(rp, c, c, (b_, d_, v_), level, square=True)
        return basis.div_round_by_last_moduli(out.data, ring_q, 2)

    probe("FULL mul_and_relin + rescale", full, data, k2=16,
          consts=(b, d, v))

    probe("decompose (k parties, beta digits, NTT)",
          lambda cur: ksw.decompose(rp, cur, level), data[1:, :lq], k2=16)
    probe("aggregate_keys (x or y)",
          lambda cur, dk: ksw._aggregate_keys(rp, cur, dk, level),
          dec0, k2=32, consts=(d_keys,))
    probe("to_mont (Lqp)",
          lambda cur: ring_qp.to_mont(cur), x, k2=64)
    probe("external_product_ntt (k-batched)",
          lambda cur, xx: ksw.external_product_ntt(rp, cur, xx, level),
          dec0, k2=32, consts=(x,))
    probe("mod_down_qp (k-batched intt + basis)",
          lambda cur: ksw.mod_down_qp(rp, cur, level),
          jnp.broadcast_to(xqp, (PARTIES, *xqp.shape)), k2=32)
    probe("tensor ntts (k+1 polys, Lq)",
          lambda cur: ring_q.ntt(cur), data[:, :lq], k2=32)
    probe("tensor intt (k+1 polys, Lq)",
          lambda cur: ring_q.intt(cur), data[:, :lq], k2=32)
    probe("rescale (2 limb pairs)",
          lambda cur: jnp.pad(basis.div_round_by_last_moduli(
              cur, ring_q, 2), ((0, 0), (0, 2), (0, 0))),
          data[:, :lq], k2=64)


if __name__ == "__main__":
    main()
