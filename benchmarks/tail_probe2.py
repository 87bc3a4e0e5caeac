"""Isolated component timings for the PN15 mult tail (run on TPU).

Each measured fn is shape-preserving (carry ^ broadcast(result)) so XLA
cannot slice-push-down into the producers (the cumulative prefix probe's
fold can under-count elementwise work). Env: PROBE_PRESET, PROBE_PARTIES.
"""

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
    ring_q = rp.ring_q_at(level)
    ring_qp = rp.ring_qp_at(level)
    lq = level + 1
    print(f"tail_probe2: {PARTIES}-party {PRESET} logN={params.logn}, "
          f"Lq={lq}, Lp={rp.pcount}, beta={rp.beta(level)}", flush=True)

    d_keys = ksw.slice_swk(rp, d, level)
    b_keys = ksw.slice_swk(rp, b, level)
    v_keys = ksw.slice_swk(rp, v, level)
    u_key = rp.crs_at(-1, level)

    dig = jax.block_until_ready(
        jax.jit(lambda x: ksw.decompose(rp, x, level))(ct.ct.data[1:]))
    x_agg = jax.block_until_ready(
        jax.jit(lambda dg, dk: ksw._aggregate_keys(rp, dg, dk, level))(
            dig, d_keys))
    qp4 = jax.block_until_ready(
        jax.jit(lambda dg, xx: ksw.external_product_ntt(
            rp, dg, xx, level))(dig, x_agg))  # (k, Lqp, N) canonical

    def timed(name, step, carry, *args):
        run = jax.jit(lambda a, kk, *ar: jax.lax.fori_loop(
            0, kk, lambda j, cur: step(cur, *ar), a))
        ms = min(slope_time_ms(
            lambda k: run(carry, k, *args)[(0,) * carry.ndim], 2, 10)
            for _ in range(3))
        print(f"{name:44s} {ms:8.3f} ms", flush=True)
        return ms

    # forward NTT / inverse NTT on the digit tensor
    from mkhe_tpu.utils import profiling
    nlimbs = int(np.prod(dig.shape[:-1]))
    ms = timed("ntt fwd (4,14,32,N)", lambda cur: ring_qp.ntt(cur), dig)
    print("  " + profiling.roofline_report(params.logn, nlimbs,
                                           ms * 1e3), flush=True)
    ms = timed("intt (4,14,32,N)",
               lambda cur: ring_qp.intt(cur, reduce_input=True), dig)
    print("  " + profiling.roofline_report(params.logn, nlimbs,
                                           ms * 1e3), flush=True)
    # mod_up only (decompose_digits, no NTT): output same shape as dig
    timed("mod_up digits only",
          lambda cur: basis.decompose_digits(
              cur[..., 0, :lq, :], ring_q, ring_qp, rp.alpha) ^ cur, dig)
    # full decompose from (4, Lq, N)
    timed("decompose = mod_up + ntt",
          lambda cur: ksw.decompose(rp, cur[..., 0, :lq, :], level) ^ cur,
          dig)
    # x aggregation (one), then both x and y
    timed("aggregate x", lambda cur, dk: cur ^ ksw._aggregate_keys(
        rp, cur, dk, level)[None], dig, d_keys)
    timed("aggregate x+y", lambda cur, dk, bk:
          cur ^ ksw._aggregate_keys(rp, cur, dk, level)[None]
          ^ ksw._aggregate_keys(rp, cur, bk, level)[None],
          dig, d_keys, b_keys)
    # external product contraction only (NTT domain)
    timed("ext_ntt z1 = sum_b dig*x", lambda cur, xx:
          cur ^ ksw.external_product_ntt(rp, cur, xx, level)[:, None],
          dig, x_agg)
    # v_sum contraction only
    timed("v_sum contraction", lambda cur, vk:
          cur ^ ksw._sum_parties_ntt(rp, cur, vk, level)[None, None],
          dig, v_keys)
    # zu contraction only (broadcast u)
    timed("zu contraction", lambda cur, uk:
          cur ^ ksw.external_product_ntt(rp, cur, uk, level)[:, None],
          dig, u_key)
    # mod_down_qp on (k, Lqp, N)
    timed("mod_down_qp (4,32,N)", lambda cur:
          cur ^ jnp.pad(ksw.mod_down_qp(rp, cur, level),
                        ((0, 0), (0, rp.pcount), (0, 0))), qp4)
    # tensor terms: ntt of (5, Lq, N) + 5 mults + intt
    data5 = ct.ct.data

    def tensor(cur):
        nt0 = ring_q.ntt(cur)
        nt0_0m = ring_q.to_mont(nt0[0])
        out = [ring_q.mul_mont(nt0[0], nt0_0m)]
        for j in range(len(ids)):
            t2 = ring_q.mul_mont(nt0[1 + j], nt0_0m)
            out.append(ring_q.add(t2, t2))
        return cur ^ ring_q.intt(jnp.stack(out))
    timed("tensor terms (ntt+mul+intt)", tensor, data5)


if __name__ == "__main__":
    main()
