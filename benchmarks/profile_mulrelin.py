"""Phase breakdown of the 4-party logN=15 MulRelin (the headline bench):
times each sub-phase with the chained-in-graph protocol so we know where
the milliseconds go before optimizing. Run on TPU: python benchmarks/profile_mulrelin.py
"""

import dataclasses
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_mkhe"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mkhe_tpu import mkrlwe, mkckks
from mkhe_tpu.mkrlwe import keyswitch as ksw
from mkhe_tpu.ops import basis as rns_basis

PARTIES = int(os.environ.get("BENCH_PARTIES", "4"))
ITERS = int(os.environ.get("BENCH_ITERS", "6"))


def timed(name, fn, *arrays):
    """Chained timing: k executions inside one graph, slope in ms.
    All large operands MUST be passed via *arrays (jit args) — closures
    would embed them as HLO constants (the relay rejects big programs)."""
    @functools.partial(jax.jit, static_argnames=("k",))
    def chained(seed_u32, k, *arrs):
        out = None
        cur = seed_u32
        for _ in range(k):
            out = fn(cur, *arrs)
            cur = cur ^ out.reshape(-1)[0]
        return out

    z = jnp.uint32(0)
    _ = int(np.asarray(chained(z, 1, *arrays)).reshape(-1)[0])
    _ = int(np.asarray(chained(z, ITERS, *arrays)).reshape(-1)[0])
    t0 = time.perf_counter()
    _ = int(np.asarray(chained(z, 1, *arrays)).reshape(-1)[0])
    t1 = (time.perf_counter() - t0) * 1000
    t0 = time.perf_counter()
    _ = int(np.asarray(chained(z, ITERS, *arrays)).reshape(-1)[0])
    tk = (time.perf_counter() - t0) * 1000
    ms = max((tk - t1) / (ITERS - 1), 0.0)
    print(f"{name:38s} {ms:8.2f} ms")
    return ms


def main():
    params = mkckks.PN15QP880()
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
    ev = mkckks.Evaluator(params)
    rng = np.random.default_rng(0)
    ct = None
    for i in range(PARTIES):
        msg = mkckks.Message(value=rng.uniform(0, 0.2, params.slots))
        c = enc.encrypt_msg(msg, pks[f"user{i}"])
        ct = c if ct is None else ev.add_new(ct, c)

    level = ct.level
    b, d, v = rlk.stacked(ct.ids)
    data = ct.ct.data
    ids = ct.ids
    sel = np.arange(len(ids))
    d_keys = ksw.slice_swk(rp, d[sel], level)
    b_keys = ksw.slice_swk(rp, b[sel], level)
    v_keys = ksw.slice_swk(rp, v[sel], level)
    u_key = rp.crs_at(-1, level)
    ring_q = rp.ring_q_at(level)
    ring_qp = rp.ring_qp_at(level)

    # materialize intermediates once for phase isolation
    dec0 = jax.jit(lambda x: ksw.decompose(rp, x, level))(data[1:])
    x = jax.jit(lambda dg: ksw._aggregate_keys(rp, dg, d_keys,
                                               level))(dec0)
    t = jax.jit(lambda dg, xx: ksw.external_product(rp, dg, xx, level))(
        dec0, x)
    dec_t = jax.jit(lambda tt: ksw.decompose(rp, tt, level))(t)
    digits_raw = jax.jit(lambda z: rns_basis.decompose_digits(
        z, ring_q, ring_qp, rp.alpha))(data[1:])

    def seed_mix(seed, arr):
        return arr ^ seed

    print(f"phases of 4-party logN=15 MulRelin (square path), "
          f"beta={rp.beta(level)}, Lqp={level + 1 + rp.pcount}")

    qp_ntt = jax.jit(lambda a: ksw.external_product_ntt(rp, a, x, level))
    ext_ntt_out = qp_ntt(dec0)

    timed("decompose_digits (base ext only)",
          lambda s, dat: rns_basis.decompose_digits(
              seed_mix(s, dat), ring_q, ring_qp, rp.alpha), data[1:])
    timed("decompose digits NTT only",
          lambda s, dg: ring_qp.ntt(seed_mix(s, dg)), digits_raw)
    timed("full decompose (dec0)",
          lambda s, dat: ksw.decompose(rp, seed_mix(s, dat), level),
          data[1:])
    timed("aggregate x",
          lambda s, dg, dk: ksw._aggregate_keys(
              rp, seed_mix(s, dg), dk, level), dec0, d_keys)
    def tensor(s, dat):
        d0 = seed_mix(s, dat)
        nt0 = ring_q.ntt(d0)
        nt0_0m = ring_q.to_mont(nt0[0])
        out = [ring_q.mul_mont(nt0[0], nt0_0m)]
        for j in range(len(ids)):
            out.append(ring_q.mul_mont(nt0[1 + j], nt0_0m))
        return ring_q.intt(jnp.stack(out))
    timed("tensor terms (5 ntt + pw + 5 intt)", tensor, data)
    timed("ext-product z1 (contract+intt+moddown)",
          lambda s, dg, xx: ksw.external_product(
              rp, seed_mix(s, dg), xx, level), dec0, x)
    timed("  contraction only (ext_ntt)",
          lambda s, dg, xx: ksw.external_product_ntt(
              rp, seed_mix(s, dg), xx, level), dec0, x)
    timed("  mod_down_qp only",
          lambda s, c: ksw.mod_down_qp(rp, seed_mix(s, c), level),
          ext_ntt_out)
    timed("decompose(t) -> dec_t",
          lambda s, tt: ksw.decompose(rp, seed_mix(s, tt), level), t)
    timed("v_sum (_sum_parties_ntt + moddown)",
          lambda s, dg, vk: ksw.mod_down_qp(rp, ksw._sum_parties_ntt(
              rp, seed_mix(s, dg), vk, level), level), dec_t, v_keys)
    timed("ext-product zu",
          lambda s, dg, uk: ksw.external_product(
              rp, seed_mix(s, dg), uk, level), dec_t, u_key)
    timed("rescale (2 limbs)",
          lambda s, dat: rns_basis.div_round_by_last_moduli(
              seed_mix(s, dat), ring_q, 2), data)
    timed("FULL mul_and_relin (square)",
          lambda s, dat, bb, dd, vv: ksw.mul_and_relin(
              rp, dataclasses.replace(ct.ct, data=seed_mix(s, dat)),
              dataclasses.replace(ct.ct, data=seed_mix(s, dat)),
              (bb, dd, vv), level, square=True).data,
          data, b, d, v)


if __name__ == "__main__":
    main()
