"""Cumulative-prefix cost attribution for mul_and_relin (run on TPU).

mul_probe.py times stages in isolation, which mismeasures work that XLA
fuses differently in the full graph. This probe times progressively
larger PREFIXES of the actual mult pipeline (each prefix is one jitted
graph, chained with the fori_loop slope protocol) and reports the
DELTAS — a consistent attribution of the full graph's device time.

Env: PROBE_PRESET (PN15QP880 | PN14QP439), PROBE_PARTIES.
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
PRESET = os.environ.get("PROBE_PRESET", "PN14QP439")


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
    print(f"probe2: {PARTIES}-party {PRESET} logN={params.logn}, Lq={lq}, "
          f"Lp={rp.pcount}, beta={rp.beta(level)}, alpha={rp.alpha}",
          flush=True)

    d_keys = ksw.slice_swk(rp, d, level)
    b_keys = ksw.slice_swk(rp, b, level)
    v_keys = ksw.slice_swk(rp, v, level)
    u_key = rp.crs_at(-1, level)
    sel = np.arange(len(ids))

    def fold(*xs):
        """Scalar data-dependence on every intermediate (defeats DCE)."""
        acc = jnp.uint32(0)
        for x in xs:
            acc = acc ^ x.ravel()[0]
        return acc

    def prefix(upto):
        def fn(cur, d_keys, b_keys, v_keys, u_key):
            outs = []
            dd = cur[..., :lq, :]
            dec0 = ksw.decompose(rp, dd[1:], level)
            outs.append(dec0)
            if upto >= 2:
                x = ksw._aggregate_keys(rp, dec0, d_keys, level)
                y = ksw._aggregate_keys(rp, dec0, b_keys, level)
                outs += [x, y]
            if upto >= 3:
                nt0 = ring_q.ntt(dd)
                nt0_0m = ring_q.to_mont(nt0[0])
                out = [ring_q.mul_mont(nt0[0], nt0_0m)]
                for j in range(len(ids)):
                    t2 = ring_q.mul_mont(nt0[1 + j], nt0_0m)
                    out.append(ring_q.add(t2, t2))
                out_arr = ring_q.intt(jnp.stack(out))
                outs.append(out_arr)
            if upto >= 4:
                z1 = ksw.external_product(rp, dec0, x, level)
                outs.append(z1)
            if upto >= 5:
                t = ksw.external_product(rp, dec0, y, level)
                outs.append(t)
            if upto >= 6:
                dec_t = ksw.decompose(rp, t, level)
                outs.append(dec_t)
            if upto >= 7:
                v_sum = ksw.mod_down_qp(
                    rp, ksw._sum_parties_ntt(rp, dec_t, v_keys, level),
                    level)
                zu = ksw.external_product(rp, dec_t, u_key, level)
                outs += [v_sum, zu]
            if upto >= 8:
                res = basis.div_round_by_last_moduli(out_arr, ring_q, 2)
                outs.append(res)
            return fold(*outs)
        return fn

    names = [
        "1 decompose(ct parties)",
        "2 + x,y aggregation (+to_mont)",
        "3 + tensor terms (ntt, mults, intt)",
        "4 + z1 = Ext(dec0, x) [+moddown]",
        "5 + t  = Ext(dec0, y) [+moddown]",
        "6 + dec_t = decompose(t)",
        "7 + v_sum/zu externals [+moddowns]",
        "8 + rescale",
    ]
    prev = 0.0
    for i, name in enumerate(names, start=1):
        fn = prefix(i)
        # keys ride as jit ARGUMENTS (constants would bloat the serialized
        # HLO past the remote-compile relay's request limit)
        run = jax.jit(
            lambda a, kk, dk, bk, vk, uk: jax.lax.fori_loop(
                0, kk, lambda j, cur: cur ^ fn(cur, dk, bk, vk, uk),
                a).ravel()[0])
        ms = min(slope_time_ms(
            lambda k: run(data, k, d_keys, b_keys, v_keys, u_key), 2, 16)
            for _ in range(3))
        print(f"{name:42s} {ms:8.3f} ms   (+{ms - prev:6.3f})", flush=True)
        prev = ms

    # the real full mult for reference
    from mkhe_tpu.mkrlwe.elements import Ciphertext

    def full(cur, b, d, v):
        c = Ciphertext(ids=ids, data=cur)
        out = ksw.mul_and_relin(rp, c, c, (b, d, v), level, square=True)
        return basis.div_round_by_last_moduli(out.data, ring_q, 2)

    runf = jax.jit(
        lambda a, kk, b_, d_, v_: jax.lax.fori_loop(
            0, kk, lambda j, cur: cur ^ full(cur, b_, d_, v_)[0, 0, 0],
            a)[0, 0, 0])
    ms = min(slope_time_ms(lambda k: runf(data, k, b, d, v), 2, 16)
             for _ in range(3))
    print(f"{'FULL mul_and_relin(square) + rescale':42s} {ms:8.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
