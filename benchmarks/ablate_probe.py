"""Ablation attribution for the PN15 distinct-operand mult (run on TPU).

The isolated probes (tail_probe2) overcount small-output contractions:
their anti-fusion trick (carry ^ broadcast(result)) adds a full
digit-tensor read+write per step, which dominates ops whose real output
is (k, Lqp, N) or smaller. This probe instead times PREFIXES of the real
mul_and_relin pipeline with the headline's chained-slope protocol (one
jit graph, k chained executions, one fetch), so the differences between
successive prefixes are honest marginal costs of each stage on the real
fused graph.

Prefixes (4-party distinct operands, PN15QP880 level=max):
  modup2   both operands' mod_up digits only (no NTT)
  dec2     both operands' full decompose (mod_up + NTT)
  aggxy    + x/y key aggregation
  tensor   + tensor terms (2 fwd NTT (1+k, Lq), 2k+1 mults, iNTT)
  z1t      + z1/t external products + their batched iNTT+ModDown
  full     + t-path (dec_t + v_sum + zu + batched iNTT+ModDown) = mult
  resc     + rescale (div_round_by_last_moduli)   [the headline graph]

Env: ABLATE_ITERS (default 8), ABLATE_REPEATS (3), ABLATE_STAGES
(comma list to run a subset, e.g. "dec2,full,resc").
"""

import dataclasses
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mkhe_tpu import mkrlwe, mkckks
from mkhe_tpu.mkrlwe import keyswitch as ksw
from mkhe_tpu.mkrlwe.elements import union_ids
from mkhe_tpu.ops import basis

PARTIES = 4
PRESET = "PN15QP880"


def build_stage(rp, rct0, rct1, level, stage):
    """Returns fn(data0, data1, b, d, v) -> (..., N) array for the given
    pipeline prefix; mirrors ksw.mul_and_relin stage for stage."""
    ring_q = rp.ring_q_at(level)
    u_key = rp.crs_at(-1, level)

    def fn(data0, data1, b_all, d_all, v_all):
        ct0 = dataclasses.replace(rct0, data=data0)
        ct1 = dataclasses.replace(rct1, data=data1)
        ids0, ids1 = ct0.ids, ct1.ids
        ids = union_ids(ids0, ids1)
        d0 = ct0.data[..., :level + 1, :]
        d1 = ct1.data[..., :level + 1, :]
        ring_qp = rp.ring_qp_at(level)

        if stage == "modup2":
            both = basis.decompose_digits(
                jnp.concatenate([d0[1:], d1[1:]]), rp.ring_q_at(level),
                ring_qp, rp.alpha)
            return both
        both = ksw.decompose(rp, jnp.concatenate([d0[1:], d1[1:]]), level)
        k0 = d0.shape[0] - 1
        dec0, dec1 = both[:k0], both[k0:]
        if stage == "dec2":
            return both
        sel0 = np.array([ids.index(i) for i in ids0])
        sel1 = np.array([ids.index(i) for i in ids1])
        d_keys = ksw.slice_swk(rp, d_all[sel0], level)
        b_keys = ksw.slice_swk(rp, b_all[sel1], level)
        v_keys = ksw.slice_swk(rp, v_all[sel0], level)
        x = ksw._aggregate_keys(rp, dec0, d_keys, level)
        y = ksw._aggregate_keys(rp, dec1, b_keys, level)
        if stage == "aggxy":
            return x ^ y
        nt0 = ring_q.ntt(d0)
        nt1 = ring_q.ntt(d1)
        nt0_0m = ring_q.to_mont(nt0[0])
        nt1_0m = ring_q.to_mont(nt1[0])
        out = [ring_q.mul_mont(nt1[0], nt0_0m)]
        for pid in ids:
            acc = None
            if pid in ids0:
                acc = ring_q.mul_mont(nt0[1 + ids0.index(pid)], nt1_0m)
            if pid in ids1:
                t = ring_q.mul_mont(nt1[1 + ids1.index(pid)], nt0_0m)
                acc = t if acc is None else ring_q.add(acc, t)
            out.append(acc)
        out_arr = ring_q.intt(jnp.stack(out))
        if stage == "tensor":
            return out_arr ^ (x[:, :level + 1] ^ y[:, :level + 1])[:1]
        z1_ntt = ksw.external_product_ntt(rp, dec1, x, level, lazy=True)
        t_ntt = ksw.external_product_ntt(rp, dec0, y, level, lazy=True)
        k1 = len(ids1)
        zt = ksw.mod_down_qp(rp, jnp.concatenate([z1_ntt, t_ntt]), level)
        z1, t = zt[:k1], zt[k1:]
        out_arr = out_arr.at[1 + sel1].set(
            ring_q.add(out_arr[1 + sel1], z1))
        if stage == "z1t":
            return out_arr ^ t[:1]
        dec_t = ksw.decompose(rp, t, level)
        v_ntt = ksw._sum_parties_ntt(rp, dec_t, v_keys, level, lazy=True)
        zu_ntt = ksw.external_product_ntt(rp, dec_t, u_key, level,
                                          lazy=True)
        vz = ksw.mod_down_qp(
            rp, jnp.concatenate([v_ntt[None], zu_ntt]), level)
        out_arr = out_arr.at[0].set(ring_q.add(out_arr[0], vz[0]))
        out_arr = out_arr.at[1 + sel0].set(
            ring_q.add(out_arr[1 + sel0], vz[1:]))
        if stage == "full":
            return out_arr
        return basis.div_round_by_last_moduli(
            out_arr, rp.ring_q_at(level), 2)  # "resc" = headline graph

    return fn


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
    ev = mkckks.Evaluator(params)
    rng = np.random.default_rng(0)
    ct0, ct1 = None, None
    for i in range(PARTIES):
        msg = mkckks.Message(
            value=rng.uniform(0.1 / PARTIES, 1.0 / PARTIES, params.slots))
        c = enc.encrypt_msg(msg, pks[f"user{i}"])
        ct0 = c if ct0 is None else ev.add_new(ct0, c)
        ct1 = c if ct1 is None else ev.sub_new(ct1, c)

    level = ct0.level
    b, d, v = rlk.stacked(ct0.ids)
    rct0, rct1 = ct0.ct, ct1.ct
    iters = int(os.environ.get("ABLATE_ITERS", "8"))
    repeats = int(os.environ.get("ABLATE_REPEATS", "3"))
    stages = os.environ.get(
        "ABLATE_STAGES",
        "modup2,dec2,aggxy,tensor,z1t,full,resc").split(",")
    print(f"ablate_probe: {PARTIES}-party {PRESET} iters={iters}",
          flush=True)

    prev = 0.0
    for stage in stages:
        body = build_stage(rp, rct0, rct1, level, stage)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chained(data0, data1, b_, d_, v_, k, _body=body):
            # Feedback = SUM over the ENTIRE stage output: every element
            # of every iteration feeds the next inputs, so XLA cannot
            # slice-push-down intermediate iterations to the one scalar
            # the last iteration exposes (the first version of this probe
            # XORed out[0] forward and under-counted the full mult by
            # ~8 ms). The sum is one cheap pass over <= 18 MB.
            cur0, cur1 = data0, data1
            w = jnp.uint32(0)
            for _ in range(k):
                out = _body(cur0, cur1, b_, d_, v_)
                w = jnp.sum(out, dtype=jnp.uint32)  # mod 2^32, fine
                cur0 = data0 ^ w
                cur1 = data1 ^ w
            return w

        args = (rct0.data, rct1.data, b, d, v)
        _ = int(chained(*args, 1))
        _ = int(chained(*args, iters))
        dt = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            _ = int(chained(*args, 1))
            t1 = (time.perf_counter() - t0) * 1000.0
            t0 = time.perf_counter()
            _ = int(chained(*args, iters))
            tk = (time.perf_counter() - t0) * 1000.0
            dt = min(dt, max((tk - t1) / (iters - 1), 1e-6))
        print(f"{stage:8s} {dt:8.3f} ms   (+{dt - prev:7.3f} ms)",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
