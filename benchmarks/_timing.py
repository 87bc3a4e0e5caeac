"""Chained-in-graph timing helpers.

The axon relay makes per-dispatch timing unreliable (block_until_ready is
not honest, host fetches cost ~65 ms round trips), so every benchmark row
runs the op inside a jax.lax.fori_loop with a *dynamic* trip count k,
chained through a genuine data dependency: the SUM over the ENTIRE output
XORed into the next input. The sum (one cheap pass) makes every element
of every iteration feed the next, so XLA cannot slice intermediate
iterations down to the one element a scalar feedback would expose —
scalar feedback under-counted the BFV logN=15 mult 27.6 -> 17 ms
(sum-feedback reference: benchmarks/bfv_sum_probe.py; the CKKS headline
was unaffected, 24.5 both ways, but sum feedback makes it provable).
Costs are data-independent, so timing is representative. One compile
serves every k; the reported time is the slope (t_k2 - t_k1)/(k2 - k1),
which cancels dispatch/fetch overhead.
"""

from __future__ import annotations

import dataclasses
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp


def slope_time_ms(run_k, k1: int, k2: int, repeats: int = 5) -> float:
    """run_k(k) -> jax array; per-iteration ms via the (k1, k2) slope
    of the SEPARATE minima: (min tk - min t1) / (k2 - k1).

    Relay/host scheduling noise is one-sided (it only ADDS to the device
    time), so min-over-repeats of each measurement recovers each graph's
    clean device time; differencing the minima gives an unbiased slope.
    A min over PAIRED slopes instead biases low (it prefers a slow t1
    paired with a fast tk — measured: 0.0-6.8 ms artifacts on small
    graphs), and a median inherits the congestion tail (measured: the
    BFV logN=15 row swung 17 -> 27 ms under load)."""
    _ = int(np.asarray(run_k(k1)).ravel()[0])  # compile (shared for k2)
    _ = int(np.asarray(run_k(k2)).ravel()[0])
    t1s, tks = [], []
    for _i in range(repeats):
        t0 = time.perf_counter()
        _ = int(np.asarray(run_k(k1)).ravel()[0])
        t1s.append((time.perf_counter() - t0) * 1e3)
        t0 = time.perf_counter()
        _ = int(np.asarray(run_k(k2)).ravel()[0])
        tks.append((time.perf_counter() - t0) * 1e3)
    return max((min(tks) - min(t1s)) / (k2 - k1), 1e-6)


def _looped(step):
    """Wrap a data->data step into jit(fori_loop) with dynamic k."""
    @jax.jit
    def run(data, k, *args):
        def body(i, cur):
            return step(cur, *args)
        return jax.lax.fori_loop(0, k, body, data)
    return run


def chained_ckks_mul_ms(params, ct, rlk_set, k1: int = 2, k2: int = 20
                        ) -> float:
    from mkhe_tpu.mkrlwe import keyswitch as ksw
    from mkhe_tpu.ops import basis

    rp = params.rlwe
    level = ct.level
    b, d, v = rlk_set.stacked(ct.ids)
    rct = ct.ct
    data0 = rct.data

    def step(cur, b, d, v):
        c = dataclasses.replace(rct, data=cur)
        out = ksw.mul_and_relin(rp, c, c, (b, d, v), level, square=True)
        res = basis.div_round_by_last_moduli(
            out.data, rp.ring_q_at(level), 2)
        return data0 ^ jnp.sum(res, dtype=jnp.uint32)

    run = _looped(step)
    return slope_time_ms(lambda k: run(data0, k, b, d, v), k1, k2)


def chained_ckks_mul_batched_ms(params, ct, rlk_set, batch: int,
                                k1: int = 2, k2: int = 10) -> float:
    """Per-mult ms of the vmapped batched mult (serving throughput path):
    `batch` independent square-mults + rescale per iteration, chained.
    Returns the per-iteration time; caller divides by `batch`."""
    from mkhe_tpu.mkrlwe import keyswitch as ksw
    from mkhe_tpu.ops import basis

    rp = params.rlwe
    level = ct.level
    b, d, v = rlk_set.stacked(ct.ids)
    rct = ct.ct
    data0 = jnp.stack([rct.data] * batch)

    def step(cur, b, d, v):
        def one(dd):
            c = dataclasses.replace(rct, data=dd)
            out = ksw.mul_and_relin(rp, c, c, (b, d, v), level,
                                    square=True)
            return basis.div_round_by_last_moduli(
                out.data, rp.ring_q_at(level), 2)
        res = jax.vmap(one)(cur)
        return data0 ^ jnp.sum(res, dtype=jnp.uint32)

    run = _looped(step)
    return slope_time_ms(lambda k: run(data0, k, b, d, v), k1, k2)


def chained_ckks_rotate_ms(params, ct, rtk_set, rot_idx: int,
                           k1: int = 2, k2: int = 50) -> float:
    from mkhe_tpu.mkrlwe import keyswitch as ksw

    rp = params.rlwe
    rct = ct.ct
    rks = rtk_set.stacked(ct.ids, rot_idx)
    a = rp.crs_at(rot_idx, ct.level)
    src, sign = ksw.rotation_tables(rp, rot_idx)

    def step(cur, rks, a, src, sign):
        c = dataclasses.replace(rct, data=cur)
        return ksw.rotate_with(rp, c, rks, a, src, sign).data

    run = _looped(step)
    return slope_time_ms(lambda k: run(rct.data, k, rks, a, src, sign),
                         k1, k2)


def chained_bfv_mul_ms(params, ct, rlk_set, k1: int = 2, k2: int = 10
                       ) -> float:
    from mkhe_tpu.mkbfv import basis as bfv_basis
    from mkhe_tpu.mkbfv import keyswitch as bfv_ksw

    b, d, v = rlk_set.stacked(ct.ids)
    data0 = ct.data

    def step(cur, b, d, v):
        c0r = dataclasses.replace(
            ct, data=bfv_basis.mod_up_q_to_r(params, cur))
        c1r = dataclasses.replace(
            ct, data=bfv_basis.rescale_q_to_r(params, cur))
        out = bfv_ksw.mul_and_relin_bfv(params, c0r, c1r, (b, d, v))
        return data0 ^ jnp.sum(out.data, dtype=jnp.uint32)

    run = _looped(step)
    return slope_time_ms(lambda k: run(data0, k, b, d, v), k1, k2)
