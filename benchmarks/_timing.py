"""Chained-in-graph timing helpers.

The axon relay makes per-dispatch timing unreliable (block_until_ready is
not honest, host fetches cost ~65 ms round trips), so every benchmark row
runs K copies of the op inside ONE jit graph, chained through a genuine
data dependency (XOR of one output word into the next input — costs are
data-independent, so timing is representative), and reports the slope
(t_K - t_1) / (K - 1).
"""

from __future__ import annotations

import dataclasses
import functools
import time

import numpy as np
import jax


def slope_time_ms(run_k, iters: int) -> float:
    """run_k(k) -> jax array; returns per-iteration ms via the slope."""
    _ = int(np.asarray(run_k(1)).ravel()[0])      # compile k=1
    _ = int(np.asarray(run_k(iters)).ravel()[0])  # compile k=iters
    t0 = time.perf_counter()
    _ = int(np.asarray(run_k(1)).ravel()[0])
    t1 = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    _ = int(np.asarray(run_k(iters)).ravel()[0])
    tk = (time.perf_counter() - t0) * 1e3
    return max((tk - t1) / (iters - 1), 1e-6)


def chained_ckks_mul_ms(params, ct, rlk_set, iters: int = 6) -> float:
    from mkhe_tpu.mkrlwe import keyswitch as ksw
    from mkhe_tpu.ops import basis

    rp = params.rlwe
    level = ct.level
    b, d, v = rlk_set.stacked(ct.ids)
    rct = ct.ct

    @functools.partial(jax.jit, static_argnames=("k",))
    def chained(data, b, d, v, k):
        cur = data
        for _ in range(k):
            c = dataclasses.replace(rct, data=cur)
            out = ksw.mul_and_relin(rp, c, c, (b, d, v), level,
                                    square=True)
            res = basis.div_round_by_last_moduli(
                out.data, rp.ring_q_at(level), 2)
            cur = data ^ res[0, 0, 0]
        return res

    return slope_time_ms(lambda k: chained(rct.data, b, d, v, k), iters)


def chained_ckks_rotate_ms(params, ct, rtk_set, rot_idx: int,
                           iters: int = 6) -> float:
    from mkhe_tpu.mkrlwe import keyswitch as ksw

    rp = params.rlwe
    rct = ct.ct
    rks = rtk_set.stacked(ct.ids, rot_idx)
    a = rp.crs_at(rot_idx, ct.level)
    src, sign = ksw.rotation_tables(rp, rot_idx)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chained(data, rks, a, src, sign, k):
        cur = data
        for _ in range(k):
            c = dataclasses.replace(rct, data=cur)
            cur = ksw.rotate_with(rp, c, rks, a, src, sign).data
        return cur

    return slope_time_ms(
        lambda k: chained(rct.data, rks, a, src, sign, k), iters)


def chained_bfv_mul_ms(params, ct, rlk_set, iters: int = 4) -> float:
    from mkhe_tpu.mkbfv import basis as bfv_basis
    from mkhe_tpu.mkbfv import keyswitch as bfv_ksw

    b, d, v = rlk_set.stacked(ct.ids)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chained(data, b, d, v, k):
        cur = data
        out = None
        for _ in range(k):
            c = dataclasses.replace(ct, data=cur)
            c0r = dataclasses.replace(
                ct, data=bfv_basis.mod_up_q_to_r(params, c.data))
            c1r = dataclasses.replace(
                ct, data=bfv_basis.rescale_q_to_r(params, c.data))
            out = bfv_ksw.mul_and_relin_bfv(params, c0r, c1r, (b, d, v))
            cur = data ^ out.data[0, 0, 0]
        return out.data

    return slope_time_ms(lambda k: chained(ct.data, b, d, v, k), iters)
