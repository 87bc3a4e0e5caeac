"""NTT kernel cost attribution probe (run on the real TPU chip).

Times variant kernels to attribute the per-stage cost of the fused Pallas
NTT (ops/ntt_pallas.py): stage-count slope (compute linearity), roll-only
and mul-only variants (data movement vs VPU multiply cost), and a grid
order that reuses twiddle blocks across the batch axis. Informs round-2
kernel optimization; results recorded in BENCH_NOTES.md.
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mkhe_tpu.ops import modmath as mm
from mkhe_tpu.ops.ring import Ring
from mkhe_tpu.ops.primes import ntt_primes
from benchmarks._timing import slope_time_ms

LIMB_TILE = 8
LOGN = 15
N = 1 << LOGN
BATCH = 4
L = 32


def _variant_kernel(n, logn, x_ref, wpack_ref, wpack_sh_ref, twist_ref,
                    twist_sh_ref, q_ref, bar_ref, out_ref, *, stages,
                    do_roll, do_mul):
    a = x_ref[0]
    q = q_ref[:]
    q2 = q * jnp.uint32(2)
    a = mm.shoup_mul_lazy(a, twist_ref[:], twist_sh_ref[:], q)
    lane = jax.lax.broadcasted_iota(jnp.int32, (LIMB_TILE, n), 1)
    off = 0
    for s in range(1, stages + 1):
        h = n >> s
        if do_roll:
            p = pltpu.roll(a, n - h, 1)
            mn = pltpu.roll(a, h, 1)
        else:
            p, mn = a, a
        first = (lane & h) == 0
        top = mm.csub(a + p, q2)
        diff = mn + (q2 - a)
        if do_mul and h > 1:
            tw = pltpu.repeat(wpack_ref[:, off:off + h], n // h, axis=1)
            tw_sh = pltpu.repeat(wpack_sh_ref[:, off:off + h],
                                 n // h, axis=1)
            bot = mm.shoup_mul_lazy(diff, tw, tw_sh, q)
        else:
            bot = mm.csub(diff, q2)
        a = jnp.where(first, top, bot)
        off += h
    out_ref[0] = mm.csub(a, q)


@functools.partial(jax.jit, static_argnames=("stages", "do_roll", "do_mul",
                                             "swap_grid"))
def _call(x, t1, t1_sh, t2, t2_sh, q, bar, stages, do_roll, do_mul,
          swap_grid):
    b, lpad = x.shape[0], x.shape[1]
    if swap_grid:
        grid = (lpad // LIMB_TILE, b)
        tbl = lambda: pl.BlockSpec((LIMB_TILE, N), lambda j, i: (j, 0),
                                   memory_space=pltpu.VMEM)
        col = lambda: pl.BlockSpec((LIMB_TILE, 1), lambda j, i: (j, 0),
                                   memory_space=pltpu.VMEM)
        dat = pl.BlockSpec((1, LIMB_TILE, N), lambda j, i: (i, j, 0),
                           memory_space=pltpu.VMEM)
    else:
        grid = (b, lpad // LIMB_TILE)
        tbl = lambda: pl.BlockSpec((LIMB_TILE, N), lambda i, j: (j, 0),
                                   memory_space=pltpu.VMEM)
        col = lambda: pl.BlockSpec((LIMB_TILE, 1), lambda i, j: (j, 0),
                                   memory_space=pltpu.VMEM)
        dat = pl.BlockSpec((1, LIMB_TILE, N), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    kern = functools.partial(_variant_kernel, N, LOGN, stages=stages,
                             do_roll=do_roll, do_mul=do_mul)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[dat, tbl(), tbl(), tbl(), tbl(), col(), col()],
        out_specs=dat,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, t1, t1_sh, t2, t2_sh, q, bar)


def main():
    ring = Ring.create(ntt_primes(LOGN, 28.9, L), LOGN)
    rng = np.random.default_rng(0)
    q = np.asarray(ring.q)
    x = (rng.integers(0, 2 ** 62, (BATCH, L, N), np.uint64)
         % q[None, :, None].astype(np.uint64)).astype(np.uint32)
    x = jnp.asarray(x)
    args = (ring.wpack, ring.wpack_sh, ring.twist, ring.twist_sh,
            ring.q[:, None], ring.bar[:, None])

    def probe(name, **kw):
        def body(i, cur):
            r = _call(cur, *args, **kw)
            return cur ^ r[0, 0, 0]

        run = jax.jit(
            lambda d, kk: jax.lax.fori_loop(0, kk, body, d)[0, 0, 0])
        ms = min(slope_time_ms(lambda k: run(x, k), 2, 64)
                 for _ in range(3))
        per_limb_us = ms * 1e3 / (BATCH * L)
        print(f"{name:34s} {ms:8.3f} ms/call  {per_limb_us:6.2f} us/limb")
        return ms

    print(f"probe: ({BATCH}, {L}, 2^{LOGN}) u32")
    full = probe("full 15 stages",
                 stages=LOGN, do_roll=True, do_mul=True, swap_grid=False)
    probe("stages=8", stages=8, do_roll=True, do_mul=True, swap_grid=False)
    probe("stages=1", stages=1, do_roll=True, do_mul=True, swap_grid=False)
    probe("no twiddle muls", stages=LOGN, do_roll=True, do_mul=False,
          swap_grid=False)
    probe("no rolls", stages=LOGN, do_roll=False, do_mul=True,
          swap_grid=False)
    probe("swap grid (tables resident)", stages=LOGN, do_roll=True,
          do_mul=True, swap_grid=True)


if __name__ == "__main__":
    main()
