"""Fused Pallas TPU kernels for the negacyclic NTT/iNTT.

One kernel invocation performs the twist plus all log N butterfly stages on
an 8-limb block held in VMEM — versus the jnp path, which materializes ~2
full arrays in HBM per stage. The decimation is chosen so Mosaic can lower
everything with full-length lane rolls, masked selects, and *tiled*
twiddle patterns (pltpu.repeat has tile semantics):

  forward  = twist by psi^j, then DIF stages s = 1..logn with tiled
             pattern omega^(2^(s-1) j') (precomputed stage-packed in
             Ring.wpack); output in bit-reversed order — identical slot
             convention to Ring.ntt (slot j <-> exponent 2*brv(j)+1).
  inverse  = DIT stages with omega^{-...} then untwist by psi^{-j}/N.

  stage with half-block H: p[j] = a[j+H], mn[j] = a[j-H],
    DIF:  first-half j: a' = a + p ; second-half: a' = (mn - a) * tw
    DIT:  v = tw * (first ? p : a); a' = first ? a + v : mn - v
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import modmath as mm

U32 = jnp.uint32
LIMB_TILE = 8


def _fwd_kernel(n, logn, x_ref, wpack_ref, wpack_sh_ref, twist_ref,
                twist_sh_ref, q_ref, bar_ref, out_ref, *, reduce_input):
    """Harvey-style lazy butterflies: values stay in [0, 2q) between
    stages (q < 2^29 so all intermediates fit uint32); one final csub
    restores canonical form — bit-identical to the jnp path."""
    a = x_ref[0]
    q = q_ref[:]
    q2 = q * jnp.uint32(2)
    if reduce_input:
        a = mm.barrett_reduce(a, q, bar_ref[:])
    # twist: a[j] *= psi^j  (lazy, < 2q)
    a = mm.shoup_mul_lazy(a, twist_ref[:], twist_sh_ref[:], q)
    lane = jax.lax.broadcasted_iota(jnp.int32, (LIMB_TILE, n), 1)
    off = 0
    for s in range(1, logn + 1):
        h = n >> s
        p = pltpu.roll(a, n - h, 1)   # p[j] = a[j+h]
        mn = pltpu.roll(a, h, 1)      # mn[j] = a[j-h]
        first = (lane & h) == 0
        top = mm.csub(a + p, q2)                  # < 2q
        diff = mn + (q2 - a)                      # < 4q
        if h == 1:
            bot = mm.csub(diff, q2)               # last stage twiddle = 1
        else:
            tw = pltpu.repeat(wpack_ref[:, off:off + h], n // h, axis=1)
            tw_sh = pltpu.repeat(wpack_sh_ref[:, off:off + h],
                                 n // h, axis=1)
            bot = mm.shoup_mul_lazy(diff, tw, tw_sh, q)  # < 2q
        a = jnp.where(first, top, bot)
        off += h
    out_ref[0] = mm.csub(a, q)


def _inv_kernel(n, logn, x_ref, iwpack_ref, iwpack_sh_ref, untwist_ref,
                untwist_sh_ref, q_ref, bar_ref, out_ref, *, reduce_input):
    """Lazy DIT (values in [0, 2q) between stages; see _fwd_kernel)."""
    a = x_ref[0]
    q = q_ref[:]
    q2 = q * jnp.uint32(2)
    if reduce_input:
        a = mm.barrett_reduce(a, q, bar_ref[:])
    lane = jax.lax.broadcasted_iota(jnp.int32, (LIMB_TILE, n), 1)
    # DIT stages: h = 1, 2, ..., n/2; stage s has packed offset matching
    # the fwd stage with the same h.
    offs = {}
    off = 0
    for s in range(1, logn + 1):
        offs[n >> s] = off
        off += n >> s
    h = 1
    while h < n:
        p = pltpu.roll(a, n - h, 1)
        mn = pltpu.roll(a, h, 1)
        first = (lane & h) == 0
        operand = jnp.where(first, p, a)
        if h == 1:
            v = operand                           # twiddle = 1, < 2q
        else:
            o = offs[h]
            tw = pltpu.repeat(iwpack_ref[:, o:o + h], n // h, axis=1)
            tw_sh = pltpu.repeat(iwpack_sh_ref[:, o:o + h], n // h, axis=1)
            v = mm.shoup_mul_lazy(operand, tw, tw_sh, q)  # < 2q
        top = mm.csub(a + v, q2)                  # < 2q
        bot = mm.csub(mn + (q2 - v), q2)          # < 2q
        a = jnp.where(first, top, bot)
        h *= 2
    # untwist by psi^{-j}/N, restore canonical form
    out_ref[0] = mm.csub(
        mm.shoup_mul_lazy(a, untwist_ref[:], untwist_sh_ref[:], q), q)


@functools.partial(jax.jit, static_argnames=("logn", "inverse",
                                             "reduce_input"))
def _ntt_call(x, t1, t1_sh, t2, t2_sh, q, bar, logn, inverse, reduce_input):
    n = 1 << logn
    b, lpad = x.shape[0], x.shape[1]
    # limb-tile dim OUTERMOST (grid iterates the last dim fastest): the
    # four (8, n) twiddle-table blocks depend only on j, so Mosaic's
    # pipeline keeps them resident in VMEM across all b batch steps
    # instead of re-fetching 4 MB of tables per 1 MB of data — table HBM
    # traffic drops from ~3x the data traffic to ~1/b of it.
    grid = (lpad // LIMB_TILE, b)
    tbl = lambda: pl.BlockSpec((LIMB_TILE, n), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM)
    col = lambda: pl.BlockSpec((LIMB_TILE, 1), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM)
    dat = pl.BlockSpec((1, LIMB_TILE, n), lambda j, i: (i, j, 0),
                       memory_space=pltpu.VMEM)
    kern = functools.partial(_inv_kernel if inverse else _fwd_kernel,
                             n, logn, reduce_input=reduce_input)
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


def ntt_batched(ring, a, inverse: bool = False, reduce_input: bool = False):
    """Drop-in for Ring.ntt/intt on TPU: (..., L, N) -> (..., L, N).
    Pads the limb axis to a multiple of 8 (padded rows use limb 0's
    modulus and are discarded)."""
    L = a.shape[-2]
    n = ring.n
    batch_shape = a.shape[:-2]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    x = a.reshape(b, L, n)
    lpad = -(-L // LIMB_TILE) * LIMB_TILE
    pad_rows = lpad - L

    def padded(t):
        if pad_rows:
            reps = jnp.broadcast_to(t[:1], (pad_rows, *t.shape[1:]))
            t = jnp.concatenate([t, reps], axis=0)
        return t

    if pad_rows:
        x = jnp.concatenate(
            [x, jnp.zeros((b, pad_rows, n), x.dtype)], axis=1)
    q = padded(ring.q[:, None])
    bar = padded(ring.bar[:, None])
    if inverse:
        out = _ntt_call(x, padded(ring.iwpack), padded(ring.iwpack_sh),
                        padded(ring.untwist), padded(ring.untwist_sh),
                        q, bar, ring.logn, True, reduce_input)
    else:
        out = _ntt_call(x, padded(ring.wpack), padded(ring.wpack_sh),
                        padded(ring.twist), padded(ring.twist_sh),
                        q, bar, ring.logn, False, reduce_input)
    return out[:, :L].reshape(*batch_shape, L, n)
