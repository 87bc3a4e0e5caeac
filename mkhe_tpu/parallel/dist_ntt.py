"""Coefficient-sharded negacyclic NTT with explicit collectives.

This is SURVEY.md §7 "hard part 2": running the NTT with the coefficient
axis sharded across devices. The classic Cooley-Tukey dataflow splits
cleanly under a contiguous chunk sharding of N over C devices:

  - the FIRST log2(C) butterfly stages pair coefficients j and j+t with
    t >= N/C: each device's whole chunk is either the u-side or v-side
    of its block, its partner chunk lives on device d XOR (t*C/N), and
    the block twiddle is a single scalar per (device, stage). One
    `ppermute` chunk exchange per stage over the ICI ring.
  - every LATER stage (t < N/C) is chunk-local; the per-block twiddles a
    device needs are a contiguous slice of the global psi table, gathered
    host-side into a per-device local table (sharded along with the data).

The inverse (Gentleman-Sande) mirrors this: local stages first, then
log2(C) ppermute stages, then the elementwise 1/N scale.

Because the arithmetic per butterfly and the stage order are IDENTICAL to
ops/ring.py's jnp path, outputs are bit-identical to ring.ntt/intt — the
tests assert exact equality on the virtual 8-device mesh. Total traffic:
log2(C) chunk-exchanges per NTT (the four-step alternative costs a full
all-to-all transpose; the hypercube split wins for the small C of a pod
slice and keeps exchanges between ICI neighbours at power-of-two
distances).

Reference analog: lattigo ring.NTT (used at mkrlwe/keyswitch.go:29-30);
the reference is single-threaded — this module is the scale-N/scale-chip
axis of the TPU build (SURVEY.md §5.7 "coefficient axis").
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import modmath as mm
from ..ops.ring import Ring


# ----------------------------------------------------------------------------
# host-side table slicing
# ----------------------------------------------------------------------------

def _local_stage_tables(tab: np.ndarray, C: int) -> np.ndarray:
    """Per-device twiddle tables for the chunk-local stages.

    Global stage m uses psi[m + block] for block = j // (2t); on device d
    the blocks are the contiguous run starting at m*d/C, so the local
    table obeys loc[d][m_loc:2*m_loc] = tab[(C+d)*m_loc : (C+d+1)*m_loc]
    (identical form for forward psi and inverse ipsi tables)."""
    L, n = tab.shape
    chunk = n // C
    out = np.zeros((C, L, chunk), tab.dtype)
    m = 1
    while m < chunk:
        for d in range(C):
            out[d, :, m:2 * m] = tab[:, (C + d) * m:(C + d + 1) * m]
        m *= 2
    return out


def _cross_stage_tables(tab: np.ndarray, tab_sh: np.ndarray, C: int,
                        inverse: bool):
    """Per-(device, stage) twiddle scalars + u-side flags for the cross-
    device stages. Forward stage k (k=0..logC-1): m=2^k, dist=C>>(k+1),
    scalar tab[m + (d >> (logC-k))]. Inverse stage i: h=C>>(i+1),
    dist=2^i, scalar tab[h + (d >> (i+1))]."""
    L = tab.shape[0]
    logc = C.bit_length() - 1
    s = np.zeros((C, logc, L), tab.dtype)
    s_sh = np.zeros((C, logc, L), tab_sh.dtype)
    is_u = np.zeros((C, logc), np.bool_)
    for k in range(logc):
        if inverse:
            dist, base = 1 << k, C >> (k + 1)
            shift = k + 1
        else:
            dist, base = C >> (k + 1), 1 << k
            shift = logc - k
        for d in range(C):
            idx = base + (d >> shift)
            s[d, k] = tab[:, idx]
            s_sh[d, k] = tab_sh[:, idx]
            is_u[d, k] = (d // dist) % 2 == 0
    return s, s_sh, is_u


_TABLE_CACHE = {}


def _tables(ring: Ring, C: int):
    key = (C, ring.logn, ring.moduli)
    if key in _TABLE_CACHE:
        return _TABLE_CACHE[key]
    # rebuild concrete tables from the static metadata (lru-cached inside
    # Ring.create) — ring's own array fields may be tracers when called
    # during a trace
    host = Ring.create(ring.moduli, ring.logn)
    psi = np.asarray(host.psi)
    psi_sh = np.asarray(host.psi_sh)
    ipsi = np.asarray(host.ipsi)
    ipsi_sh = np.asarray(host.ipsi_sh)
    _TABLE_CACHE[key] = out = dict(
        fwd_loc=_local_stage_tables(psi, C),
        fwd_loc_sh=_local_stage_tables(psi_sh, C),
        inv_loc=_local_stage_tables(ipsi, C),
        inv_loc_sh=_local_stage_tables(ipsi_sh, C),
        fwd_cross=_cross_stage_tables(psi, psi_sh, C, inverse=False),
        inv_cross=_cross_stage_tables(ipsi, ipsi_sh, C, inverse=True),
    )
    return out


# ----------------------------------------------------------------------------
# chunk-local stage loops (identical arithmetic to ops/ring.py)
# ----------------------------------------------------------------------------

def _ct_local(a, psi, psi_sh, q):
    """Forward Cooley-Tukey stages within a chunk; psi (L, chunk)."""
    c = a.shape[-1]
    batch, L = a.shape[:-2], a.shape[-2]
    t, m = c, 1
    while m < c:
        t //= 2
        x = a.reshape(*batch, L, m, 2, t)
        u, v = x[..., 0, :], x[..., 1, :]
        s = psi[:, m:2 * m].reshape(L, m, 1)
        s_sh = psi_sh[:, m:2 * m].reshape(L, m, 1)
        qq = q[:, None, None]
        vs = mm.shoup_mul(v, s, s_sh, qq)
        a = jnp.stack([mm.add_mod(u, vs, qq), mm.sub_mod(u, vs, qq)],
                      axis=-2).reshape(*batch, L, c)
        m *= 2
    return a


def _gs_local(a, ipsi, ipsi_sh, q):
    """Inverse Gentleman-Sande stages within a chunk (no 1/N scale)."""
    c = a.shape[-1]
    batch, L = a.shape[:-2], a.shape[-2]
    t, m = 1, c
    while m > 1:
        h = m // 2
        x = a.reshape(*batch, L, h, 2, t)
        u, v = x[..., 0, :], x[..., 1, :]
        s = ipsi[:, h:2 * h].reshape(L, h, 1)
        s_sh = ipsi_sh[:, h:2 * h].reshape(L, h, 1)
        qq = q[:, None, None]
        a = jnp.stack(
            [mm.add_mod(u, v, qq),
             mm.shoup_mul(mm.sub_mod(u, v, qq), s, s_sh, qq)],
            axis=-2).reshape(*batch, L, c)
        t *= 2
        m = h
    return a


def _cross_stage(a, recv, s, s_sh, is_u, q, inverse):
    """One cross-device butterfly stage. a: own chunk (..., L, c);
    recv: partner chunk; s/s_sh: (L,) scalars; is_u: scalar bool."""
    qq = q[:, None]
    if inverse:
        # u-side result u+v; v-side result psi*(u-v)
        u = jnp.where(is_u, a, recv)
        v = jnp.where(is_u, recv, a)
        return jnp.where(
            is_u, mm.add_mod(u, v, qq),
            mm.shoup_mul(mm.sub_mod(u, v, qq), s[:, None], s_sh[:, None],
                         qq))
    u = jnp.where(is_u, a, recv)
    v = jnp.where(is_u, recv, a)
    vs = mm.shoup_mul(v, s[:, None], s_sh[:, None], qq)
    return jnp.where(is_u, mm.add_mod(u, vs, qq), mm.sub_mod(u, vs, qq))


# ----------------------------------------------------------------------------
# in-shard path: Ring.ntt/intt dispatch here when ring.dist is set
# ----------------------------------------------------------------------------

import functools


@functools.lru_cache(maxsize=None)
def _local_gather_idx(chunk: int, C: int):
    """Host index maps (A, B) such that device d's local-stage twiddle
    table is tab[:, A + d*B]: position p in stage-run [m, 2m) reads the
    global table at (C+d)*m + (p-m) = (C*m + p - m) + d*m. Only the
    GLOBAL (L, N) table ever lives in the program — one gather replaces
    the C-times-replicated per-device constants of round 1 (ADVICE r1)."""
    A = np.zeros(chunk, np.int32)
    B = np.zeros(chunk, np.int32)
    m = 1
    while m < chunk:
        for p in range(m, 2 * m):
            A[p] = C * m + p - m
            B[p] = m
        m *= 2
    return A, B


def ntt_in_shard(ring: Ring, a: jax.Array, axis: str, C: int,
                 inverse: bool = False, reduce_input: bool = False
                 ) -> jax.Array:
    """NTT/iNTT of a LOCAL chunk (..., L, N/C) inside a shard_map body.

    All twiddle data is gathered from the ring's global (L, N) tables
    (valid tracers inside the body) with host-precomputed index maps
    parameterized by lax.axis_index — no per-device constants, no host
    materialization of traced arrays."""
    if reduce_input:
        a = ring.reduce(a)
    logc = C.bit_length() - 1
    chunk = ring.n // C
    d = jax.lax.axis_index(axis)
    tab, tab_sh = ((ring.ipsi, ring.ipsi_sh) if inverse
                   else (ring.psi, ring.psi_sh))
    A, B = _local_gather_idx(chunk, C)
    idx = jnp.asarray(A) + d.astype(jnp.int32) * jnp.asarray(B)
    loc = jnp.take(tab, idx, axis=-1)
    loc_sh = jnp.take(tab_sh, idx, axis=-1)
    q = ring.q

    def cross(a, k):
        if inverse:
            dist, base, shift = 1 << k, C >> (k + 1), k + 1
            ubit = k
        else:
            dist, base, shift = C >> (k + 1), 1 << k, logc - k
            ubit = logc - k - 1
        sidx = base + (d >> shift)
        s = jnp.take(tab, sidx, axis=-1)
        s_sh = jnp.take(tab_sh, sidx, axis=-1)
        is_u = ((d >> ubit) & 1) == 0
        recv = jax.lax.ppermute(a, axis, [(i, i ^ dist) for i in range(C)])
        return _cross_stage(a, recv, s, s_sh, is_u, q, inverse=inverse)

    if inverse:
        a = _gs_local(a, loc, loc_sh, q)
        for k in range(logc):
            a = cross(a, k)
        return mm.shoup_mul(a, ring.ninv[:, None], ring.ninv_sh[:, None],
                            q[:, None])
    for k in range(logc):
        a = cross(a, k)
    return _ct_local(a, loc, loc_sh, q)


# ----------------------------------------------------------------------------
# public API
# ----------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _sharded_fn(mesh: Mesh, axis: str, la, inverse: bool, logc: int,
                nbatch: int):
    """jitted SPMD NTT program (eager shard_map would dispatch each
    butterfly through the SPMD machinery one op at a time)."""
    C = 1 << logc
    spec_x = P(*([None] * nbatch + [la, axis]))
    perms = []
    for k in range(logc):
        dist = (1 << k) if inverse else (C >> (k + 1))
        perms.append([(i, i ^ dist) for i in range(C)])

    def body(a, loc, loc_sh, cs, cs_sh, is_u, q, ninv, ninv_sh):
        # shapes in-body: a (..., L_loc, chunk); loc (1, L_loc, chunk);
        # cs (1, logc, L_loc); is_u (1, logc); q/ninv (L_loc,)
        if inverse:
            a = _gs_local(a, loc[0], loc_sh[0], q)
            for k in range(logc):
                recv = jax.lax.ppermute(a, axis, perms[k])
                a = _cross_stage(a, recv, cs[0, k], cs_sh[0, k],
                                 is_u[0, k], q, inverse=True)
            return mm.shoup_mul(a, ninv[:, None], ninv_sh[:, None],
                                q[:, None])
        for k in range(logc):
            recv = jax.lax.ppermute(a, axis, perms[k])
            a = _cross_stage(a, recv, cs[0, k], cs_sh[0, k], is_u[0, k],
                             q, inverse=False)
        return _ct_local(a, loc[0], loc_sh[0], q)

    return jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(spec_x, P(axis, la, None), P(axis, la, None),
                  P(axis, None, la), P(axis, None, la), P(axis, None),
                  P(la), P(la), P(la)),
        out_specs=spec_x))


def ntt_sharded(ring: Ring, x: jax.Array, mesh: Mesh, axis: str = "coeff",
                inverse: bool = False, limb_axis=None) -> jax.Array:
    """NTT/iNTT of (..., L, N) with the coefficient axis sharded over
    `mesh` axis `axis` (and optionally the limb axis over `limb_axis`);
    bit-identical to ring.ntt / ring.intt.

    The result is sharded (..., limb_axis, axis); inputs may be
    replicated or already sharded — GSPMD reshards as needed.
    """
    C = mesh.shape[axis]
    logc = C.bit_length() - 1
    assert (1 << logc) == C, "device axis must be a power of two"
    tabs = _tables(ring, C)
    loc, loc_sh = ((tabs["inv_loc"], tabs["inv_loc_sh"]) if inverse
                   else (tabs["fwd_loc"], tabs["fwd_loc_sh"]))
    cs, cs_sh, is_u = tabs["inv_cross" if inverse else "fwd_cross"]

    fn = _sharded_fn(mesh, axis, limb_axis, inverse, logc, x.ndim - 2)
    return fn(x, jnp.asarray(loc), jnp.asarray(loc_sh), jnp.asarray(cs),
              jnp.asarray(cs_sh), jnp.asarray(is_u), ring.q, ring.ninv,
              ring.ninv_sh)
