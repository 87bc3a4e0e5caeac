"""RNS negacyclic polynomial ring Z_q[X]/(X^N+1) on uint32 limbs.

This is the TPU-native rebuild of the reference's L0 substrate (lattigo
`ring.Ring`: NTT/InvNTT with precomputed psi tables, Montgomery pointwise
ops, automorphisms — see SURVEY.md §1 L0 and §2.2). Polynomials are dense
uint32 arrays of shape (..., L, N): limbs on the sublane axis, coefficients
on the lane axis. Every op is batched over leading axes (party, digit, ...).

NTT uses the classic Cooley-Tukey (forward, standard -> bit-reversed order)
and Gentleman-Sande (inverse) butterflies with Shoup-precomputed twiddles;
all polynomials in "NTT domain" throughout the framework are in bit-reversed
evaluation order, slot j holding the evaluation at psi^(2*brv(j)+1).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import modmath as mm
from .primes import primitive_root_2n, bit_reverse

U32 = jnp.uint32


def _pow_seq(base: int, n: int, q: int) -> "np.ndarray":
    """[base^0, ..., base^(n-1)] mod q as uint64 (q < 2^32): log(n)
    vectorized doubling steps instead of an n-step python loop — products
    are < 2^32 * 2^32 and stay exact in u64."""
    out = np.ones(n, np.uint64)
    qq = np.uint64(q)
    m = 1
    while m < n:
        step = np.uint64(pow(int(base), m, int(q)))
        hi = min(2 * m, n)
        out[m:hi] = (out[:hi - m] * step) % qq
        m = hi
    return out


def _shoup_vec(v: "np.ndarray", q: int) -> "np.ndarray":
    """floor(v * 2^32 / q) for canonical v (< q < 2^32), exact in u64."""
    return ((v.astype(np.uint64) << np.uint64(32)) // np.uint64(q)
            ).astype(np.uint32)


def _brv_vec(logn: int) -> "np.ndarray":
    n = 1 << logn
    j = np.arange(n, dtype=np.uint32)
    r = np.zeros_like(j)
    for t in range(logn):
        r = (r << np.uint32(1)) | ((j >> np.uint32(t)) & np.uint32(1))
    return r.astype(np.int64)


def _host_tables(moduli: Tuple[int, ...], logn: int):
    """Build all per-limb constant tables (vectorized numpy u64: a PN15
    32-limb ring builds in <1 s; the r1-r3 python-int loops took ~50 s,
    dominating every test module's startup)."""
    n = 1 << logn
    L = len(moduli)
    q = np.array(moduli, dtype=np.uint32)
    qinv_neg = np.empty(L, np.uint32)
    r2 = np.empty(L, np.uint32)
    bar = np.empty(L, np.uint32)
    psi = np.empty((L, n), np.uint32)
    psi_sh = np.empty((L, n), np.uint32)
    ipsi = np.empty((L, n), np.uint32)
    ipsi_sh = np.empty((L, n), np.uint32)
    ninv = np.empty(L, np.uint32)
    ninv_sh = np.empty(L, np.uint32)
    # stage-packed tiled twiddles for the Pallas DIF/DIT kernels:
    #   fwd stage s (s=1..logn): pattern[j'] = omega^(2^(s-1) * j'), j' < N/2^s
    # packed consecutively; inverse uses omega^{-...}; twist = psi^j,
    # untwist = psi^{-j} / N.
    wpack = np.zeros((L, n), np.uint32)
    wpack_sh = np.zeros((L, n), np.uint32)
    iwpack = np.zeros((L, n), np.uint32)
    iwpack_sh = np.zeros((L, n), np.uint32)
    twist = np.empty((L, n), np.uint32)
    twist_sh = np.empty((L, n), np.uint32)
    untwist = np.empty((L, n), np.uint32)
    untwist_sh = np.empty((L, n), np.uint32)
    brv = _brv_vec(logn)
    for i, qi in enumerate(moduli):
        qinv_neg[i], r2[i] = mm.mont_constants(qi)
        bar[i] = mm.barrett_constant(qi)
        root = primitive_root_2n(qi, logn)
        iroot = pow(root, -1, qi)
        # Psi[j] = psi^brv(j), IPsi[j] = psi^{-brv(j)}
        fwd = _pow_seq(root, n, qi)
        inv = _pow_seq(iroot, n, qi)
        psi[i] = fwd[brv].astype(np.uint32)
        ipsi[i] = inv[brv].astype(np.uint32)
        psi_sh[i] = _shoup_vec(psi[i], qi)
        ipsi_sh[i] = _shoup_vec(ipsi[i], qi)
        nv = pow(n, -1, qi)
        ninv[i] = nv
        ninv_sh[i] = (nv << 32) // qi
        omega = root * root % qi
        iomega = pow(omega, -1, qi)
        off = 0
        for s_ in range(1, logn + 1):
            h = n >> s_
            stride = 1 << (s_ - 1)
            wpack[i, off:off + h] = _pow_seq(
                pow(omega, stride, qi), h, qi).astype(np.uint32)
            iwpack[i, off:off + h] = _pow_seq(
                pow(iomega, stride, qi), h, qi).astype(np.uint32)
            off += h
        wpack_sh[i] = _shoup_vec(wpack[i], qi)
        iwpack_sh[i] = _shoup_vec(iwpack[i], qi)
        twist[i] = fwd.astype(np.uint32)
        untwist[i] = ((inv * np.uint64(nv)) % np.uint64(qi)
                      ).astype(np.uint32)
        twist_sh[i] = _shoup_vec(twist[i], qi)
        untwist_sh[i] = _shoup_vec(untwist[i], qi)
    tail_fwd, tail_inv, tail_pow = _tail_matrices(
        moduli, logn, wpack, iwpack)
    return dict(q=q, qinv_neg=qinv_neg, r2=r2, bar=bar, psi=psi,
                psi_sh=psi_sh, ipsi=ipsi, ipsi_sh=ipsi_sh, ninv=ninv,
                ninv_sh=ninv_sh, wpack=wpack, wpack_sh=wpack_sh,
                iwpack=iwpack, iwpack_sh=iwpack_sh, twist=twist,
                twist_sh=twist_sh, untwist=untwist,
                untwist_sh=untwist_sh, tail_fwd=tail_fwd,
                tail_inv=tail_inv, tail_pow=tail_pow)


TAIL_LANES = 128  # butterflies with half-block h < TAIL_LANES are the
#                   "tail": they stay within one 128-lane block and their
#                   twiddle patterns are block-periodic, so their
#                   composition is one fixed 128x128 linear map over Z_q
#                   per limb — the Pallas kernels run it on the MXU as
#                   int8-digit matmuls instead of 7 lane-roll VPU stages.


TAIL_DIGITS = 5      # base-2^7 digit planes: values 0..127 fit int8
TAIL_DIGIT_BITS = 7  # exactly (no balanced-digit corrections), the MXU's
#                      native s8xs8->s32 path; 5*7 = 35 bits covers any
#                      u32 input exactly.


def _tail_matrices(moduli, logn: int, wpack: np.ndarray,
                   iwpack: np.ndarray):
    """Per-limb 128x128 tail maps as base-2^7 int8 digit planes (for the
    MXU's s8 x s8 -> s32 path), plus recombination constants
    2^(7t) * 2^32 mod q for t = 0..2*(TAIL_DIGITS-1).

    tail_fwd[i] composes the forward DIF stages with h = 64..1 (exact
    simulation of ops/ntt_pallas._fwd_kernel's arithmetic over Z_q);
    tail_inv[i] the inverse DIT stages h = 1..64. Layout: out = x @ M
    (rows of x are 128-lane blocks).
    """
    n = 1 << logn
    L = len(moduli)
    lanes = min(TAIL_LANES, n)
    nd = TAIL_DIGITS
    # stage offsets into the packed twiddle tables
    offs = {}
    off = 0
    for s in range(1, logn + 1):
        offs[n >> s] = off
        off += n >> s
    lane = np.arange(lanes)
    mask = np.uint64((1 << TAIL_DIGIT_BITS) - 1)
    tail_fwd = np.empty((L, nd, lanes, lanes), np.int8)
    tail_inv = np.empty((L, nd, lanes, lanes), np.int8)
    tail_pow = np.empty((L, 2 * nd - 1), np.uint32)
    for i, qi in enumerate(moduli):
        q = np.uint64(qi)
        # forward: DIF stages h = lanes/2 .. 1
        M = np.eye(lanes, dtype=np.uint64)
        h = lanes // 2
        while h >= 1:
            first = (lane & h) == 0
            tw = (np.tile(wpack[i, offs[h]:offs[h] + h], lanes // h)
                  .astype(np.uint64) if h > 1 else np.ones(lanes, np.uint64))
            p = np.roll(M, -h, axis=1)
            mn = np.roll(M, h, axis=1)
            top = (M + p) % q
            bot = ((mn + q - M) % q) * tw[None, :] % q
            M = np.where(first[None, :], top, bot)
            h //= 2
        for k in range(nd):
            tail_fwd[i, k] = ((M >> np.uint64(TAIL_DIGIT_BITS * k))
                              & mask).astype(np.int8)
        # inverse: DIT stages h = 1 .. lanes/2
        M = np.eye(lanes, dtype=np.uint64)
        h = 1
        while h < lanes:
            first = (lane & h) == 0
            tw = (np.tile(iwpack[i, offs[h]:offs[h] + h], lanes // h)
                  .astype(np.uint64) if h > 1 else np.ones(lanes, np.uint64))
            p = np.roll(M, -h, axis=1)
            mn = np.roll(M, h, axis=1)
            operand = np.where(first[None, :], p, M)
            v = operand * tw[None, :] % q
            top = (M + v) % q
            bot = (mn + q - v) % q
            M = np.where(first[None, :], top, bot)
            h *= 2
        for k in range(nd):
            tail_inv[i, k] = ((M >> np.uint64(TAIL_DIGIT_BITS * k))
                              & mask).astype(np.int8)
        for t in range(2 * nd - 1):
            tail_pow[i, t] = ((1 << (TAIL_DIGIT_BITS * t + 32)) % qi)
    return tail_fwd, tail_inv, tail_pow


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["q", "qinv_neg", "r2", "bar", "psi", "psi_sh", "ipsi",
                 "ipsi_sh", "ninv", "ninv_sh", "wpack", "wpack_sh",
                 "iwpack", "iwpack_sh", "twist", "twist_sh", "untwist",
                 "untwist_sh", "tail_fwd", "tail_inv", "tail_pow"],
    meta_fields=["moduli", "logn", "dist"],
)
@dataclasses.dataclass(frozen=True)
class Ring:
    """An RNS ring over a tuple of uint32 NTT-friendly primes.

    All array members have leading limb axis L == len(moduli); constants are
    shape (L,), NTT tables (L, N). A Ring is a jax pytree: it can be passed
    through jit, with (moduli, logn, dist) as static metadata.

    `dist` — when set to (axis_name, n_devices), ntt/intt assume they are
    called inside a shard_map body whose coefficient axis is chunk-sharded
    over that mesh axis, and run the hypercube cross-device butterfly
    stages with ppermute (parallel/dist_ntt.py). Being jit-key metadata,
    the distributed and local variants can never collide in a trace cache
    (unlike the round-1 global-flag dispatch — see ADVICE.md r1).
    """
    moduli: Tuple[int, ...]
    logn: int
    q: jax.Array
    qinv_neg: jax.Array
    r2: jax.Array
    bar: jax.Array
    psi: jax.Array
    psi_sh: jax.Array
    ipsi: jax.Array
    ipsi_sh: jax.Array
    ninv: jax.Array
    ninv_sh: jax.Array
    wpack: jax.Array
    wpack_sh: jax.Array
    iwpack: jax.Array
    iwpack_sh: jax.Array
    twist: jax.Array
    twist_sh: jax.Array
    untwist: jax.Array
    untwist_sh: jax.Array
    tail_fwd: jax.Array   # (L, 4, 128, 128) uint8 digit planes (MXU tail)
    tail_inv: jax.Array   # (L, 4, 128, 128) uint8
    tail_pow: jax.Array   # (L, 7) 2^(8t)*2^32 mod q (recombination)
    dist: Tuple[str, int] | None = None

    # -- construction -------------------------------------------------------

    @staticmethod
    @functools.lru_cache(maxsize=None)
    def create(moduli: Tuple[int, ...], logn: int) -> "Ring":
        t = _host_tables(tuple(moduli), logn)
        return Ring(moduli=tuple(moduli), logn=logn,
                    **{k: jnp.asarray(v) for k, v in t.items()})

    @property
    def n(self) -> int:
        return 1 << self.logn

    @property
    def nlimbs(self) -> int:
        return len(self.moduli)

    def with_dist(self, axis: str | None, n_devices: int = 0) -> "Ring":
        """Copy of this ring whose ntt/intt run coefficient-sharded over
        mesh axis `axis` (must be called inside a matching shard_map body);
        with_dist(None) returns the local-NTT ring."""
        dist = None if axis is None else (axis, n_devices)
        return dataclasses.replace(self, dist=dist)

    def take(self, lo: int, hi: int) -> "Ring":
        """Sub-ring over moduli[lo:hi] (cheap jnp slices; jit-safe)."""
        return Ring(moduli=self.moduli[lo:hi], logn=self.logn,
                    dist=self.dist,
                    q=self.q[lo:hi], qinv_neg=self.qinv_neg[lo:hi],
                    r2=self.r2[lo:hi], bar=self.bar[lo:hi],
                    psi=self.psi[lo:hi], psi_sh=self.psi_sh[lo:hi],
                    ipsi=self.ipsi[lo:hi], ipsi_sh=self.ipsi_sh[lo:hi],
                    ninv=self.ninv[lo:hi], ninv_sh=self.ninv_sh[lo:hi],
                    wpack=self.wpack[lo:hi], wpack_sh=self.wpack_sh[lo:hi], iwpack=self.iwpack[lo:hi], iwpack_sh=self.iwpack_sh[lo:hi], twist=self.twist[lo:hi], twist_sh=self.twist_sh[lo:hi], untwist=self.untwist[lo:hi], untwist_sh=self.untwist_sh[lo:hi], tail_fwd=self.tail_fwd[lo:hi], tail_inv=self.tail_inv[lo:hi], tail_pow=self.tail_pow[lo:hi])

    def concat(self, other: "Ring") -> "Ring":
        """Ring over moduli ++ other.moduli (the QP ring trick: since every
        op is limb-wise, Q and P parts ride through one batched call)."""
        assert self.logn == other.logn
        assert self.dist == other.dist or other.dist is None
        cat = lambda a, b: jnp.concatenate([a, b], axis=0)
        return Ring(moduli=self.moduli + other.moduli, logn=self.logn,
                    dist=self.dist,
                    q=cat(self.q, other.q),
                    qinv_neg=cat(self.qinv_neg, other.qinv_neg),
                    r2=cat(self.r2, other.r2), bar=cat(self.bar, other.bar),
                    psi=cat(self.psi, other.psi),
                    psi_sh=cat(self.psi_sh, other.psi_sh),
                    ipsi=cat(self.ipsi, other.ipsi),
                    ipsi_sh=cat(self.ipsi_sh, other.ipsi_sh),
                    ninv=cat(self.ninv, other.ninv),
                    ninv_sh=cat(self.ninv_sh, other.ninv_sh),
                    wpack=cat(self.wpack, other.wpack), wpack_sh=cat(self.wpack_sh, other.wpack_sh), iwpack=cat(self.iwpack, other.iwpack), iwpack_sh=cat(self.iwpack_sh, other.iwpack_sh), twist=cat(self.twist, other.twist), twist_sh=cat(self.twist_sh, other.twist_sh), untwist=cat(self.untwist, other.untwist), untwist_sh=cat(self.untwist_sh, other.untwist_sh), tail_fwd=cat(self.tail_fwd, other.tail_fwd), tail_inv=cat(self.tail_inv, other.tail_inv), tail_pow=cat(self.tail_pow, other.tail_pow))

    # -- broadcast helpers --------------------------------------------------

    def _c(self, arr):
        """Reshape a (L,) constant for broadcasting against (..., L, N)."""
        return arr[:, None]

    # -- pointwise ops (all accept (..., L, N), canonical in [0, q)) --------

    def zero(self, *batch) -> jax.Array:
        return jnp.zeros((*batch, self.nlimbs, self.n), U32)

    def add(self, a, b):
        return mm.add_mod(a, b, self._c(self.q))

    def sub(self, a, b):
        return mm.sub_mod(a, b, self._c(self.q))

    def neg(self, a):
        return mm.neg_mod(a, self._c(self.q))

    def reduce(self, a):
        """Barrett-reduce arbitrary u32 values to canonical [0, q)."""
        return mm.barrett_reduce(a, self._c(self.q), self._c(self.bar))

    def mul_mont(self, a, b):
        """a * b * 2^-32 mod q; b in Montgomery form (key material)."""
        return mm.mont_mul(a, b, self._c(self.q), self._c(self.qinv_neg))

    def to_mont(self, a):
        return mm.to_mont(a, self._c(self.q), self._c(self.qinv_neg),
                          self._c(self.r2))

    def from_mont(self, a):
        return mm.from_mont(a, self._c(self.q), self._c(self.qinv_neg))

    def mul_scalar_mont(self, a, s_mont):
        """Multiply by per-limb scalars in Montgomery form, shape (L,)."""
        return mm.mont_mul(a, self._c(s_mont), self._c(self.q),
                           self._c(self.qinv_neg))

    # -- NTT ----------------------------------------------------------------

    def ntt(self, a, reduce_input: bool = False):
        """Forward negacyclic NTT, batched over (..., L, N).

        Input standard coefficient order, output bit-reversed evaluation
        order. If reduce_input, inputs may be any u32 (lazy) and are
        Barrett-reduced first. On TPU this dispatches to the fused Pallas
        kernel (ops/ntt_pallas.py), bit-identical to the jnp path below.
        """
        if self.dist is not None:
            from ..parallel import dist_ntt
            return dist_ntt.ntt_in_shard(self, a, *self.dist,
                                         inverse=False,
                                         reduce_input=reduce_input)
        from .. import config
        if config.pallas_ntt_enabled(self.logn):
            from . import ntt_pallas
            return ntt_pallas.ntt_batched(self, a, inverse=False,
                                          reduce_input=reduce_input)
        if reduce_input:
            a = self.reduce(a)
        n = self.n
        q = self._c(self.q)
        batch = a.shape[:-2]
        L = a.shape[-2]
        t = n
        m = 1
        while m < n:
            t //= 2
            x = a.reshape(*batch, L, m, 2, t)
            u = x[..., 0, :]
            v = x[..., 1, :]
            s = self.psi[:, m:2 * m].reshape(L, m, 1)
            s_sh = self.psi_sh[:, m:2 * m].reshape(L, m, 1)
            qq = q[..., None]
            vs = mm.shoup_mul(v, s, s_sh, qq)
            a = jnp.stack([mm.add_mod(u, vs, qq), mm.sub_mod(u, vs, qq)],
                          axis=-2).reshape(*batch, L, n)
            m *= 2
        return a

    def intt(self, a, reduce_input: bool = False):
        """Inverse negacyclic NTT (bit-reversed in, standard out).

        reduce_input: inputs may be LAZY in [0, 8q) — the bound every
        lazy producer in the keyswitch pipeline guarantees (see
        _sum_parties_ntt's n_prod <= 56 gate). The Pallas kernel absorbs
        them with one csub (ntt_pallas._inv_kernel); this jnp path
        Barrett-reduces (a superset of the contract), so outputs are
        identical either way (both end canonical, exact mod q)."""
        if self.dist is not None:
            from ..parallel import dist_ntt
            return dist_ntt.ntt_in_shard(self, a, *self.dist,
                                         inverse=True,
                                         reduce_input=reduce_input)
        from .. import config
        if config.pallas_ntt_enabled(self.logn):
            from . import ntt_pallas
            return ntt_pallas.ntt_batched(self, a, inverse=True,
                                          reduce_input=reduce_input)
        if reduce_input:
            a = self.reduce(a)
        n = self.n
        q = self._c(self.q)
        batch = a.shape[:-2]
        L = a.shape[-2]
        t = 1
        m = n
        while m > 1:
            h = m // 2
            x = a.reshape(*batch, L, h, 2, t)
            u = x[..., 0, :]
            v = x[..., 1, :]
            s = self.ipsi[:, h:2 * h].reshape(L, h, 1)
            s_sh = self.ipsi_sh[:, h:2 * h].reshape(L, h, 1)
            qq = q[..., None]
            a = jnp.stack(
                [mm.add_mod(u, v, qq),
                 mm.shoup_mul(mm.sub_mod(u, v, qq), s, s_sh, qq)],
                axis=-2).reshape(*batch, L, n)
            t *= 2
            m = h
        return mm.shoup_mul(a, self._c(self.ninv), self._c(self.ninv_sh), q)

    # -- automorphisms ------------------------------------------------------

    def permute_coeffs(self, a, gal: int):
        """Apply X -> X^gal to coefficient-domain polys (..., L, N)."""
        src, sign = _coeff_perm_host(self.logn, gal)
        g = jnp.take(a, src, axis=-1)
        return jnp.where(sign[None, :] == 1,
                         mm.neg_mod(g, self._c(self.q)), g)

    def permute_ntt(self, a, gal: int):
        """Apply X -> X^gal to NTT-domain polys (pure gather, no signs)."""
        pi = _ntt_perm_host(self.logn, gal)
        return jnp.take(a, pi, axis=-1)


@functools.lru_cache(maxsize=None)
def _coeff_perm_host(logn: int, gal: int):
    """Coefficient-domain Galois map X -> X^gal: returns (src_idx, sign)
    arrays such that out[j] = (-1)^sign[j] * in[src_idx[j]].

    Mirrors the inline permutation with sign fold in the reference's Rotate
    (mkrlwe/keyswitch.go:266-296), as a precomputed gather.
    """
    n = 1 << logn
    src = np.empty(n, np.int32)
    sign = np.empty(n, np.uint32)
    for i in range(n):
        raw = i * gal
        j = raw & (n - 1)
        src[j] = i
        sign[j] = (raw >> logn) & 1
    return src, sign  # numpy: safe to cache across traces


@functools.lru_cache(maxsize=None)
def _ntt_perm_host(logn: int, gal: int):
    """NTT-domain (bit-reversed order) permutation for X -> X^gal:
    out[j] = in[pi[j]]. Equivalent of lattigo ring.PermuteNTTIndex used at
    mkrlwe/keygen.go:214-216."""
    n = 1 << logn
    brv = [bit_reverse(j, logn) for j in range(n)]
    inv_slot = {2 * brv[j] + 1: j for j in range(n)}
    pi = np.empty(n, np.int32)
    for j in range(n):
        e = 2 * brv[j] + 1
        pi[j] = inv_slot[(e * gal) % (2 * n)]
    return pi  # numpy: safe to cache across traces


def galois_element_rot(k: int, n: int) -> int:
    """Galois element for a rotation of the CKKS slots by k (generator 5),
    matching lattigo's GaloisElementForColumnRotationBy."""
    return pow(5, k, 2 * n)


def galois_element_conj(n: int) -> int:
    """Galois element for conjugation (row rotation): 2N - 1."""
    return 2 * n - 1
