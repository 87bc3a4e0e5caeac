"""Samplers for RLWE key material and encryption randomness.

Equivalents of the lattigo samplers the reference uses
(mkrlwe/keygen.go:35-37, mkrlwe/encryptor.go:48-50): uniform mod q_i,
ternary with P(0)=1/2, and a discrete gaussian sigma=3.2 truncated at
6*sigma, all driven by jax.random (threefry counter PRNG) so every key and
ciphertext is reproducible from a seed.
"""

from __future__ import annotations

import math
import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import modmath as mm
from .ring import Ring

U32 = jnp.uint32


def uniform(key, ring: Ring, *batch) -> jax.Array:
    """Uniform in [0, q_i) per limb, shape (*batch, L, N).

    Draws 64 bits per coefficient and reduces: v = (hi*2^32 + lo) mod q,
    giving bias < 2^-35 for 29-bit q (same regime as rejection-free
    sampling from a wide stream).
    """
    shape = (*batch, ring.nlimbs, ring.n)
    bits = jax.random.bits(key, (2, *shape), dtype=U32)
    hi, lo = bits[0], bits[1]
    q = ring.q[:, None]
    bar = ring.bar[:, None]
    # 2^32 mod q in shoup form per limb
    c = ((1 << 32)) % np.array(ring.moduli, dtype=np.uint64)
    c_sh = np.array([mm.shoup_host(int(ci), qi)
                     for ci, qi in zip(c, ring.moduli)], dtype=np.uint32)
    c = jnp.asarray(c.astype(np.uint32))[:, None]
    c_sh = jnp.asarray(c_sh)[:, None]
    hi_red = mm.barrett_reduce(hi, q, bar)
    t = mm.shoup_mul(hi_red, c, c_sh, q)
    return mm.add_mod(t, mm.barrett_reduce(lo, q, bar), q)


def lift_signed(vals, ring: Ring) -> jax.Array:
    """Lift small signed ints (..., N) int32 into RNS (..., L, N).

    Equivalent of lattigo's ExtendBasisSmallNormAndCenter
    (mkrlwe/keygen.go:51): v >= 0 -> v; v < 0 -> q_i + v.
    """
    v = vals[..., None, :]  # (..., 1, N)
    q = ring.q[:, None]
    return jnp.where(v < 0, q - (-v).astype(U32), v.astype(U32))


def ternary(key, n: int) -> jax.Array:
    """Ternary secret coefficients in {-1, 0, +1} with P(0) = 1/2,
    P(+1) = P(-1) = 1/4 (the reference's distribution: GenSecretKey ->
    GenSecretKeyWithDistrib(1.0/2), mkrlwe/keygen.go:58-60). int32 (n,)."""
    b = jax.random.bits(key, (n,), dtype=U32) & 3
    return jnp.where(b == 2, 1, jnp.where(b == 3, -1, 0)).astype(jnp.int32)


@functools.lru_cache(maxsize=None)
def _gaussian_cdt(sigma: float, bound: int):
    """Cumulative distribution table over [-bound, bound], thresholds
    scaled to uint32."""
    ks = np.arange(-bound, bound + 1)
    probs = np.exp(-(ks.astype(np.float64) ** 2) / (2 * sigma * sigma))
    probs /= probs.sum()
    cdf = np.cumsum(probs)
    thresholds = np.minimum((cdf * (2.0 ** 32)).astype(np.uint64),
                            (1 << 32) - 1).astype(np.uint32)
    return jnp.asarray(thresholds), jnp.asarray(ks.astype(np.int32))


def gaussian(key, n: int, sigma: float = 3.2, bound: int | None = None
             ) -> jax.Array:
    """Discrete gaussian via inverse-CDT, truncated at 6*sigma like the
    reference's sampler (mkrlwe/keygen.go:35). int32 (n,)."""
    if bound is None:
        bound = int(math.floor(6 * sigma))
    thresholds, ks = _gaussian_cdt(float(sigma), bound)
    u = jax.random.bits(key, (n,), dtype=U32)
    idx = jnp.searchsorted(thresholds, u, side="right")
    idx = jnp.minimum(idx, len(ks) - 1)
    return ks[idx]


def ternary_sparse(key, n: int, hw: int) -> jax.Array:
    """Exactly hw non-zero coefficients, each +-1 with equal probability
    (lattigo's NewTernarySamplerSparse used by GenSecretKeySparse,
    keygen.go:78-85). int32 (n,)."""
    import jax.numpy as jnp_
    k1, k2 = jax.random.split(key)
    perm = jax.random.permutation(k1, n)
    signs = jnp_.where(jax.random.bits(k2, (n,), dtype=U32) & 1, 1, -1)
    mask = (jnp_.argsort(perm) < hw).astype(jnp_.int32)
    return (signs * mask).astype(jnp_.int32)


def gaussian_rns(key, ring: Ring, *batch, sigma: float = 3.2) -> jax.Array:
    """Gaussian error lifted to RNS, shape (*batch, L, N)."""
    total = int(np.prod(batch)) if batch else 1
    e = gaussian(key, total * ring.n, sigma=sigma)
    return lift_signed(e.reshape(*batch, ring.n), ring)


def ternary_rns(key, ring: Ring, *batch) -> jax.Array:
    total = int(np.prod(batch)) if batch else 1
    t = ternary(key, total * ring.n)
    return lift_signed(t.reshape(*batch, ring.n), ring)
