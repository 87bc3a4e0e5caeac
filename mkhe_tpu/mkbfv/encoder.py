"""BFV integer slot encoder (equivalent of lattigo bfv.Encoder's
EncodeInt/DecodeInt used at mkbfv/encryptor.go:39, decryptor.go:54).

Slots live in the NTT domain of the plaintext ring Z_t[X]/(X^N+1)
(T = 65537 is NTT-friendly for logN <= 15), using the same bit-reversed
rotation-group slot order as the rest of the framework, so BFV rotations
share the CKKS Galois machinery.

Encode: slots -> poly m mod t -> scale up to round(Q*m/t) mod each q_j
using q_j | Q:  round(Q*m/t) ≡ (h - s) * t^{-1} (mod q_j), with
h = t>>1 and s = (Q*m + h) mod t.
Decode: exact CRT -> round(t*c/Q) mod t -> forward NTT mod t -> slots.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ..utils import crt
from .params import Parameters


@functools.lru_cache(maxsize=None)
def _slot_order(logn: int):
    """Rotation-group slot order: value index c (col c, row 0) sits at the
    NTT slot evaluating at psi^(5^c); value N/2+c (row 1) at psi^(-5^c).
    Then the Galois element 5^k cycles columns and 2N-1 swaps rows —
    lattigo's BFV matrix slot layout."""
    from ..ops.primes import bit_reverse
    n = 1 << logn
    inv = {}
    for j in range(n):
        inv[2 * bit_reverse(j, logn) + 1] = j
    ordv = np.empty(n, np.int64)
    e = 1
    for c in range(n // 2):
        ordv[c] = inv[e]
        ordv[n // 2 + c] = inv[2 * n - e]
        e = (e * 5) % (2 * n)
    return ordv


@functools.lru_cache(maxsize=None)
def _scaleup_consts(q_moduli, t: int):
    Q = 1
    for q in q_moduli:
        Q *= q
    qmodt = Q % t
    tinv = np.array([pow(t % q, -1, q) for q in q_moduli], np.int64)
    return qmodt, tinv


def encode(params: Parameters, values) -> np.ndarray:
    """int64 slot values (N,) -> plaintext (Lq, N) uint32, scaled by Q/t."""
    t = params.t
    n = params.n
    vals = np.zeros(n, np.int64)
    v = np.asarray(values, np.int64)
    vals[:v.shape[0]] = np.mod(v, t)
    slots = np.empty(n, np.int64)
    slots[_slot_order(params.logn)] = vals
    # slots -> coefficients (inverse NTT mod t)
    ring_t = params.ring_t
    m = np.asarray(ring_t.intt(jnp.asarray(
        slots[None, :].astype(np.uint32))))[0].astype(np.int64)
    # scale up by Q/t rounded
    qmodt, tinv = _scaleup_consts(params.rlwe.q_moduli, t)
    h = t >> 1
    s = (qmodt * m + h) % t
    diff = h - s  # in (-t, t)
    out = np.empty((len(params.rlwe.q_moduli), n), np.uint32)
    for j, q in enumerate(params.rlwe.q_moduli):
        out[j] = ((diff % q) * int(tinv[j]) % q).astype(np.uint32)
    return out


def decode(params: Parameters, poly: np.ndarray) -> np.ndarray:
    """Decrypted (Lq, N) uint32 -> int64 slot values (N,), exact."""
    t = params.t
    moduli = params.rlwe.q_moduli[:poly.shape[0]]
    # m = round(t*c/Q) mod t — native C++ exact path when available
    from .. import native
    m = native.bfv_decode_scale(np.asarray(poly), moduli, t)
    if m is None:
        Q = 1
        for q in moduli:
            Q *= q
        c = crt.crt_reconstruct(poly, moduli)
        m = np.array([int((t * int(v) + Q // 2) // Q) % t for v in c],
                     dtype=np.uint32)
    ring_t = params.ring_t
    slots = np.asarray(ring_t.ntt(jnp.asarray(m[None, :])))[0]
    out = slots[_slot_order(params.logn)].astype(np.int64)
    # centered representatives
    return np.where(out > t // 2, out - t, out)
