"""Host-side prime generation for NTT-friendly RNS moduli.

The framework uses uint32 RNS limbs with primes q satisfying:
  - q ≡ 1 (mod 2N)  so the negacyclic NTT of degree N exists,
  - q < 2**29        so lazy Montgomery accumulation never overflows uint32
                     carry chains (see ops/modmath.py for the bounds).

The reference (SNUCP/MKHE-KKLSS) uses 47-60-bit primes, a 64-bit-CPU word
size choice (e.g. mkckks/mkckks_test.go:51-91); we keep the same ring degree
and total modulus bit-size so security and noise behaviour match, but split
into 32-bit-native limbs.
"""

from __future__ import annotations

import functools


def _is_prime(n: int) -> bool:
    """Deterministic Miller-Rabin for n < 3.3e24 (enough for < 2**64)."""
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d = n - 1
    r = 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x == 1 or x == n - 1:
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


@functools.lru_cache(maxsize=None)
def ntt_primes(logn: int, bits: float, count: int, skip: int = 0) -> tuple:
    """Generate `count` distinct primes q ≡ 1 (mod 2^(logn+1)), q ≈ 2**bits.

    Searches outward (alternating below/above 2**bits) so the product stays
    close to 2**(bits*count). `skip` skips the first `skip` matches, letting
    callers carve disjoint prime sets (Q vs QMul vs P) from one size class.
    """
    m = 1 << (logn + 1)  # need 2N | q-1 for the negacyclic NTT
    center = round(2.0**bits)
    # align center to k*m+1
    k0 = center // m
    found = []
    offset = 0
    while len(found) < count + skip:
        for k in ((k0 + offset), (k0 - offset)) if offset else (k0,):
            q = k * m + 1
            if q >= (1 << 29) or q < (1 << 20):
                continue
            if _is_prime(q):
                found.append(q)
                if len(found) >= count + skip:
                    break
        offset += 1
        if offset > (1 << 24):
            raise RuntimeError(
                f"not enough NTT primes near 2**{bits} for logN={logn}")
    primes = sorted(set(found))
    if len(primes) < count + skip:
        raise RuntimeError("duplicate primes generated")
    # preserve discovery order (closest to 2**bits first)
    out = []
    for q in found:
        if q not in out:
            out.append(q)
    return tuple(out[skip:skip + count])


def primitive_root_2n(q: int, logn: int) -> int:
    """Smallest-found primitive 2N-th root of unity psi mod q."""
    two_n = 1 << (logn + 1)
    assert (q - 1) % two_n == 0
    cofactor = (q - 1) // two_n
    g = 2
    while True:
        psi = pow(g, cofactor, q)
        # psi must have order exactly 2N: psi^N == -1 mod q
        if pow(psi, two_n // 2, q) == q - 1:
            return psi
        g += 1
        if g > 10000:
            raise RuntimeError("no primitive root found")


def bit_reverse(x: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r
