"""Multi-key CKKS parameters (TPU rebuild of mkckks/params.go).

Parameter presets mirror the reference's test literals
(mkckks/mkckks_test.go:51-91, cnn/cnn_test.go:80-97) at the same ring
degree, slot count, scale, and total modulus bit-size — but with uint32 RNS
limbs: each of the reference's 47-60-bit primes becomes a pair of 23-30-bit
primes, and Rescale drops a pair per level. Security is governed by
(N, logQP), both preserved; noise behaviour matches because scales and
level budgets are identical.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

from .. import mkrlwe
from ..ops.primes import ntt_primes


@dataclasses.dataclass(frozen=True)
class Parameters:
    rlwe: mkrlwe.Parameters
    logslots: int
    scale: float

    @property
    def logn(self) -> int:
        return self.rlwe.logn

    @property
    def n(self) -> int:
        return self.rlwe.n

    @property
    def slots(self) -> int:
        return 1 << self.logslots

    @property
    def max_level(self) -> int:
        return self.rlwe.max_level

    def add_crs(self, idx: int) -> "Parameters":
        return dataclasses.replace(self, rlwe=mkrlwe.add_crs(self.rlwe, idx))


def _distinct(*groups):
    seen = set()
    for g in groups:
        for q in g:
            if q in seen:
                raise ValueError("prime collision across groups")
            seen.add(q)


def select_moduli(logn: int, q0_bits: float, level_bits: float,
                  levels: int, q0_count: int = 2,
                  limbs_per_level: int = 2, p_bits: float = 28.4,
                  p_count: int = 2):
    """The prime-selection half of new_parameters: returns
    (q_moduli, p_moduli) without building rings/CRS (used by fast
    security-budget tests and tooling)."""
    q0 = ntt_primes(logn, q0_bits, q0_count)
    if limbs_per_level == 2:
        # Balance each level's prime pair so its product stays ~scale:
        # NTT-friendly primes are k*2N+1, so a single prime can sit far
        # from target; choosing pairs from an oversized pool keeps each
        # level's product within ~1e-4 of 2^(2*level_bits), so Rescale's
        # scale tracking stays tight (the reference's 47-60-bit primes
        # are near-target for free).
        pool = list(ntt_primes(logn, level_bits,
                               4 * levels * limbs_per_level + 16))
        target = 2.0 ** (2 * level_bits)
        pairs = []
        for _ in range(levels):
            best = None
            for i in range(len(pool)):
                for j in range(i + 1, len(pool)):
                    err = abs(pool[i] * pool[j] / target - 1.0)
                    if best is None or err < best[0]:
                        best = (err, i, j)
            _, i, j = best
            pairs.append((pool[i], pool[j]))
            pool = [p for k, p in enumerate(pool) if k not in (i, j)]
        lv = tuple(p for pair in pairs for p in pair)
    else:
        lv = ntt_primes(logn, level_bits, levels * limbs_per_level)
    # avoid collisions when size classes coincide: skip past earlier draws
    skip = 0
    if abs(p_bits - level_bits) < 0.3:
        skip += (4 * levels * limbs_per_level + 16
                 if limbs_per_level == 2 else levels * limbs_per_level)
    if abs(p_bits - q0_bits) < 0.3:
        skip += q0_count
    p = ntt_primes(logn, p_bits, p_count, skip=skip)
    _distinct(q0, lv, p)
    return tuple(q0) + tuple(lv), tuple(p)


def new_parameters(logn: int, logslots: int, q0_bits: float,
                   level_bits: float, levels: int, scale: float,
                   gamma: int = 2, q0_count: int = 2,
                   limbs_per_level: int = 2,
                   p_bits: float = 28.4, p_count: int = 2,
                   unsafe_skip_noise_guard: bool = False) -> Parameters:
    """Build a CKKS parameter set: q0_count primes ~q0_bits for the base
    modulus, `levels` rescaling levels of limbs_per_level primes each
    (their product ~ scale), and p_count special primes.

    With p_count=4 half-width P primes and gamma=2, the gadget digit spans
    alpha=2 limbs (~a reference-width digit) — the faithful analog of the
    reference's PCount=2 full-width configuration, and half the digit
    count of p_count=2."""
    q_moduli, p = select_moduli(logn, q0_bits, level_bits, levels,
                                q0_count, limbs_per_level, p_bits,
                                p_count)
    rl = mkrlwe.new_parameters(
        logn, q_moduli, p, gamma=gamma,
        unsafe_skip_noise_guard=unsafe_skip_noise_guard)
    return Parameters(rlwe=rl, logslots=logslots, scale=scale)


def from_literal(doc) -> Parameters:
    """Build Parameters from a reference-style ParametersLiteral JSON
    document (the schema of the reference's `-params` test flag,
    mkrlwe/mkrlwe_test.go:18,56-60 / ckks.ParametersLiteral):

        {"LogN": 14, "LogSlots": 13, "Q": [primes...], "P": [primes...],
         "Scale": 2^52, "Gamma": 2}

    Q/P entries may be ints, hex strings, or bit-sizes (floats < 64). Each
    64-bit modulus maps to a pair of ~half-width uint32 NTT primes whose
    product is within ~1e-3 of it (a triple for moduli over ~57.8 bits:
    uint32 limbs are capped at 2^29, see ops/modmath.py); total modulus
    size, scale, and level budget are preserved, which is what governs
    security and noise.
    """
    import json
    import math

    if isinstance(doc, str):
        with open(doc) as f:
            doc = json.load(f)
    logn = int(doc["LogN"])
    logslots = int(doc.get("LogSlots", logn - 1))
    scale = float(doc.get("Scale", 2.0 ** 40))
    gamma = int(doc.get("Gamma", 2))

    def bits_of(entry) -> float:
        if isinstance(entry, str):
            return math.log2(int(entry, 0))
        if isinstance(entry, float) and entry < 64:
            return entry
        return math.log2(int(entry))

    q_bits = [bits_of(e) for e in doc["Q"]]
    p_bits = [bits_of(e) for e in doc["P"]]

    used = set()

    def split(bits: float, parts: int) -> Tuple[int, ...]:
        """Pick `parts` distinct u32 NTT primes with product ~ 2^bits."""
        per = bits / parts
        pool = [p for p in ntt_primes(logn, per, 24 + 2 * parts)
                if p not in used]
        target = 2.0 ** bits
        if parts == 1:
            best = min(pool, key=lambda p: abs(p / target - 1.0))
            used.add(best)
            return (best,)
        best = None
        for i in range(len(pool)):
            for j in range(i + 1, len(pool)):
                base = pool[i] * pool[j]
                if parts == 2:
                    err = abs(base / target - 1.0)
                    if best is None or err < best[0]:
                        best = (err, (pool[i], pool[j]))
                else:
                    for k in range(j + 1, len(pool)):
                        err = abs(base * pool[k] / target - 1.0)
                        if best is None or err < best[0]:
                            best = (err, (pool[i], pool[j], pool[k]))
        used.update(best[1])
        return best[1]

    def to_limbs(bits_list):
        out = []
        for b in bits_list:
            parts = 1 if b <= 28.9 else (2 if b <= 57.8 else 3)
            out.extend(split(b, parts))
        return tuple(out)

    q_moduli = to_limbs(q_bits)
    p_moduli = to_limbs(p_bits)
    rl = mkrlwe.new_parameters(logn, q_moduli, p_moduli, gamma=gamma)
    return Parameters(rlwe=rl, logslots=logslots, scale=scale)


# -- presets (equivalents of the reference parameter sets) -------------------

@functools.lru_cache(maxsize=None)
def PN15QP880() -> Parameters:
    """logN=15, 14 levels: q0 ~58b + 13 x ~54b (27b pairs), P ~57b,
    scale 2^54 (reference: mkckks/mkckks_test.go:51-72)."""
    return new_parameters(15, 14, q0_bits=28.9, level_bits=27.0, levels=13,
                          scale=2.0 ** 54, p_bits=28.4, p_count=4)


@functools.lru_cache(maxsize=None)
def PN14QP439() -> Parameters:
    """logN=14, q0 ~58b + 5 x ~52b (26b pairs), scale 2^52
    (reference: mkckks/mkckks_test.go:73-91)."""
    return new_parameters(14, 13, q0_bits=28.9, level_bits=26.0, levels=5,
                          scale=2.0 ** 52, p_bits=28.4, p_count=4)


@functools.lru_cache(maxsize=None)
def PN14QP433_CNN() -> Parameters:
    """logN=14, q0 ~57b + 6 x ~47b (23.5b pairs), scale 2^47
    (reference: cnn/cnn_test.go:80-97)."""
    return new_parameters(14, 13, q0_bits=28.4, level_bits=23.5, levels=6,
                          scale=2.0 ** 47, p_bits=23.5, p_count=4)
