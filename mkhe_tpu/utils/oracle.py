"""u64 reference-oracle harness (cross-validation of the u32 redesign).

Builds and runs native/ref_oracle.cpp — a from-scratch u64 implementation
of the KKLSS keygen/encrypt/MulAndRelin/decrypt pipeline at the
reference's literal PN15QP880 prime lists (mkckks/mkckks_test.go:51-72) —
and decodes its output, so tests and bench.py can assert that the u32
limb-pair framework produces the same plaintexts with comparable noise on
identical messages (VERDICT r3 Missing #1).
"""

from __future__ import annotations

import functools
import hashlib
import json
import os
import subprocess
import tempfile
from typing import Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), os.pardir, "native",
                    "ref_oracle.cpp")


@functools.lru_cache(maxsize=1)
def oracle_binary() -> str | None:
    """Compile ref_oracle.cpp (cached next to the source; tmp-dir and
    None fallbacks mirror native/__init__.py).

    Staleness is detected by a SOURCE HASH stored next to the binary,
    not mtimes: git checkouts give source and binary identical mtimes,
    so an mtime check can silently run an outdated committed binary as
    the cross-validation ground truth (ADVICE r4 #5)."""
    src = os.path.abspath(_SRC)
    exe = os.path.join(os.path.dirname(src), "_ref_oracle")
    try:
        with open(src, "rb") as f:
            src_hash = hashlib.sha256(f.read()).hexdigest()
        hash_path = exe + ".sha256"
        try:
            with open(hash_path) as f:
                have = f.read().strip()
        except OSError:
            have = ""
        if not os.path.exists(exe) or have != src_hash:
            tmp = exe + f".build{os.getpid()}"
            subprocess.run(["g++", "-O3", "-std=c++17", "-o", tmp, src],
                           check=True, capture_output=True, timeout=180)
            os.replace(tmp, exe)
            with open(hash_path, "w") as f:
                f.write(src_hash)
        return exe
    except (OSError, subprocess.SubprocessError):
        try:
            tmpdir = tempfile.mkdtemp(prefix="mkhe_tpu_oracle_")
            exe = os.path.join(tmpdir, "_ref_oracle")
            subprocess.run(["g++", "-O3", "-std=c++17", "-o", exe, src],
                           check=True, capture_output=True, timeout=180)
            return exe
        except (OSError, subprocess.SubprocessError):
            return None


def run_oracle(config: str, seed: int, m0_coeffs: np.ndarray,
               m1_coeffs: np.ndarray) -> Tuple[Tuple[int, ...], np.ndarray]:
    """Run the u64 oracle: keygen -> encrypt(m0 under A), encrypt(m1
    under B) -> MulAndRelin -> exact decrypt. Returns (q_moduli,
    residues (Lq, N) uint64) of the decrypted plaintext."""
    exe = oracle_binary()
    if exe is None:
        raise RuntimeError("no C++ toolchain for the u64 oracle")
    with tempfile.TemporaryDirectory(prefix="mkhe_oracle_") as td:
        p0 = os.path.join(td, "m0.i64")
        p1 = os.path.join(td, "m1.i64")
        po = os.path.join(td, "out.bin")
        np.asarray(m0_coeffs, np.int64).tofile(p0)
        np.asarray(m1_coeffs, np.int64).tofile(p1)
        r = subprocess.run([exe, config, str(seed), p0, p1, po],
                           check=True, capture_output=True, timeout=600)
        info = json.loads(r.stdout.decode().strip().splitlines()[-1])
        with open(po, "rb") as f:
            hdr = np.fromfile(f, np.int32, 4)
            logn, lq, lp = int(hdr[0]), int(hdr[1]), int(hdr[2])
            qmod = np.fromfile(f, np.uint64, lq)
            np.fromfile(f, np.uint64, lp)  # p moduli (unused here)
            res = np.fromfile(f, np.uint64, lq * (1 << logn))
    assert info["lq"] == lq
    return tuple(int(q) for q in qmod), res.reshape(lq, 1 << logn)


def center_coeffs_u64(residues: np.ndarray, moduli: Tuple[int, ...]
                      ) -> np.ndarray:
    """Centered plaintext coefficients (float64) from u64 RNS residues.

    Vectorized 2-limb CRT over python ints (q0*q1 ~ 2^100+ overflows
    u64), exact while |value| < q0*q1/2, self-checked against the third
    limb; falls back to full big-int CRT on mismatch (same strategy as
    mkckks.encoder.decode)."""
    from . import crt

    q0, q1 = int(moduli[0]), int(moduli[1])
    qq = q0 * q1
    inv = pow(q0, -1, q1)
    x0 = residues[0].astype(object)
    x1 = residues[1].astype(object)
    k = ((x1 - x0) * inv) % q1
    val = x0 + q0 * k
    val = np.where(val > qq // 2, val - qq, val)
    if residues.shape[0] > 2:
        q2 = int(moduli[2])
        if not np.array_equal(val % q2,
                              residues[2].astype(object) % q2):
            centered = crt.crt_center(
                residues.astype(object), tuple(moduli))
            return np.array([float(v) for v in centered], np.float64)
    return val.astype(np.float64)


def decode_slots(coeffs: np.ndarray, scale: float, logn: int,
                 logslots: int) -> np.ndarray:
    """Centered float coefficients -> complex slots (the canonical
    embedding half of mkckks.encoder.decode)."""
    from ..mkckks.encoder import _tables

    n = 1 << logn
    _, t_pos, _, twist = _tables(logn)
    v = (coeffs / scale) * twist
    ev = np.fft.ifft(v) * n
    z = ev[t_pos]
    if (1 << logslots) < n // 2:
        z = z[: 1 << logslots]
    return z


def cross_validate(config: str, params, seed: int = 7):
    """Run the u64 oracle and the u32 framework on the same plaintext
    integers (2 parties, distinct operands); returns (log2 max slot err
    of the u64 oracle, log2 err of the u32 framework, want slots).

    `params` is a mkckks.Parameters whose logn/logslots/scale MATCH the
    oracle config ("toy" -> logN=12; "pn15" -> PN15QP880)."""
    import math

    from .. import mkckks, mkrlwe
    from ..mkckks import encoder

    logn, logslots, scale = params.logn, params.logslots, params.scale
    rng = np.random.default_rng(seed)
    m0v = rng.uniform(0.1, 0.5, params.slots) \
        + 1j * rng.uniform(0.1, 0.5, params.slots)
    m1v = rng.uniform(0.1, 0.5, params.slots) \
        + 1j * rng.uniform(0.1, 0.5, params.slots)
    want = m0v * m1v

    m0c = np.round(encoder.encode_to_coeffs(m0v, scale, logn, logslots))
    m1c = np.round(encoder.encode_to_coeffs(m1v, scale, logn, logslots))
    qmod, res = run_oracle(config, seed, m0c.astype(np.int64),
                           m1c.astype(np.int64))
    coeffs = center_coeffs_u64(res, qmod)
    got64 = decode_slots(coeffs, scale * scale, logn, logslots)
    err64 = math.log2(max(float(np.max(np.abs(got64 - want))), 1e-300))

    kgen = mkrlwe.KeyGenerator(params.rlwe, seed=seed + 100)
    sk_set = mkrlwe.SecretKeySet()
    rlk = mkrlwe.RelinearizationKeySet()
    pks = {}
    for uid in ("alice", "bob"):
        sk, pk = kgen.gen_key_pair(uid)
        sk_set.add(sk)
        rlk.add(kgen.gen_relinearization_key(sk, kgen.gen_secret_key(uid)))
        pks[uid] = pk
    enc = mkckks.Encryptor(params, seed=seed + 200)
    dec = mkckks.Decryptor(params)
    ev = mkckks.Evaluator(params)
    ct0 = enc.encrypt_msg(mkckks.Message(value=m0v), pks["alice"])
    ct1 = enc.encrypt_msg(mkckks.Message(value=m1v), pks["bob"])
    out = dec.decrypt(ev.mul_relin_new(ct0, ct1, rlk), sk_set)
    err32 = math.log2(max(float(np.max(np.abs(
        np.asarray(out.value) - want))), 1e-300))
    return err64, err32, want
