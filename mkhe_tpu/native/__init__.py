"""Native (C++) host-side runtime components, loaded via ctypes.

The compute path of the framework is JAX/XLA/Pallas on TPU; this package
holds the native tier of the HOST runtime — currently the exact-CRT
plaintext-boundary data plane (CKKS exact decode, BFV decode, noise
measurement), which would otherwise run python big-int loops over all N
coefficients (seconds per decode at logN=15).

The shared library is compiled from crt_native.cpp with g++ on first use
and cached next to this file (falling back to a tmp dir, then to the pure
python implementations in utils/crt.py if no compiler is available).
Set MKHE_TPU_NO_NATIVE=1 to force the python fallback.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
import tempfile
from typing import Optional, Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "crt_native.cpp")
MAXW = 64  # must match crt_native.cpp


@functools.lru_cache(maxsize=1)
def _lib() -> Optional[ctypes.CDLL]:
    if os.environ.get("MKHE_TPU_NO_NATIVE"):
        return None
    so = os.path.join(os.path.dirname(__file__), "_crt_native.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(_SRC)):
            tmp = so + f".build{os.getpid()}"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", tmp, _SRC],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp, so)
    except (OSError, subprocess.SubprocessError):
        try:  # package dir may be read-only: build in a tmp dir
            tmpdir = tempfile.mkdtemp(prefix="mkhe_tpu_native_")
            so = os.path.join(tmpdir, "_crt_native.so")
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", so, _SRC],
                check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    u32p = ctypes.POINTER(ctypes.c_uint32)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.crt_center_double.argtypes = [
        u32p, ctypes.c_int32, ctypes.c_int64, u32p, u32p, u32p,
        ctypes.c_int32, f64p]
    lib.crt_center_double.restype = None
    lib.bfv_decode_scale.argtypes = [
        u32p, ctypes.c_int32, ctypes.c_int64, u32p, u32p, u32p,
        ctypes.c_int32, ctypes.c_uint32, u32p]
    lib.bfv_decode_scale.restype = None
    lib.crt_max_bits.argtypes = [
        u32p, ctypes.c_int32, ctypes.c_int64, u32p, u32p, u32p,
        ctypes.c_int32]
    lib.crt_max_bits.restype = ctypes.c_int32
    return lib


def available() -> bool:
    return _lib() is not None


def _words(x: int, w: int) -> np.ndarray:
    out = np.empty(w, np.uint32)
    for k in range(w):
        out[k] = x & 0xFFFFFFFF
        x >>= 32
    assert x == 0, "word count too small"
    return out


@functools.lru_cache(maxsize=None)
def _tables(moduli: tuple) -> tuple:
    """(consts (L, W), Q words, Q/2 words, W, Q int) for a modulus chain."""
    Q = 1
    for q in moduli:
        Q *= q
    w = max(1, -(-Q.bit_length() // 32))
    if w > MAXW - 2:
        raise ValueError(f"modulus chain too wide for native CRT ({w})")
    consts = np.empty((len(moduli), w), np.uint32)
    for i, qi in enumerate(moduli):
        qhat = Q // qi
        consts[i] = _words((qhat * pow(qhat % qi, -1, qi)) % Q, w)
    return consts, _words(Q, w), _words(Q >> 1, w), w, Q


def _u32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def crt_center_double(limbs: np.ndarray, moduli: Sequence[int]
                      ) -> Optional[np.ndarray]:
    """uint32 (L, N) RNS -> float64 (N,) centered values; None if the
    native library is unavailable (caller falls back to utils/crt.py)."""
    lib = _lib()
    if lib is None:
        return None
    consts, Qw, hQw, w, _ = _tables(tuple(int(m) for m in moduli))
    limbs = np.ascontiguousarray(limbs, np.uint32)
    L, N = limbs.shape
    out = np.empty(N, np.float64)
    lib.crt_center_double(
        _u32p(limbs), L, N, _u32p(consts), _u32p(Qw), _u32p(hQw), w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def bfv_decode_scale(limbs: np.ndarray, moduli: Sequence[int], t: int
                     ) -> Optional[np.ndarray]:
    """uint32 (L, N) RNS -> uint32 (N,) of round(t*c/Q) mod t, exact."""
    lib = _lib()
    if lib is None:
        return None
    consts, Qw, hQw, w, _ = _tables(tuple(int(m) for m in moduli))
    limbs = np.ascontiguousarray(limbs, np.uint32)
    L, N = limbs.shape
    out = np.empty(N, np.uint32)
    lib.bfv_decode_scale(
        _u32p(limbs), L, N, _u32p(consts), _u32p(Qw), _u32p(hQw), w,
        int(t), _u32p(out))
    return out


def crt_max_bits(limbs: np.ndarray, moduli: Sequence[int]
                 ) -> Optional[int]:
    """Bit length of the max |centered coefficient| (noise measurement)."""
    lib = _lib()
    if lib is None:
        return None
    consts, Qw, hQw, w, _ = _tables(tuple(int(m) for m in moduli))
    limbs = np.ascontiguousarray(limbs, np.uint32)
    L, N = limbs.shape
    return int(lib.crt_max_bits(
        _u32p(limbs), L, N, _u32p(consts), _u32p(Qw), _u32p(hQw), w))
