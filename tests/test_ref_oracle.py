"""Cross-validation against the u64 reference oracle (VERDICT r3 #2).

native/ref_oracle.cpp runs the REAL KKLSS pipeline (keygen, encrypt,
MulAndRelin, exact decrypt) in the reference's 64-bit arithmetic; this
harness feeds it and the u32 framework bit-identical canonical-embedding
plaintext integers and asserts both decrypt the product within the
reference noise bounds with comparable noise magnitudes — the
machine-check that the u32 limb-pair redesign preserves reference scheme
semantics. Reference test methodology: mkckks/mkckks_test.go:320-362
(MulRelin precision asserts), mkrlwe/mkrlwe_test.go:92-155
(log2OfInnerSum noise measurement).

Default tier runs a logN=12 config (u64: 4 x ~50b Q; u32: 8 x ~25b Q —
same total modulus, same digit count); bench.py runs the same gate at
PN15QP880 on TPU (the CPU jnp path is too slow for flagship in the
default suite).
"""

import math

import numpy as np
import pytest

from mkhe_tpu import mkckks, mkrlwe
from mkhe_tpu.mkckks import encoder
from mkhe_tpu.utils import oracle

LOGN = 12
LOGSLOTS = 11
SCALE = 2.0 ** 40


@pytest.fixture(scope="module")
def toy_params():
    # 8 x ~25b Q limbs == the u64 toy's 4 x ~50b in total modulus and
    # digit count (alpha=2 -> beta=4 digits, each ~a 50b reference digit)
    return mkckks.new_parameters(
        LOGN, LOGSLOTS, q0_bits=25.0, level_bits=25.0, levels=3,
        scale=SCALE, gamma=2, p_bits=25.4, p_count=4)


def test_u64_oracle_cross_validation(toy_params):
    if oracle.oracle_binary() is None:
        pytest.skip("no C++ toolchain")
    err64, err32, _ = oracle.cross_validate("toy", toy_params)
    # reference-style precision bound (cf. _assert_close in test_mkckks):
    # -log2(scale) + logslots + slack
    bound = -math.log2(SCALE) + LOGSLOTS + 12
    assert err64 <= bound, f"u64 oracle err {err64:.1f} > {bound:.1f}"
    assert err32 <= bound, f"u32 framework err {err32:.1f} > {bound:.1f}"
    # noise-distribution comparison: the u32 limb-pair redesign must land
    # within a few bits of the true u64 arithmetic on the same messages
    assert abs(err64 - err32) <= 6.0, (err64, err32)
