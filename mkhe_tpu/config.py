"""Global framework configuration."""

from __future__ import annotations

# Pallas fused NTT kernels: None = auto (on when the default backend is a
# TPU), True/False = force. The jnp path remains the reference
# implementation and the CPU/test path; both produce bit-identical outputs.
use_pallas_ntt: bool | None = None

# Minimum ring size for the Pallas path (tiny rings are faster via jnp and
# below Mosaic's tiling sweet spot).
pallas_ntt_min_logn: int = 11

# Run the 7 small-h butterfly stages as one fixed 128x128 Z_q matrix per
# limb on the MXU via int8 digit matmuls (ops/ntt_pallas._tail_apply).
# Bit-identical outputs, but measured SLOWER than the pure-VPU kernel on
# v5e (21 vs 3.5 us/limb: the XLA-side digit matmuls and s32 partial sums
# round-trip HBM, and the VPU kernel is already ~77% ALU-bound — see
# BENCH_NOTES r3 negative result). Kept as an option for future in-kernel
# fusion; default off.
pallas_ntt_mxu_tail: bool = False


def pallas_ntt_enabled(logn: int) -> bool:
    if use_pallas_ntt is False:
        return False
    if logn < pallas_ntt_min_logn:
        return False
    if use_pallas_ntt is True:
        return True
    import jax
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
