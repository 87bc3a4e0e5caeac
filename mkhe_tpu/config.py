"""Global framework configuration."""

from __future__ import annotations

# Pallas fused NTT kernels: None = auto (on when the default backend is a
# TPU), True/False = force. The jnp path remains the reference
# implementation and the CPU/test path; both produce bit-identical outputs.
use_pallas_ntt: bool | None = None

# Minimum ring size for the Pallas path (tiny rings are faster via jnp and
# below Mosaic's tiling sweet spot).
pallas_ntt_min_logn: int = 11


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
