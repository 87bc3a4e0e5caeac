"""Multi-chip sharding for multi-key HE evaluation.

The parallel axes of this workload (SURVEY.md §5.7) and how they map onto a
jax.sharding.Mesh:

  - 'rns'   : the RNS limb axis. Every pointwise op, every NTT stage and
              every digit product is limb-independent; the only cross-limb
              ops are the small base-conversion contractions (mod_up /
              mod_down), which XLA turns into an all-gather of the digit
              vector (Ls * N words) — exactly the collective structure the
              reference's per-limb loops imply (basis_extension.go:203-229).
  - 'coeff' : the polynomial coefficient axis (N lanes). Pointwise ops are
              local; NTT butterflies mix coefficients, costing all-to-alls
              per stage group (the ring-attention-like pattern).
  - party   : ciphertext components / key rows; fully independent until the
              psum-shaped accumulations into x, y and c0
              (keyswitch.go:156-229) — left unsharded by default since k is
              small (2-8).

GSPMD propagates these shardings through the jitted evaluator cores; this
module only places the inputs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental import mesh_utils


def make_mesh(n_devices: Optional[int] = None,
              rns: int = 1, coeff: Optional[int] = None) -> Mesh:
    """Create a ('rns', 'coeff') mesh over the available devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if coeff is None:
        coeff = n_devices // rns
    assert rns * coeff == n_devices
    dm = mesh_utils.create_device_mesh((rns, coeff), devices=devs[:n_devices])
    return Mesh(dm, ("rns", "coeff"))


def ciphertext_sharding(mesh: Mesh) -> NamedSharding:
    """(k+1, L, N): limbs over 'rns', coefficients over 'coeff'."""
    return NamedSharding(mesh, P(None, "rns", "coeff"))


def key_sharding(mesh: Mesh) -> NamedSharding:
    """(beta, Lqp, N) or (k, beta, Lqp, N): shard the last two axes."""
    return NamedSharding(mesh, P(None, "rns", "coeff"))


def stacked_key_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(None, None, "rns", "coeff"))


def shard_ciphertext(ct, mesh: Mesh):
    """Place a (scheme or rlwe) ciphertext on the mesh."""
    sh = ciphertext_sharding(mesh)
    if hasattr(ct, "ct"):  # mkckks.Ciphertext wraps the rlwe ciphertext
        inner = dataclasses.replace(ct.ct,
                                    data=jax.device_put(ct.ct.data, sh))
        return dataclasses.replace(ct, ct=inner)
    return dataclasses.replace(ct, data=jax.device_put(ct.data, sh))


def shard_rlk_stacked(stacked, mesh: Mesh):
    sh = stacked_key_sharding(mesh)
    return tuple(jax.device_put(a, sh) for a in stacked)


def shard_params(rp, mesh: Mesh):
    """Shard the CRS (the largest resident key material) over the mesh."""
    sh = key_sharding(mesh)
    crs = {k: jax.device_put(v, sh) for k, v in rp.crs.items()}
    return dataclasses.replace(rp, crs=crs)
