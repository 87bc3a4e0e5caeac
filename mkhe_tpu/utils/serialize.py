"""Key/ciphertext serialization (checkpoint subsystem).

The reference has no serialization at all (SURVEY.md §5.4); this is the
TPU build's convenience layer: npz save/load for secret/public/relin/
rotation keys and ciphertexts, so long-running multi-party sessions can
persist key material and intermediate ciphertexts.
"""

from __future__ import annotations

import io
from typing import Dict

import numpy as np
import jax.numpy as jnp

from .. import mkrlwe
from ..mkrlwe.elements import Ciphertext


def save_ciphertext(path: str, ct: Ciphertext, scale: float | None = None):
    meta = dict(ids=np.array(list(ct.ids)), data=np.asarray(ct.data))
    if scale is not None:
        meta["scale"] = np.float64(scale)
    np.savez_compressed(path, **meta)


def load_ciphertext(path: str):
    z = np.load(path, allow_pickle=False)
    ids = tuple(str(s) for s in z["ids"])
    ct = Ciphertext(ids=ids, data=jnp.asarray(z["data"]))
    scale = float(z["scale"]) if "scale" in z else None
    return ct, scale


def save_secret_key(path: str, sk: mkrlwe.SecretKey):
    np.savez_compressed(path, id=np.array(sk.id),
                        data=np.asarray(sk.data))


def load_secret_key(path: str) -> mkrlwe.SecretKey:
    z = np.load(path, allow_pickle=False)
    return mkrlwe.SecretKey(id=str(z["id"]), data=jnp.asarray(z["data"]))


# Relin-key storage format version. fmt=2: b/d limbs are stored in NTT
# domain in DOUBLE-Montgomery form (the round-4 key convention —
# mkrlwe/keygen.py emits Montgomery-form aggregates so the per-mult
# to_mont passes disappear). fmt=1 (pre-round-4, never stamped) stored
# single-Montgomery b/d; loading such a checkpoint under the new
# convention would produce garbage multiplications (ADVICE r4 #2).
RELIN_FMT = 2


def save_relin_key(path: str, rlk: mkrlwe.RelinearizationKey):
    np.savez_compressed(path, id=np.array(rlk.id), b=np.asarray(rlk.b),
                        d=np.asarray(rlk.d), v=np.asarray(rlk.v),
                        fmt=np.int64(RELIN_FMT))


def load_relin_key(path: str) -> mkrlwe.RelinearizationKey:
    z = np.load(path, allow_pickle=False)
    fmt = int(z["fmt"]) if "fmt" in z else 1
    if fmt != RELIN_FMT:
        raise ValueError(
            f"relin key checkpoint {path!r} has format {fmt}, expected "
            f"{RELIN_FMT}: it predates the double-Montgomery b/d key "
            "convention and would decrypt to garbage if loaded; "
            "regenerate it with KeyGenerator.gen_relinearization_key")
    return mkrlwe.RelinearizationKey(
        id=str(z["id"]), b=jnp.asarray(z["b"]), d=jnp.asarray(z["d"]),
        v=jnp.asarray(z["v"]))


def save_rotation_key(path: str, rtk: mkrlwe.RotationKey):
    np.savez_compressed(path, id=np.array(rtk.id),
                        rot_idx=np.int64(rtk.rot_idx),
                        data=np.asarray(rtk.data))


def load_rotation_key(path: str) -> mkrlwe.RotationKey:
    z = np.load(path, allow_pickle=False)
    return mkrlwe.RotationKey(id=str(z["id"]),
                              rot_idx=int(z["rot_idx"]),
                              data=jnp.asarray(z["data"]))
