"""Auditable multi-chip scaling model (no multi-chip hardware needed).

Multi-chip TPU hardware is not available in this container, so the >=70%
scaling-efficiency target (BASELINE.md) cannot be measured directly. This
script produces the auditable stand-in the target calls for:

  1. Lower (trace, no backend compile) each sharded mult path over an
     8-device virtual mesh at flagship-shaped parameters.
  2. Parse the StableHLO for inter-device collectives (collective_permute,
     all_to_all, all_reduce / psum, all_gather, reduce_scatter) and sum the
     bytes each device sends per multiplication.
  3. Project scaling efficiency against the measured single-chip device
     time with a stated interconnect model:

         eff(C) = T1 / (C * (T1/C + bytes_per_dev / BW_ICI))

     assuming zero compute/comm overlap (conservative) and per-device ICI
     bandwidth BW_ICI (v5e: 4 links x ~45 GB/s usable each; we charge the
     busiest direction at 45 GB/s, i.e. no multi-link striping credit).

Run: python benchmarks/scaling_model.py  (forces a CPU backend with 8
virtual devices; results + methodology go to stdout, recorded in
BENCH_NOTES.md).
"""

import os
import re
import sys

os.environ.setdefault("XLA_FLAGS", "")
if "host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa
from jax.experimental import mesh_utils  # noqa: E402

# single-chip measured device time for the headline mult (BENCH_NOTES.md)
T1_MS = float(os.environ.get("SCALING_T1_MS", "32.6"))
BW_ICI_GBS = float(os.environ.get("SCALING_BW_GBS", "45.0"))

DTYPE_BYTES = {"ui32": 4, "i32": 4, "f32": 4, "ui64": 8, "f64": 8,
               "i64": 8, "ui8": 1, "i8": 1, "bf16": 2, "f16": 2, "i1": 1}

COLLECTIVES = ("collective_permute", "all_to_all", "all_reduce",
               "all_gather", "reduce_scatter", "collective_broadcast")


def _tensor_bytes(sig: str) -> int:
    """Sum byte sizes of all tensor<...> types in a type-signature
    fragment."""
    total = 0
    for m in re.finditer(r"tensor<([0-9x]*?)x?([a-z][a-z0-9]*)>", sig):
        dims, dt = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        size = 1
        for d in dims.split("x"):
            if d:
                size *= int(d)
        total += size * DTYPE_BYTES[dt]
    return total


def collective_bytes(hlo_text: str):
    """Per-collective (count, bytes a device sends) from StableHLO or
    post-partitioning HLO text.

    Bytes are counted from the OPERAND tensor shapes only (the left side
    of the op's function-type signature; in a shard_map body / partitioned
    module these are already per-device shapes). Ops whose signature
    trails after a reduction region (all_reduce) are matched across
    lines. For all_reduce (psum leaving the result replicated over C
    devices) a ring implementation sends ~2*(C-1)/C ~= 2x the shard
    bytes; we charge 2x (conservative).
    """
    out = {}
    for name in COLLECTIVES:
        # stablehlo dialect: '"stablehlo.NAME"(...) ... : (operands) -> res'
        pat = re.compile(
            r"stablehlo\.%s[\"']?\(.*?:\s*\(([^)]*)\)\s*->" % name,
            re.DOTALL)
        for m in pat.finditer(hlo_text):
            b = _tensor_bytes(m.group(1))
            factor = 2.0 if name == "all_reduce" else 1.0
            cnt, tot = out.get(name, (0, 0.0))
            out[name] = (cnt + 1, tot + b * factor)
    # HLO dialect (compiled modules): 'xxx = u32[5,28,4096] all-reduce(...)'
    hlo_names = {n.replace("_", "-") for n in COLLECTIVES}
    for line in hlo_text.splitlines():
        m = re.match(
            r"\s*%?\S+\s*=\s*\(?([a-z0-9]+)\[([0-9,]*)\].*?\s"
            r"(collective-permute|all-to-all|all-reduce|all-gather|"
            r"reduce-scatter)\(", line)
        if m and m.group(3) in hlo_names:
            dt, dims, name = m.group(1), m.group(2), m.group(3)
            bt = {"u32": 4, "s32": 4, "f32": 4, "u64": 8, "f64": 8,
                  "pred": 1, "u8": 1, "s8": 1, "bf16": 2}.get(dt)
            if bt is None:
                continue
            size = 1
            for d_ in dims.split(","):
                if d_:
                    size *= int(d_)
            factor = 2.0 if name == "all-reduce" else 1.0
            cnt, tot = out.get(name, (0, 0.0))
            out[name] = (cnt + 1, tot + size * bt * factor)
    return out


def lower_text(fn, *args):
    return jax.jit(fn).lower(*args).as_text()


def report(path_name, counts, note=""):
    total = sum(b for _, b in counts.values())
    print(f"\n### {path_name}")
    if note:
        print(note)
    for name, (cnt, b) in sorted(counts.items()):
        print(f"  {name:22s} x{cnt:<4d} {b/1e6:10.2f} MB sent/device")
    comm_ms = total / (BW_ICI_GBS * 1e9) * 1e3
    c = 8
    t_comp = T1_MS / c
    eff = T1_MS / (c * (t_comp + comm_ms))
    print(f"  total {total/1e6:.2f} MB/device -> comm {comm_ms:.3f} ms @ "
          f"{BW_ICI_GBS:.0f} GB/s")
    print(f"  projected 8-chip efficiency: {100*eff:.1f}% "
          f"(T1={T1_MS} ms, no-overlap model)")
    return path_name, total, comm_ms, eff


def main():
    import dataclasses
    from mkhe_tpu import mkrlwe, mkckks
    from mkhe_tpu.mkrlwe import keyswitch as ksw
    from mkhe_tpu.parallel import coeff_mul, party_mul

    # flagship-shaped: logN=15 geometry with a reduced level count so the
    # CPU trace stays fast; collective SHAPES per op are what we audit and
    # they scale linearly in limb count (we report per-limb-scaled totals
    # for the full 28-limb chain below).
    LEVELS = 13
    params = mkckks.new_parameters(
        15, 14, q0_bits=28.9, level_bits=27.0, levels=LEVELS,
        scale=2.0 ** 54, p_bits=28.4, p_count=4)
    rp = params.rlwe
    parties = 4
    kgen = mkrlwe.KeyGenerator(rp, seed=5)
    rlk = mkrlwe.RelinearizationKeySet()
    ids = tuple(f"user{i}" for i in range(parties))
    for uid in ids:
        sk, _ = kgen.gen_key_pair(uid)
        rlk.add(kgen.gen_relinearization_key(sk, kgen.gen_secret_key(uid)))
    b, d, v = rlk.stacked(ids)
    level = rp.max_level
    lq = level + 1
    data = jnp.zeros((parties + 1, lq, rp.n), jnp.uint32)
    ct = mkrlwe.Ciphertext(ids=ids, data=data)

    results = []

    # ---- 1. coeff-sharded explicit ppermute path ------------------------
    cmesh = Mesh(mesh_utils.create_device_mesh((8,)), ("coeff",))
    params_d = dataclasses.replace(
        rp, ring_q=rp.ring_q.with_dist("coeff", 8),
        ring_p=rp.ring_p.with_dist("coeff", 8),
        ring_qp=rp.ring_qp.with_dist("coeff", 8))
    u_key = rp.crs_at(-1, level)

    def body(d0, d1, b_, d_, v_, u_):
        out = ksw.mul_and_relin(
            params_d, mkrlwe.Ciphertext(ids=ids, data=d0),
            mkrlwe.Ciphertext(ids=ids, data=d1), (b_, d_, v_), level,
            u_key=u_)
        return out.data

    last = lambda nd: P(*([None] * (nd - 1) + ["coeff"]))
    fn = jax.shard_map(body, mesh=cmesh,
                       in_specs=(last(3), last(3), last(4), last(4),
                                 last(4), last(3)),
                       out_specs=last(3))
    txt = lower_text(fn, data, data, b, d, v, u_key)
    results.append(report(
        "coefficient sharding (explicit hypercube ppermute NTT), C=8",
        collective_bytes(txt),
        "every NTT/iNTT exchanges log2(C)=3 half-chunks per limb"))

    # ---- 2. party sharding (shard_map + psum) ---------------------------
    pmesh = Mesh(mesh_utils.create_device_mesh(
        (4,), devices=jax.devices()[:4]), ("party",))
    fnp = lambda: party_mul.mul_and_relin_party_sharded(
        rp, ct, (b, d, v), pmesh)
    txt = lower_text(lambda dd: party_mul.mul_and_relin_party_sharded(
        rp, dataclasses.replace(ct, data=dd), (b, d, v), pmesh).data, data)
    results.append(report(
        "party sharding (psum of x/y/v partials), k=4 over 4 devices",
        collective_bytes(txt),
        "three QP-basis psums per mult, independent of party count"))

    # ---- 3. GSPMD rns x coeff ------------------------------------------
    # collectives only appear after the SPMD partitioner runs, i.e. in the
    # COMPILED module; compile a reduced-size config on the CPU backend
    # (logN=13, 6 levels) and report the raw counts plus the data-size
    # scale factor to flagship shapes (collective bytes here are linear in
    # limbs x N: they move ciphertext/digit tensors).
    g_params = mkckks.new_parameters(
        13, 12, q0_bits=28.9, level_bits=27.0, levels=6,
        scale=2.0 ** 54, p_bits=28.4, p_count=4)
    grp = g_params.rlwe
    gkgen = mkrlwe.KeyGenerator(grp, seed=5)
    grlk = mkrlwe.RelinearizationKeySet()
    for uid in ids:
        sk, _ = gkgen.gen_key_pair(uid)
        grlk.add(gkgen.gen_relinearization_key(sk,
                                               gkgen.gen_secret_key(uid)))
    gb, gd, gv = grlk.stacked(ids)
    g_level = grp.max_level
    g_data = jnp.zeros((parties + 1, g_level + 1, grp.n), jnp.uint32)
    g_ct = mkrlwe.Ciphertext(ids=ids, data=g_data)

    gmesh = Mesh(mesh_utils.create_device_mesh((2, 4)), ("rns", "coeff"))
    ct_sh = NamedSharding(gmesh, P(None, "rns", "coeff"))
    key_sh = NamedSharding(gmesh, P(None, None, "rns", "coeff"))
    data_g = jax.device_put(g_data, ct_sh)
    bg, dg, vg = (jax.device_put(a, key_sh) for a in (gb, gd, gv))

    def gfn(dd, b_, d_, v_):
        out = ksw.mul_and_relin(grp, dataclasses.replace(g_ct, data=dd),
                                dataclasses.replace(g_ct, data=dd),
                                (b_, d_, v_), g_level)
        return out.data

    with gmesh:
        compiled = jax.jit(gfn).lower(data_g, bg, dg, vg).compile()
    txt = compiled.as_text()
    scale_f = (28 * (1 << 15)) / ((g_level + 1) * grp.n)
    results.append(report(
        f"GSPMD (rns x coeff) 2x4, XLA-chosen collectives "
        f"(logN=13 L={g_level + 1}; x{scale_f:.1f} to flagship)",
        collective_bytes(txt),
        "post-SPMD-partitioner compiled module"))

    print("\nMethodology: bytes from per-device operand shapes of every "
          "collective op in the lowered StableHLO; all_reduce charged 2x "
          "(ring); efficiency = T1/(C*(T1/C + bytes/BW)); no overlap "
          "credit. Regenerate: python benchmarks/scaling_model.py")


if __name__ == "__main__":
    main()
